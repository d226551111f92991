"""Native point-cloud front-end: C++ library vs numpy fallback parity."""
import numpy as np
import pytest

from loner_tpu.runtime import native


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    n = 5000
    pts = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    ts = np.sort(rng.uniform(0, 0.1, n)).astype(np.float32)
    valid = rng.uniform(size=n) > 0.05
    return pts, ts, valid


class TestNative:
    def test_library_builds_and_loads(self):
        assert native.has_native(), "native library failed to build/load"

    def test_extract_cloud_shape_and_window(self, cloud):
        pts, ts, valid = cloud
        out_p, out_v = native.extract_cloud(pts, ts, valid, 0.9, 2048)
        assert out_p.shape == (2048, 3) and out_v.shape == (2048,)
        assert out_v.all()  # 5000 valid points -> full budget

    def test_extract_cloud_pads_small_input(self, cloud):
        pts, ts, valid = cloud
        out_p, out_v = native.extract_cloud(pts[:100], ts[:100], valid[:100], 1.0, 256)
        assert out_v.sum() <= 100
        assert not out_v[-1]

    def test_voxel_downsample_matches_numpy(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
        out_native = native.voxel_downsample(pts, 0.7)
        # fallback path
        keys = np.floor(pts / 0.7).astype(np.int64)
        n_unique = len(np.unique(keys, axis=0))
        assert len(out_native) == n_unique
        # every output point lies inside its voxel
        k2 = np.floor(out_native / 0.7).astype(np.int64)
        assert len(np.unique(k2, axis=0)) == n_unique

    def test_box_filter(self):
        pts = np.array([[0, 0, 0], [10, 0, 0], [1.9, 0, 0]], np.float32)
        v = np.ones(3, bool)
        out = native.box_filter(pts, v, center=(0, 0, 0), size=(4, 4, 4))
        np.testing.assert_array_equal(out, [False, True, False])

    def test_range_filter(self):
        d = np.array([0.1, 5.0, 100.0], np.float32)
        v = np.ones(3, bool)
        out = native.range_filter(d, v, 0.3, 50.0)
        np.testing.assert_array_equal(out, [False, True, False])

    def test_spherical_occupancy_matches_python(self):
        rng = np.random.default_rng(2)
        d = rng.normal(size=(3000, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        v = np.ones(3000, bool)
        img_native = native.spherical_occupancy(d, v, 64, 32, -0.5, 1.5)

        from loner_tpu.tracking.sky import spherical_projection

        img_py = spherical_projection(d, v, 64, 32, (-0.5, 1.5))
        # identical binning
        agreement = (img_native == img_py).mean()
        assert agreement > 0.995, agreement
