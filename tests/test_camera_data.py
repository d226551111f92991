"""Camera data path: calibration parsing, undistortion, image<->scan
matching, and the on-disk image sequence format."""
import os

import numpy as np
import pytest
import yaml

from loner_tpu.data.calibration import (
    CameraCalibration,
    _distort_normalized,
    load_fusion_portable_calibration,
    undistort_points,
    undistorted_pixel_rays,
)
from loner_tpu.tracking.frame_synthesis import FrameSynthesis, FrameSynthesisConfig


class TestUndistortion:
    DIST = np.array([-0.1, 0.02, 1e-3, -5e-4, 0.0])
    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])

    def test_roundtrip(self):
        """distort(undistort(p)) == p: the fixed-point inversion converges."""
        rng = np.random.default_rng(0)
        pix = rng.uniform([0, 0], [640, 480], size=(500, 2))
        und = undistort_points(pix, self.K, self.DIST)
        x = (und[:, 0] - self.K[0, 2]) / self.K[0, 0]
        y = (und[:, 1] - self.K[1, 2]) / self.K[1, 1]
        re_d = _distort_normalized(np.stack([x, y], -1), self.DIST)
        re_pix = np.stack(
            [re_d[:, 0] * self.K[0, 0] + self.K[0, 2], re_d[:, 1] * self.K[1, 1] + self.K[1, 2]],
            axis=-1,
        )
        np.testing.assert_allclose(re_pix, pix, atol=1e-3)

    def test_zero_distortion_is_identity(self):
        pix = np.array([[10.0, 20.0], [630.0, 400.0]])
        np.testing.assert_allclose(undistort_points(pix, self.K, np.zeros(5)), pix)

    def test_pixel_rays_unit_and_centered(self):
        calib = CameraCalibration(K=self.K, distortion=self.DIST, width=640, height=480)
        rays = undistorted_pixel_rays(calib)
        assert rays.shape == (640 * 480, 3)
        np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
        # the center pixel looks (almost) straight down the optical axis
        center = rays.reshape(480, 640, 3)[240, 320]
        assert center[2] > 0.999


class TestFusionPortableCalibration:
    def test_parse_opencv_yaml_tree(self, tmp_path):
        """Parse the reference's calibration layout (opencv-matrix tags)."""
        d = tmp_path / "calib"
        d.mkdir()
        (d / "ouster00.yaml").write_text(
            "%YAML:1.0\n---\n"
            "quaternion_sensor_frame_cam00: !!opencv-matrix\n"
            "  rows: 4\n  cols: 1\n  dt: f\n  data: [0., 0., 0., 1.]\n"
            "translation_sensor_frame_cam00: !!opencv-matrix\n"
            "  rows: 3\n  cols: 1\n  dt: f\n  data: [0.1, -0.2, 0.05]\n"
        )
        (d / "frame_cam00.yaml").write_text(
            "%YAML:1.0\n---\n"
            "image_width: 1024\nimage_height: 768\n"
            "distortion_model: radtan\n"
            "camera_matrix: !!opencv-matrix\n"
            "  rows: 3\n  cols: 3\n  dt: f\n"
            "  data: [600., 0., 512., 0., 600., 384., 0., 0., 1.]\n"
            "distortion_coefficients: !!opencv-matrix\n"
            "  rows: 1\n  cols: 5\n  dt: f\n  data: [-0.1, 0.02, 0., 0., 0.]\n"
            "rectification_matrix: !!opencv-matrix\n"
            "  rows: 3\n  cols: 3\n  dt: f\n"
            "  data: [1., 0., 0., 0., 1., 0., 0., 0., 1.]\n"
            "projection_matrix: !!opencv-matrix\n"
            "  rows: 3\n  cols: 4\n  dt: f\n"
            "  data: [590., 0., 512., 0., 0., 590., 384., 0., 0., 0., 1., 0.]\n"
        )
        calib = load_fusion_portable_calibration(str(tmp_path))
        assert calib.K[0, 0] == 600.0 and calib.new_K[0, 0] == 590.0
        assert calib.width == 1024 and calib.height == 768
        np.testing.assert_allclose(calib.lidar_to_camera[:3, 3], [0.1, -0.2, 0.05])
        np.testing.assert_allclose(calib.lidar_to_camera[:3, :3], np.eye(3), atol=1e-6)

        # image_scale_factor halves intrinsics + sizes (reference to_dict)
        half = load_fusion_portable_calibration(str(tmp_path), image_scale_factor=0.5)
        assert half.width == 512 and half.K[0, 0] == 300.0

    def test_dict_roundtrip(self):
        c = CameraCalibration(
            K=np.diag([100.0, 100.0, 1.0]), distortion=np.array([0.1]), width=64, height=48
        )
        c2 = CameraCalibration.from_dict(yaml.safe_load(yaml.safe_dump(c.as_dict())))
        np.testing.assert_allclose(c2.K, c.K)
        assert c2.width == 64


class TestImageScanMatching:
    def _scan(self, t0, t1, n=8):
        from loner_tpu.data.scan import make_lidar_scan

        dirs = np.tile([[1.0, 0, 0]], (n, 1))
        return make_lidar_scan(
            dirs, np.ones(n), np.linspace(t0, t1, n).astype(np.float32)
        )

    def test_images_match_overlapping_scans(self):
        fs = FrameSynthesis(FrameSynthesisConfig(frame_match_tolerance=0.01))
        fs.process_scan_for_matching(self._scan(0.0, 0.09), 0.0)
        fs.process_scan_for_matching(self._scan(0.1, 0.19), 0.1)
        fs.process_image("img_a", 0.05)
        assert fs.has_frame()
        m = fs.pop_frame()
        assert m.image == "img_a" and abs(m.scan_timestamp - 0.0) < 1e-6

        fs.process_image("img_b", 0.15)
        m = fs.pop_frame()
        assert m.image == "img_b" and abs(m.scan_timestamp - 0.1) < 1e-6

    def test_stale_image_skipped(self):
        fs = FrameSynthesis(FrameSynthesisConfig(frame_match_tolerance=0.01))
        fs.process_scan_for_matching(self._scan(1.0, 1.09), 1.0)
        fs.process_image("old", 0.5)  # predates every scan
        assert not fs.has_frame()
        fs.process_image("ok", 1.05)
        m = fs.pop_frame()
        assert m.image == "ok"

    def test_image_waits_for_future_scan(self):
        fs = FrameSynthesis(FrameSynthesisConfig(frame_match_tolerance=0.01))
        fs.process_image("early", 2.05)
        assert not fs.has_frame()
        fs.process_scan_for_matching(self._scan(2.0, 2.09), 2.0)
        assert fs.has_frame()


class TestImageSequence:
    def test_write_and_load_synthetic_images(self, tmp_path):
        from loner_tpu.data import synthetic
        from loner_tpu.data.dataset import ImageSequence, write_synthetic_images

        root = str(tmp_path)
        write_synthetic_images(root, n_poses=3, height=24, width=32)
        seq = ImageSequence(root)
        assert len(seq) == 3
        img, mask, ts = seq.load(0)
        assert img.shape == (24, 32, 1) and mask.shape == (24, 32)
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert seq.K.shape == (3, 3)
