"""Dynamic-object masking fallback (the SAM/LK role of the reference's data
prep, rosbag_utils/adjust_bags.py + image_segmentation.py, re-built without
SAM): geometric box projection, motion residuals, LK-seeded regions, and
the mask write-back path."""
import numpy as np
import pytest

from loner_tpu.data.dynamic_mask import (
    combine_masks,
    geometric_box_mask,
    lk_region_masks,
    motion_residual_masks,
    write_masks_into_sequence,
)


def _moving_blob_sequence(n=9, h=48, w=64, blob=6):
    """Static gradient background + a bright blob marching right."""
    rng = np.random.default_rng(0)
    bg = np.linspace(0.2, 0.6, w)[None, :] * np.ones((h, 1))
    frames, centers = [], []
    for i in range(n):
        img = bg + rng.normal(0, 0.005, (h, w))
        cx, cy = 10 + 5 * i, h // 2
        img[cy - blob : cy + blob, cx - blob : cx + blob] = 0.95
        frames.append(np.clip(img, 0, 1).astype(np.float32))
        centers.append((cx, cy))
    return frames, centers


class TestMotionResidual:
    def test_blob_masked_background_kept(self):
        frames, centers = _moving_blob_sequence()
        masks = motion_residual_masks(frames, threshold=0.1)
        mid = len(frames) // 2
        cx, cy = centers[mid]
        m = masks[mid]
        assert not m[cy, cx], "moving blob center must be masked out"
        # background stays trainable
        assert m[5, 5] and m[-5, -5]
        assert m.mean() > 0.7, f"over-masking: keep fraction {m.mean():.2f}"


class TestGeometricBox:
    def test_box_in_front_masks_center(self):
        K = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
        T = np.eye(4)  # box frame == camera frame
        keep = geometric_box_mask(K, T, (0.0, 0.0, 5.0), (2.0, 2.0, 2.0), 48, 64)
        assert not keep[24, 32], "projected box center must be masked"
        assert keep[2, 2], "far corner must stay trainable"

    def test_box_behind_camera_is_noop(self):
        K = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
        keep = geometric_box_mask(K, np.eye(4), (0, 0, -5.0), (2, 2, 2), 48, 64)
        assert keep.all()


class TestLKRegions:
    def test_tracks_follow_blob(self):
        cv2 = pytest.importorskip("cv2")
        frames, centers = _moving_blob_sequence()
        seeds = np.array([centers[0]], float)
        masks = lk_region_masks(frames, seeds)
        for m, (cx, cy) in zip(masks, centers):
            assert not m[cy, cx], "LK-seeded region must cover the tracked blob"


class TestWriteBack:
    def test_masks_roundtrip_through_image_sequence(self, tmp_path):
        from loner_tpu.data.dataset import ImageSequence, write_synthetic_images

        root = str(tmp_path)
        write_synthetic_images(root, n_poses=3, height=24, width=32)
        masks = [np.zeros((24, 32), bool) for _ in range(3)]
        for m in masks:
            m[:12] = True
        write_masks_into_sequence(root, masks)
        seq = ImageSequence(root)
        _, m0, _ = seq.load(0)
        assert m0[:12].all() and not m0[12:].any()

    def test_combine_is_and(self):
        a = [np.array([[True, False]])]
        b = [np.array([[True, True]])]
        out = combine_masks(a, b)
        assert (out[0] == np.array([[True, False]])).all()
