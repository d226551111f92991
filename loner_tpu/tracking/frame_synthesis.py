"""Frame synthesis: scan decimation, frame assembly, image<->scan matching.

Covers the reference's ``FrameSynthesis`` (``src/tracking/frame_synthesis.py``):
decimate incoming scans to ``frame_decimation_rate_hz`` (5 Hz from ~10 Hz
sweeps), and in camera mode match each (decimated) image to the first scan
whose [start, end] timestamp interval — padded by ``frame_match_tolerance`` —
contains the image timestamp (``frame_synthesis.py:86-126``).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

from loner_tpu.data.scan import Frame, LidarScan


@dataclass
class FrameSynthesisConfig:
    frame_decimation_rate_hz: float = 5.0
    decimate_on_load: bool = True
    # image<->scan matching (reference cfg/defaults.yaml frame_synthesis)
    frame_match_tolerance: float = 0.01
    frame_delta_t_sec_tolerance: float = 0.02


@dataclass
class MatchedFrame:
    """An image matched to its overlapping lidar scan."""

    image: Any  # (H, W, C) array (opaque to this layer)
    image_timestamp: float
    scan: LidarScan
    # the FRAME timestamp the scan was processed under — identical to the
    # keyframe's timestamp, so attach_image can key the match by time
    # instead of scan object identity (robust across scan copies)
    scan_timestamp: float


class FrameSynthesis:
    def __init__(self, cfg: FrameSynthesisConfig):
        self.cfg = cfg
        self._last_kept_time: Optional[float] = None
        # camera mode: pending images + scans awaiting a match
        self._pending_images: List[Tuple[Any, float]] = []
        # (scan, frame timestamp, interval start, interval end)
        self._pending_scans: List[Tuple[LidarScan, float, float, float]] = []
        self._completed: List[MatchedFrame] = []

    def accepts(self, timestamp: float) -> bool:
        """True if a scan at this timestamp survives decimation."""
        if self.cfg.frame_decimation_rate_hz <= 0:
            return True
        period = (
            1.0 / self.cfg.frame_decimation_rate_hz
            - self.cfg.frame_delta_t_sec_tolerance
        )
        if self._last_kept_time is None or (timestamp - self._last_kept_time) >= period - 1e-6:
            self._last_kept_time = timestamp
            return True
        return False

    # ------------------------------------------------------------------
    # camera mode: image <-> scan timestamp matching
    # ------------------------------------------------------------------
    def process_image(self, image, timestamp: float):
        """Enqueue an image (monotonically increasing timestamps)."""
        self._pending_images.append((image, timestamp))
        self._match()

    def process_scan_for_matching(self, scan: LidarScan, timestamp: float):
        """Enqueue a scan for image matching (camera mode)."""
        import numpy as np

        ts = np.asarray(scan.timestamps)
        valid = np.asarray(scan.valid)
        t0 = float(ts[valid].min()) if valid.any() else timestamp
        t1 = float(ts[valid].max()) if valid.any() else timestamp
        self._pending_scans.append((scan, timestamp, t0, t1))
        self._match()

    def _match(self):
        """Pair each image with the first scan whose padded [start, end]
        interval contains its timestamp; consumed scans (and everything
        before them) are dropped. Images older than every pending scan are
        skipped (reference MatchResult.SKIPPED)."""
        tol = self.cfg.frame_match_tolerance
        while self._pending_images and self._pending_scans:
            img, t_img = self._pending_images[0]
            matched = None
            for i, (scan, t_frame, t0, t1) in enumerate(self._pending_scans):
                if t0 - tol <= t_img <= t1 + tol:
                    matched = i
                    break
            if matched is None:
                if t_img < self._pending_scans[-1][-1] - tol:
                    # scans arrive in time order: an image older than every
                    # pending interval can never match -> skip (reference
                    # MatchResult.SKIPPED)
                    self._pending_images.pop(0)
                    continue
                break  # waiting on a future scan
            scan, t_frame, t0, t1 = self._pending_scans[matched]
            self._completed.append(MatchedFrame(img, t_img, scan, t_frame))
            self._pending_images.pop(0)
            del self._pending_scans[: matched + 1]

    def has_frame(self) -> bool:
        return bool(self._completed)

    def pop_frame(self) -> Optional[MatchedFrame]:
        return self._completed.pop(0) if self._completed else None
