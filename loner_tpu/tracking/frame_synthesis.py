"""Frame synthesis: scan decimation and frame assembly.

Covers the reference's ``FrameSynthesis`` (``src/tracking/frame_synthesis.py``):
decimate incoming scans to ``frame_decimation_rate_hz`` (5 Hz from ~10 Hz
sweeps) and assemble Frames; in camera mode, match images to overlapping
scans by timestamp (image matching arrives with the RGB path).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from loner_tpu.data.scan import Frame, LidarScan


@dataclass
class FrameSynthesisConfig:
    frame_decimation_rate_hz: float = 5.0
    decimate_on_load: bool = True


class FrameSynthesis:
    def __init__(self, cfg: FrameSynthesisConfig):
        self.cfg = cfg
        self._last_kept_time: Optional[float] = None

    def accepts(self, timestamp: float) -> bool:
        """True if a scan at this timestamp survives decimation."""
        if self.cfg.frame_decimation_rate_hz <= 0:
            return True
        period = 1.0 / self.cfg.frame_decimation_rate_hz
        if self._last_kept_time is None or (timestamp - self._last_kept_time) >= period - 1e-6:
            self._last_kept_time = timestamp
            return True
        return False
