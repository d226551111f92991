"""Profiling hooks: device traces + lightweight wall-clock CSVs.

The reference carries two torch profilers (whole-run ``src/loner.py:175-186``
and per-optimizer-window ``src/mapping/optimizer.py:157-175``) that write
tensorboard traces, plus wall-clock CSVs (``timing.csv``, ``track_times.csv``,
``map_times.csv``) and an its/sec print per window. TPU-native equivalent:
``jax.profiler`` traces (viewable in tensorboard/xprof or Perfetto) and the
same CSV contract.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, List, Optional, Sequence


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str], enabled: bool = True) -> Iterator[None]:
    """Wrap a region in a ``jax.profiler`` trace when enabled.

    Writes a tensorboard-compatible trace under ``<log_dir>/profile`` (the
    reference's ``<log>/profile/tensorboard`` role, ``src/loner.py:181-186``).
    No-op when disabled or ``log_dir`` is None, so callers can wrap
    unconditionally.
    """
    if not enabled or log_dir is None:
        yield
        return
    import jax

    trace_dir = os.path.join(log_dir, "profile")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


class WindowTimer:
    """Per-optimization-window wall-clock log (the reference's ``timing.csv``
    ``iteration_time,num_iterations`` rows + its/sec print,
    ``src/mapping/optimizer.py:183-188``)."""

    def __init__(self) -> None:
        self.rows: List[tuple] = []  # (seconds, n_iterations)
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self, n_iterations: int, verbose: bool = False) -> float:
        assert self._t0 is not None, "stop() without start()"
        dt = time.time() - self._t0
        self._t0 = None
        self.rows.append((dt, n_iterations))
        if verbose and dt > 0:
            print(f"{n_iterations / dt:.2f} its/sec")
        return dt

    def write_csv(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write("window_seconds,num_iterations,its_per_sec\n")
            for dt, n in self.rows:
                f.write(f"{dt:.6f},{n},{(n / dt if dt > 0 else 0.0):.3f}\n")


def write_times_csv(path: str, times: Sequence[float]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for t in times:
            f.write(f"{t:.6f}\n")
