"""Timing instrumentation.

TPU analog of the reference's cudaEvent timer pairs (cuda_utils.h:30-48) and
portable CPU timer (getCPUtime.cpp): wall-clock timing around
`jax.block_until_ready`, plus a steady-state frames/s meter for streaming.
Falls back to the native C++ clock (native/stm_native.cpp) when built.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional


def get_cpu_time() -> float:
    """Process CPU time in seconds (getCPUtime.cpp:29-104 equivalent)."""
    return time.process_time()


class Timer:
    """Named wall-clock timer printing `[[ <name> took: X ms ]]` like
    stopCudaTimer (cuda_utils.h:37-48). Blocks on device results."""

    def __init__(self, name: str, verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.ms: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self._t0) * 1e3
        if self.verbose:
            print(f"[[ {self.name} took: {self.ms:.3f} ms ]]")
        return False


def timed_block_until_ready(fn, *args, name: str = "stage", verbose=True, **kw):
    import jax
    with Timer(name, verbose) as t:
        out = jax.block_until_ready(fn(*args, **kw))
    return out, t.ms


class FrameMeter:
    """Streaming per-frame latency/fps meter (video_io.cpp:156-161 analog),
    with warmup exclusion so XLA compile time doesn't pollute steady state."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def add(self, seconds: float) -> None:
        """Record one directly-measured frame duration.  Unlike tick()
        (which measures tick-to-tick deltas, so any consumer work between
        frames lands in the NEXT delta), add() lets the driver time
        exactly the compute+fetch span (ADVICE r4)."""
        self.times.append(seconds)

    @property
    def steady_times(self) -> List[float]:
        return self.times[self.warmup:] if len(self.times) > self.warmup else self.times

    @property
    def fps(self) -> float:
        ts = self.steady_times
        return len(ts) / sum(ts) if ts else 0.0

    def stats(self) -> Dict[str, Any]:
        ts = self.steady_times
        if not ts:
            return {"frames": 0, "fps": 0.0}
        return {
            "frames": len(ts),
            "fps": self.fps,
            "ms_mean": 1e3 * sum(ts) / len(ts),
            "ms_min": 1e3 * min(ts),
            "ms_max": 1e3 * max(ts),
        }
