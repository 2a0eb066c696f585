"""Tracing/profiling subsystem (SURVEY.md section 5).

The reference instruments with per-kernel cudaEvent timers on the legacy
paths (cuda_utils.h:23-48) and a per-frame CPU-time print on the
streaming path (video_io.cpp:156-161).  TPU equivalents:

  * `stage_scope(name)` -- jax.named_scope + jax.profiler trace
    annotation; stage names show up in XLA HLO metadata and in captured
    profiler traces.  models.pipeline wraps every stage with it.
  * `trace(out_dir)` -- context manager capturing a TensorBoard-loadable
    device trace of everything run inside it.
  * scripts/profile_stages.py -- per-stage wall-clock timing (the analog
    of the `[[ <name> took: X ms ]]` prints).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def stage_scope(name: str):
    """Annotate ops traced inside with a stage name (named_scope shows in
    HLO metadata; TraceAnnotation shows in profiler timelines)."""
    import jax
    with jax.named_scope(name):
        with jax.profiler.TraceAnnotation(name):
            yield


@contextlib.contextmanager
def trace(out_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
