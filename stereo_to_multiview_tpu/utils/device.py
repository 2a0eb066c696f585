"""Device reporting -- printDeviceInfo analog (cuda_utils.h:50-83) --
and the persistent-executable cache (the checkpoint/resume analog for a
stateless pipeline, SURVEY.md section 5: the only state worth persisting
is the compiled executable)."""

from __future__ import annotations

import os

DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str = DEFAULT_CACHE) -> None:
    """Persist compiled executables across processes.  The fused 1080p
    graph takes minutes to compile (through the TPU relay); warm runs
    load it in seconds."""
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def print_device_info() -> None:
    import jax

    print("---------------------------")
    print("-- DEVICE INFO --")
    print("---------------------------")
    for i, d in enumerate(jax.devices()):
        print(f"Device {i}: {d.device_kind} (platform={d.platform}, "
              f"process={d.process_index})")
        stats = None
        try:
            stats = d.memory_stats()
        except Exception:
            pass
        if stats:
            lim = stats.get("bytes_limit")
            if lim:
                print(f"  HBM limit: {lim / 2**30:.1f} GiB")
    print(f"Backend: {jax.default_backend()}")
    print("---------------------------\n")
