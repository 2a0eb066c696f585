"""Device reporting -- printDeviceInfo analog (cuda_utils.h:50-83)."""

from __future__ import annotations


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
