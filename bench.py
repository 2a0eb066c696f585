#!/usr/bin/env python
"""Headline benchmark: steady-state frames/s of the full fused pipeline
(adcensus_stm analog) at 1080p, 128 disparities, 8 views, on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note (BASELINE.md): the reference publishes no numbers; the
driver's north-star target is >=2x a reference-GPU fps per chip.  We pin
the proxy baseline at 15 fps for 1080p/D=128 AD-Census + 8-view DIBR on a
reference-era GPU (documented in BASELINE.md), so vs_baseline = fps / 15.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    # Persistent executable cache: the fused 1080p graph takes minutes to
    # compile; warm runs (and the driver's run) then load it in seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from stereo_to_multiview_tpu.config import HD1080_D128
    from stereo_to_multiview_tpu.models.pipeline import process_frame

    cfg = HD1080_D128
    rng = np.random.default_rng(0)
    # Synthetic stereo with real disparity structure (shifted texture) so
    # data-dependent stages (arms, IRV) do representative work.
    base = rng.integers(0, 256, (cfg.num_rows, cfg.num_cols + 32, 3),
                        dtype=np.uint8).astype(np.float32)
    k = np.ones(7, np.float32) / 7.0
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    left = base[:, :cfg.num_cols].astype(np.uint8)
    right = base[:, 16:16 + cfg.num_cols].astype(np.uint8)
    sbs = np.concatenate([left, right], axis=1)

    dev = jax.devices()[0]
    sbs_dev = jax.device_put(sbs, dev)

    # block_until_ready is unreliable through the axon relay, so force
    # completion with a host fetch of one element per output.  The relay
    # also has a ~30 ms per-dispatch floor, so throughput is measured with
    # a batch of frames per dispatch (lax.map: sequential on device, no
    # batch memory blowup) -- the steady-state production shape.
    batch = 4

    @jax.jit
    def frames(s):
        import jax.numpy as jnp
        return jax.lax.map(lambda x: process_frame(x, cfg),
                           jnp.stack([s] * batch))

    def sync(out):
        jax.tree.map(lambda x: np.asarray(x.ravel()[0]), out)

    sync(frames(sbs_dev))
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        sync(frames(sbs_dev))
    dt = time.perf_counter() - t0
    fps = n_iters * batch / dt

    baseline_fps = 15.0
    print(json.dumps({
        "metric": "fps_1080p_d128_8views_single_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
