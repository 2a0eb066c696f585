#!/usr/bin/env python
"""Full-graph IRV ablation on the bench input: FULL process_frame with
irv_iterations=5 vs 0, batched lax.map, min-of-groups -- the same
estimator bench.py uses.  The difference is the in-graph cost of the
early-stopped IRV stage (r4: 17.4 -> 15.1 ms with the change-frontier
flags; round-5 target <= 8 ms via the flag-gated-DMA sparse kernels).

  python scripts/irv_ablate.py [--batch 8] [--iters 8]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure(cfg, sbs, batch, iters):
    import jax
    import jax.numpy as jnp
    from stereo_to_multiview_tpu.models.pipeline import process_frame

    dev = jax.devices()[0]
    sbs_dev = jax.device_put(sbs, dev)

    @jax.jit
    def frames(s):
        return jax.lax.map(lambda x: process_frame(x, cfg),
                           jnp.stack([s] * batch))

    def sync(out):
        jax.tree.map(lambda x: np.asarray(x.ravel()[0]), out)

    sync(frames(sbs_dev))
    sync(frames(sbs_dev))
    groups = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(frames(sbs_dev))
        groups.append(time.perf_counter() - t0)
    return float(np.min(groups)) / batch * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench
    from stereo_to_multiview_tpu.config import HD1080_D128

    sbs = bench.bench_input(HD1080_D128)
    ms5 = measure(HD1080_D128, sbs, args.batch, args.iters)
    ms0 = measure(HD1080_D128.replace(irv_iterations=0), sbs,
                  args.batch, args.iters)
    print(f"FULL irv=5: {ms5:.1f} ms/frame; irv=0: {ms0:.1f}; "
          f"in-graph IRV = {ms5 - ms0:.1f} ms")


if __name__ == "__main__":
    main()
