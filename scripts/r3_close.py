#!/usr/bin/env python
"""Round-3 TPU measurements, one phase per invocation:

  python scripts/r3_close.py halohd  # 1080p halo+band on a 1-device TPU
                                     # mesh vs unsharded: the shard-graph
                                     # overhead anchor for scaling_model
  python scripts/r3_close.py hd4k    # 4K -> 16 views re-measure
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _setup():
    import jax
    from stereo_to_multiview_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    return jax


def _timeit(name, fn, arg, iters=4, batch=2):
    import jax
    import jax.numpy as jnp
    stacked = jnp.stack([arg] * batch)
    run = jax.jit(lambda st: jax.lax.map(fn, st))
    out = run(stacked)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(stacked)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    ms = (float(np.median(times)) * 1e3 - 30.0) / batch
    print(f"RESULT {name}: {ms:.2f} ms/frame (median)", flush=True)
    return ms


def halohd():
    """1080p/D=128 halo+band on a 1-device mesh: measures the sharded
    graph's overhead vs the unsharded pipeline (halo recompute + shard
    plumbing, no real ICI on one device) -- the measured T1 anchor for
    scripts/scaling_model.py's projection."""
    jax = _setup()
    import bench
    from stereo_to_multiview_tpu.config import HD1080_D128
    from stereo_to_multiview_tpu.models.pipeline import process_frame
    from stereo_to_multiview_tpu.parallel import make_mesh
    from stereo_to_multiview_tpu.parallel.halo import halo_process_frame
    cfg = HD1080_D128
    sbs = bench.bench_input(cfg)
    mesh = make_mesh((1,), ("row",), jax.devices()[:1])
    fn = halo_process_frame(mesh, cfg)
    out = fn(sbs)
    ref = process_frame(jax.device_put(sbs), cfg)
    same = all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(ref, out))
    print(f"RESULT halohd-exact-vs-single: {same}", flush=True)
    t_halo = _timeit("1080p halo+band (1-dev mesh)", fn, sbs)
    t_ref = _timeit("1080p unsharded", lambda s: process_frame(s, cfg),
                    jax.device_put(sbs))
    print(f"RESULT halohd-overhead: {t_halo - t_ref:.2f} ms "
          f"({(t_halo / t_ref - 1) * 100:.1f}%)", flush=True)


def hd4k():
    jax = _setup()
    import bench
    from stereo_to_multiview_tpu.config import UHD4K_16V
    from stereo_to_multiview_tpu.models.pipeline import process_frame
    cfg = UHD4K_16V
    # tile the 1080p fish input 2x2 to 4K
    hd = bench.bench_input(UHD4K_16V.replace(
        num_rows=1080, num_cols=1920, num_rows_out=1080,
        num_cols_out=1920))
    l, r = hd[:, :1920], hd[:, 1920:]
    big = np.concatenate([np.tile(l, (2, 2, 1)), np.tile(r, (2, 2, 1))],
                         axis=1)
    sbs = jax.device_put(big)
    _timeit("4K/D128/V16 process_frame",
            lambda s: process_frame(s, cfg), sbs, iters=3, batch=2)


if __name__ == "__main__":
    {"halohd": halohd, "hd4k": hd4k}[sys.argv[1]]()
