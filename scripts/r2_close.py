#!/usr/bin/env python
"""Round-closing TPU measurements, one phase per invocation:

  python scripts/r2_close.py halo1   # halo_process_frame on a 1-device
                                     # TPU mesh (Mosaic inside shard_map)
  python scripts/r2_close.py hd4k    # 4K -> 16 views (BASELINE config 4)
  python scripts/r2_close.py fid     # band-TPU vs xla-CPU fidelity
                                     # (needs /tmp/fidelity_cpu.npz)
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


def _mk(cfg, seed=0, shift=16):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (cfg.num_rows, cfg.num_cols + 2 * shift, 3),
                        dtype=np.uint8).astype(np.float32)
    k = np.ones(7, np.float32) / 7.0
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    left = base[:, :cfg.num_cols].astype(np.uint8)
    right = base[:, shift:shift + cfg.num_cols].astype(np.uint8)
    return np.concatenate([left, right], axis=1)


def _timeit(name, fn, arg, iters=3, batch=2):
    import jax
    import jax.numpy as jnp
    stacked = jnp.stack([arg] * batch)
    run = jax.jit(lambda st: jax.lax.map(fn, st))
    out = run(stacked)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(stacked)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    ms = ((time.perf_counter() - t0) / iters * 1e3 - 30.0) / batch
    print(f"RESULT {name}: {ms:.2f} ms/frame", flush=True)


def halo1():
    jax = _setup()
    from stereo_to_multiview_tpu.config import FISH
    from stereo_to_multiview_tpu.parallel import make_mesh
    from stereo_to_multiview_tpu.parallel.halo import halo_process_frame
    cfg = FISH
    mesh = make_mesh((1,), ("row",), jax.devices()[:1])
    fn = halo_process_frame(mesh, cfg)
    sbs = _mk(cfg)
    out = fn(sbs)
    dl = np.asarray(out[0])
    print("RESULT halo1-TPU: OK", dl.shape, float(np.abs(dl).mean()),
          flush=True)
    # compare vs the unsharded band pipeline (must be bit-exact)
    from stereo_to_multiview_tpu.models.pipeline import process_frame
    ref = process_frame(jax.device_put(sbs), cfg)
    same = all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(ref, out))
    print(f"RESULT halo1-exact-vs-single: {same}", flush=True)


def hd4k():
    jax = _setup()
    from stereo_to_multiview_tpu.config import UHD4K_16V
    from stereo_to_multiview_tpu.models.pipeline import process_frame
    cfg = UHD4K_16V
    sbs = jax.device_put(_mk(cfg))
    _timeit("4K/D128/V16 process_frame",
            lambda s: process_frame(s, cfg), sbs, iters=3, batch=2)


def fid():
    jax = _setup()
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.pipeline import process_frame
    cfg = PipelineConfig(num_rows=384, num_cols=640, num_rows_out=384,
                         num_cols_out=640, num_disp=64, zero_disp=32,
                         num_views=8)
    sbs = _mk(cfg)
    t_dl, t_dr, t_il = map(np.asarray,
                           process_frame(jax.device_put(sbs), cfg))
    ref = np.load("/tmp/fidelity_cpu.npz")
    for name, tpu, cpu in (("disp_l", t_dl, ref["dl"]),
                           ("disp_r", t_dr, ref["dr"])):
        frac1 = np.mean(np.abs(tpu - cpu) > 1.0)
        frac0 = np.mean(tpu != cpu)
        print(f"RESULT fidelity {name}: frac(any diff)={frac0:.4f} "
              f"frac(|diff|>1)={frac1:.4f}", flush=True)
    fr8 = np.mean(np.abs(t_il.astype(int) - ref["il"].astype(int)) > 8)
    fr0 = np.mean(t_il != ref["il"])
    print(f"RESULT fidelity interlaced: frac(any diff)={fr0:.4f} "
          f"frac(|diff|>8)={fr8:.4f}", flush=True)


if __name__ == "__main__":
    {"halo1": halo1, "hd4k": hd4k, "fid": fid}[sys.argv[1]]()
