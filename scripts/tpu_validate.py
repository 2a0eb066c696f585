#!/usr/bin/env python
"""One-shot TPU validation phases, each a separate process so a relay
wedge can't take down the batch:

  python scripts/tpu_validate.py band     # band kernel micro-benchmark
  python scripts/tpu_validate.py fish     # full pipeline @ 640x384/D64
  python scripts/tpu_validate.py hd       # full pipeline @ 1080p/D128
  python scripts/tpu_validate.py fidelity # TPU band engine vs CPU golden run

All phases use the persistent compilation cache so later runs (including
the driver's bench.py) skip the multi-minute relay compile.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _setup():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _sync(out):
    import jax
    jax.tree.map(lambda x: np.asarray(x.ravel()[0]), out)


def _time_fn(fn, *args, iters=5, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    print(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        _sync(o)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"[{label}] {ms:.2f} ms/call ({1e3 / ms:.1f}/s)", flush=True)
    return ms


def _sbs(cfg, seed=0, shift=16):
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


def phase_band():
    jax = _setup()
    import jax.numpy as jnp
    from stereo_to_multiview_tpu.ops.band import band_span_sum_h
    rng = np.random.default_rng(0)
    H, W, D, usd = 1080, 1920, 128, 34
    vol = jax.device_put(rng.random((H, W, D), np.float32))
    x = np.arange(W)[None, :].repeat(H, 0)
    an = jnp.asarray(np.minimum(rng.integers(0, usd + 1, (H, W)), x)
                     .astype(np.int32))
    ap = jnp.asarray(np.minimum(rng.integers(0, usd + 1, (H, W)), W - x)
                     .astype(np.int32))
    for ns in (1, 2):
        _time_fn(lambda v: band_span_sum_h(v, an, ap, nsplit=ns), vol,
                 label=f"band_h 1080p/D128 nsplit={ns}")


def _phase_pipeline(cfg, label):
    jax = _setup()
    from stereo_to_multiview_tpu.models.pipeline import process_frame
    sbs = jax.device_put(_sbs(cfg))
    ms = _time_fn(lambda s: process_frame(s, cfg), sbs, label=label)
    return ms


def phase_fish():
    from stereo_to_multiview_tpu.config import FISH
    _phase_pipeline(FISH, "process_frame fish 640x384/D64/V8")


def phase_hd4k():
    """BASELINE measurement config 4: 4K in -> 16 interlaced views at 4K
    (identity-resolution interlace: a pure 16-way select)."""
    _setup()
    from stereo_to_multiview_tpu.config import UHD4K_16V
    _phase_pipeline(UHD4K_16V, "process_frame 4K/D128/V16")


def phase_hd():
    from stereo_to_multiview_tpu.config import HD1080_D128
    _phase_pipeline(HD1080_D128, "process_frame 1080p/D128/V8")


def phase_fidelity():
    """TPU band-engine outputs vs the CPU xla-engine golden run."""
    jax = _setup()
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.pipeline import process_frame
    cfg = PipelineConfig(num_rows=384, num_cols=640, num_rows_out=384,
                         num_cols_out=640, num_disp=64, zero_disp=32,
                         num_views=8)
    sbs = _sbs(cfg)
    t_dl, t_dr, t_il = map(np.asarray,
                           process_frame(jax.device_put(sbs), cfg))
    ref = np.load("/tmp/fidelity_cpu.npz")
    for name, tpu, cpu in (("disp_l", t_dl, ref["dl"]),
                           ("disp_r", t_dr, ref["dr"])):
        frac = np.mean(np.abs(tpu - cpu) > 1.0)
        print(f"{name}: frac(|diff|>1) = {frac:.4f}", flush=True)
        assert frac < 0.05, f"{name} diverges"
    frac = np.mean(np.abs(t_il.astype(int) - ref['il'].astype(int)) > 8)
    print(f"interlaced: frac(|diff|>8) = {frac:.4f}", flush=True)


def phase_tierule():
    """Tie-rule regression guard (VERDICT r4 weak-6): Mosaic's native
    argmin reduce is deterministic per backend but its tie index is NOT
    guaranteed lowest-first (the reference's rule, d_dc_wta.cu:24-34;
    documented trade in ops/band.py _res_kernel).  This phase feeds the
    fused-WTA aggregation a FLAT cost volume -- every disparity ties at
    every pixel -- and compares the chosen indices against a pinned
    snapshot (scripts/tie_rule_snapshot.npy).  A toolchain update that
    changes the tie choice fails loudly here instead of silently shifting
    content fidelity.  First run (no snapshot) writes it."""
    import os
    jax = _setup()
    import jax.numpy as jnp
    from stereo_to_multiview_tpu.ops.band import band_aggregate_q

    h, w, d, usd = 16, 256, 128, 8
    cost = jnp.full((h, w, d), 100, jnp.bfloat16)
    y = np.arange(h)[:, None] + np.zeros((1, w), np.int32)
    x = np.arange(w)[None, :] + np.zeros((h, 1), np.int32)
    arms = np.stack([np.minimum(usd, y), np.minimum(usd, h - 1 - y),
                     np.minimum(usd, x), np.minimum(usd, w - x)]
                    ).astype(np.int32)
    disp = np.asarray(band_aggregate_q(cost, jnp.asarray(arms), usd,
                                       zero_disp=d // 2))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tie_rule_snapshot.npy")
    if not os.path.exists(path):
        np.save(path, disp)
        print(f"tie-rule snapshot written: {path}", flush=True)
        return
    ref = np.load(path)
    if np.array_equal(ref, disp):
        print("tie rule unchanged (flat-cost argmin indices match the "
              "pinned snapshot)", flush=True)
    else:
        n = int(np.sum(ref != disp))
        print(f"TIE RULE CHANGED: {n}/{disp.size} flat-cost argmin "
              f"indices differ from the snapshot -- the Mosaic toolchain's "
              f"native-reduce tie choice moved; re-run scripts/fidelity.py "
              f"and re-pin if acceptable", flush=True)
        sys.exit(1)


def make_fidelity_golden():
    """Run on CPU first: writes /tmp/fidelity_cpu.npz."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.pipeline import process_frame
    cfg = PipelineConfig(num_rows=384, num_cols=640, num_rows_out=384,
                         num_cols_out=640, num_disp=64, zero_disp=32,
                         num_views=8)
    sbs = _sbs(cfg)
    dl, dr, il = map(np.asarray, process_frame(sbs, cfg))
    np.savez("/tmp/fidelity_cpu.npz", dl=dl, dr=dr, il=il)
    print("golden written", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["band", "fish", "hd", "hd4k",
                                      "fidelity", "tierule",
                                      "golden"])
    args = ap.parse_args()
    {"band": phase_band, "fish": phase_fish, "hd": phase_hd,
     "hd4k": phase_hd4k, "fidelity": phase_fidelity,
     "tierule": phase_tierule,
     "golden": make_fidelity_golden}[args.phase]()


if __name__ == "__main__":
    main()
