#!/usr/bin/env python
"""North-star fidelity on the REAL bundled fixtures: band-engine TPU vs
xla-engine CPU on the bud and fish stereo pairs, comparing disparities,
EVERY synthesized view, and the interlaced frame -- plus the 1080p bench
config's disparities (--bench1080).

  python scripts/fidelity.py golden [--bench1080]  # CPU xla -> npz
  python scripts/fidelity.py tpu [--digits N] [--bench1080]

The xla-CPU run is the reference-semantics golden (f32 aggregation, exp
combine, reference tie rules); the band engine deviates only by the
documented 1/127 cost quantization + bounded rescale roundings.
--digits 1 measures the single-digit fast aggregation path.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

PAIRS = (("bud", "tests/data/bud_2.bmp", "tests/data/bud_3.bmp"),
         ("fish", "tests/data/fish_1.bmp", "tests/data/fish_2.bmp"))
NPZ = "/tmp/fid.npz"


def _outputs(engine, digits=2, bench1080=False):
    import jax.numpy as jnp
    from stereo_to_multiview_tpu.config import BUD, FISH
    from stereo_to_multiview_tpu.models.pipeline import (
        compute_disparities, synthesize_views)
    from stereo_to_multiview_tpu.utils import read_bmp
    from stereo_to_multiview_tpu import ops
    import jax

    out = {}
    pairs = list(PAIRS)
    if bench1080:
        pairs.append(("hd", None, None))
    for name, lp, rp in pairs:
        if name == "hd":
            # the bench config itself: fish-3x bilinear input, 1080p D=128
            import bench
            from stereo_to_multiview_tpu.config import HD1080_D128
            cfg = HD1080_D128.replace(engine=engine, band_digits=digits)
            sbs = bench.bench_input(cfg)
            l = jnp.asarray(sbs[:, :cfg.num_cols])
            r = jnp.asarray(sbs[:, cfg.num_cols:])

            @jax.jit
            def run_d(l, r, cfg=cfg):
                dl, dr, _, _ = compute_disparities(l, r, cfg)
                return dl, dr

            dl, dr = map(np.asarray, run_d(l, r))
            out["hd_dl"] = dl
            out["hd_dr"] = dr
            continue
        cfg = (BUD if name == "bud" else FISH).replace(engine=engine,
                                                       band_digits=digits)
        l = jnp.asarray(read_bmp(lp))
        r = jnp.asarray(read_bmp(rp))

        @jax.jit
        def run(l, r, cfg=cfg):
            dl, dr, _, _ = compute_disparities(l, r, cfg)
            views = synthesize_views(l, r, dl, dr, cfg)
            il = ops.mux_multiview(views, cfg.num_rows_out,
                                   cfg.num_cols_out, cfg.angle)
            return dl, dr, views, il

        dl, dr, views, il = map(np.asarray, run(l, r))
        out[f"{name}_dl"] = dl
        out[f"{name}_dr"] = dr
        out[f"{name}_views"] = views
        out[f"{name}_il"] = il
    return out


def golden(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    np.savez(NPZ, **_outputs("xla", bench1080=args.bench1080))
    print("golden written:", NPZ)


def tpu(args):
    from stereo_to_multiview_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    ref = np.load(NPZ)
    got = _outputs("band", digits=args.digits, bench1080=args.bench1080)
    if args.bench1080 and "hd_dl" in ref:
        dl_bad = np.mean(np.abs(ref["hd_dl"] - got["hd_dl"]) > 1)
        dr_bad = np.mean(np.abs(ref["hd_dr"] - got["hd_dr"]) > 1)
        print(f"hd1080 digits={args.digits}: disp_l frac(|d|>1) = "
              f"{dl_bad:.4f}  disp_r = {dr_bad:.4f}")
    for name, _, _ in PAIRS:
        dl_bad = np.mean(np.abs(ref[f"{name}_dl"] - got[f"{name}_dl"]) > 1)
        dr_bad = np.mean(np.abs(ref[f"{name}_dr"] - got[f"{name}_dr"]) > 1)
        vd = np.abs(ref[f"{name}_views"].astype(int)
                    - got[f"{name}_views"].astype(int))
        il_d = np.abs(ref[f"{name}_il"].astype(int)
                      - got[f"{name}_il"].astype(int))
        print(f"{name}: disp_l frac(|d|>1) = {dl_bad:.4f}  "
              f"disp_r = {dr_bad:.4f}")
        for v in range(vd.shape[0]):
            print(f"  view {v}: frac(|diff|>8) = "
                  f"{np.mean(vd[v] > 8):.4f}  max = {vd[v].max()}")
        print(f"  interlaced: frac(|diff|>8) = {np.mean(il_d > 8):.4f}  "
              f"max = {il_d.max()}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=("golden", "tpu"))
    ap.add_argument("--digits", type=int, default=3)
    ap.add_argument("--bench1080", action="store_true")
    args = ap.parse_args()
    (golden if args.phase == "golden" else tpu)(args)
