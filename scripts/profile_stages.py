#!/usr/bin/env python
"""Per-stage TPU timing (the analog of the reference's per-kernel cudaEvent
prints).  Each stage is jitted alone and timed with a forced host fetch,
since block_until_ready is unreliable through the axon relay."""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=3, name=""):
    import jax
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        # fetch one element per output to force completion
        jax.tree.map(lambda x: np.asarray(x.ravel()[0]), out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"[[ {name:28s} {ms:9.2f} ms ]]")
    return out, ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=384)
    ap.add_argument("--cols", type=int, default=640)
    ap.add_argument("--disp", type=int, default=64)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from functools import partial

    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu import ops
    from stereo_to_multiview_tpu.models.pipeline import (
        process_frame, synthesize_views)

    cfg = PipelineConfig(
        num_rows=args.rows, num_cols=args.cols, num_rows_out=args.rows,
        num_cols_out=args.cols, num_disp=args.disp,
        zero_disp=args.disp // 2, num_views=args.views)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (cfg.num_rows, cfg.num_cols + 16, 3),
                        dtype=np.uint8)
    img_l = jax.device_put(np.ascontiguousarray(base[:, :cfg.num_cols]))
    img_r = jax.device_put(np.ascontiguousarray(base[:, 16:16 + cfg.num_cols]))
    it = args.iters

    jit = jax.jit

    (cost_l, cost_r), _ = timeit(
        jit(partial(ops.ci_adcensus, ad_coeff=cfg.ad_coeff,
                    census_coeff=cfg.census_coeff, num_disp=cfg.num_disp,
                    zero_disp=cfg.zero_disp)),
        img_l, img_r, iters=it, name="ci_adcensus")

    arms_l, _ = timeit(
        jit(partial(ops.cross_arms, ucd=cfg.ucd, lcd=cfg.lcd, usd=cfg.usd,
                    lsd=cfg.lsd)), img_l, iters=it, name="cross_arms")

    acost_l, _ = timeit(jit(ops.cross_aggregate), cost_l, arms_l,
                        iters=it, name="cross_aggregate")

    disp_l, _ = timeit(jit(partial(ops.dc_wta, zero_disp=cfg.zero_disp)),
                       acost_l, iters=it, name="dc_wta")
    acost_r = ops.cross_aggregate(cost_r, ops.cross_arms(
        img_r, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd))
    disp_r = ops.dc_wta(acost_r, cfg.zero_disp)

    (out_l, out_r), _ = timeit(jit(partial(ops.dr_dcc, thresh=cfg.dcc_thresh)),
                               disp_l, disp_r, iters=it, name="dr_dcc")

    _, _ = timeit(
        partial(ops.dr_irv, thresh_s=cfg.irv_thresh_s,
                thresh_h=cfg.irv_thresh_h, num_disp=cfg.num_disp,
                zero_disp=cfg.zero_disp, usd=cfg.usd,
                iterations=cfg.irv_iterations),
        disp_l, out_l, arms_l, iters=it, name="dr_irv (x5)")

    _, _ = timeit(
        jit(partial(ops.filter_bilateral, radius=cfg.bilateral_radius,
                    sigma_color=cfg.bilateral_sigma_color,
                    sigma_spatial=cfg.bilateral_sigma_spatial,
                    num_disp=cfg.num_disp)),
        disp_l, iters=it, name="filter_bilateral")

    _, _ = timeit(jit(partial(synthesize_views, cfg=cfg)),
                  img_l, img_r, disp_l, disp_r, iters=it,
                  name=f"synthesize_views (V={cfg.num_views})")

    views = synthesize_views(img_l, img_r, disp_l, disp_r, cfg)
    _, _ = timeit(jit(partial(ops.mux_multiview, num_rows_out=cfg.num_rows_out,
                              num_cols_out=cfg.num_cols_out, angle=cfg.angle)),
                  views, iters=it, name="mux_multiview")

    sbs = jnp.concatenate([img_l, img_r], axis=1)
    _, _ = timeit(partial(process_frame, cfg=cfg), sbs, iters=it,
                  name="FULL process_frame")


if __name__ == "__main__":
    main()
