#!/usr/bin/env python
"""Per-stage timing of the band-engine pipeline with the relay's ~30 ms
per-dispatch floor amortized away: each stage is wrapped in lax.map over a
small batch and timed as ONE dispatch.

Usage: python scripts/profile_band.py [--rows N --cols N --disp N] [--stage S]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=384)
    ap.add_argument("--cols", type=int, default=640)
    ap.add_argument("--disp", type=int, default=64)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--stages", default="all",
                    help="comma list: core,dcc,irv,bilateral,"
                         "arms,synth,mux,full")
    ap.add_argument("--input", default="noise", choices=("noise", "fish"),
                    help="fish = the bench's real-content input "
                         "(bench.bench_input; IRV early-stop and dcc "
                         "sparsity behave as on real footage)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stereo_to_multiview_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu import ops
    from stereo_to_multiview_tpu.ops import band as B

    cfg = PipelineConfig(num_rows=args.rows, num_cols=args.cols,
                         num_rows_out=args.rows, num_cols_out=args.cols,
                         num_disp=args.disp, zero_disp=args.disp // 2,
                         num_views=args.views)
    interp = jax.default_backend() == "cpu"
    if args.input == "fish":
        import bench
        sbs = bench.bench_input(cfg)
        img_l = jax.device_put(np.ascontiguousarray(
            sbs[:, :cfg.num_cols]))
        img_r = jax.device_put(np.ascontiguousarray(
            sbs[:, cfg.num_cols:]))
    else:
        rng = np.random.default_rng(0)
        base = rng.integers(0, 256, (cfg.num_rows, cfg.num_cols + 16, 3),
                            dtype=np.uint8)
        img_l = jax.device_put(np.ascontiguousarray(base[:, :cfg.num_cols]))
        img_r = jax.device_put(np.ascontiguousarray(base[:, 16:]))
    B_N = args.batch

    def timed(label, fn, *xs, vmem_kib=0):
        """fn maps one tuple of arrays -> pytree; timed over lax.map.
        vmem_kib > 0 raises the scoped-vmem ceiling (top-level jit
        compiler_options -- the only way through the relay)."""
        stacked = tuple(jnp.stack([x] * B_N) for x in xs)

        opts = ({"xla_tpu_scoped_vmem_limit_kib": vmem_kib}
                if vmem_kib else None)

        @functools.partial(jax.jit, compiler_options=opts)
        def run(st):
            return jax.lax.map(lambda t: fn(*t), st)

        def sync(o):
            jax.tree.map(lambda a: np.asarray(a.ravel()[0]), o)

        t0 = time.perf_counter()
        sync(run(stacked))
        print(f"{label:24s} compile+first {time.perf_counter()-t0:7.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            sync(run(stacked))
        ms = (time.perf_counter() - t0) / args.iters
        per = (ms * 1e3 - 30.0) / B_N
        print(f"{label:24s} {per:8.2f} ms/frame (net of dispatch)",
              flush=True)
        return per

    want = set(args.stages.split(","))

    def W(name):
        return "all" in want or name in want

    # precompute stage inputs once (host->device), in ONE jitted graph --
    # eager mode would pay the relay's ~30 ms floor per op
    @jax.jit
    def _pre(l, r):
        al = ops.cross_arms(l, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
        ar = ops.cross_arms(r, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
        dl, dr_ = B.band_stereo_core_chunked(l, r, al, ar, cfg, interp)
        ol, orr = ops.dr_dcc(dl, dr_, cfg.dcc_thresh,
                             num_disp=cfg.num_disp, zero_disp=cfg.zero_disp)
        return al, ar, dl, dr_, ol, orr

    t0 = time.perf_counter()
    arms_l, arms_r, disp_l, disp_r, out_l, out_r = _pre(img_l, img_r)
    jax.tree.map(lambda a: np.asarray(a.ravel()[0]),
                 (arms_l, disp_l, out_l))
    print(f"precompute {time.perf_counter()-t0:.1f}s", flush=True)

    if W("arms"):
        # the shipping TPU path (pipeline.compute_disparities band branch)
        from stereo_to_multiview_tpu.ops.postkern import cross_arms_kern_lr
        timed("cross_arms_kern_lr", lambda l, r: cross_arms_kern_lr(
            l, r, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd, interpret=interp),
            img_l, img_r)
    if W("armsweep"):
        # walk-axis rows per grid step (the F_k-sharing rewrite shifts
        # the optimum: bigger blocks amortize the shared compare plane)
        from stereo_to_multiview_tpu.ops.postkern import _arms_vertical
        planes = jnp.moveaxis(img_l.astype(jnp.int32), 2, 0)
        for r_ in (40, 64, 128):
            timed(f"arms_vertical rows={r_}",
                  lambda p, r2=r_: _arms_vertical(
                      p, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd, rows=r2,
                      interpret=interp), planes)
    if W("armsxla"):
        timed("cross_arms(xla) x2", lambda l, r: (
            ops.cross_arms(l, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd),
            ops.cross_arms(r, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)),
            img_l, img_r)
    if W("core"):
        timed("stereo_core_chunked", lambda l, r, al, ar:
              B.band_stereo_core_chunked(l, r, al, ar, cfg, interp),
              img_l, img_r, arms_l, arms_r)
    if W("coredm"):
        timed("stereo_core_dm", lambda l, r, al, ar:
              B.band_stereo_core_dm(l, r, al, ar, cfg, interp),
              img_l, img_r, arms_l, arms_r)
    if W("cost"):
        from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern
        timed("ci_adcensus_kern", lambda l, r: ci_adcensus_kern(
            l, r, cfg.ad_coeff, cfg.census_coeff, cfg.num_disp,
            cfg.zero_disp, quant=True, interpret=interp), img_l, img_r)
    if W("costxm"):
        from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern_xm
        timed("ci_adcensus_kern_xm", lambda l, r: ci_adcensus_kern_xm(
            l, r, cfg.ad_coeff, cfg.census_coeff, cfg.num_disp,
            cfg.zero_disp, quant=True, interpret=interp), img_l, img_r)
    if W("costx2"):
        # two-eye variant (no shear extraction): the round-3 A/B
        from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern_xm
        timed("ci_adcensus_kern_xm noshear", lambda l, r: ci_adcensus_kern_xm(
            l, r, cfg.ad_coeff, cfg.census_coeff, cfg.num_disp,
            cfg.zero_disp, quant=True, shear=False, interpret=interp),
            img_l, img_r)
    if W("costxa"):
        # exp ablation (wrong values, timing only): isolates the
        # transcendental share of the cost kernel
        from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern_xm
        timed("ci_adcensus_kern_xm noexp", lambda l, r: ci_adcensus_kern_xm(
            l, r, cfg.ad_coeff, cfg.census_coeff, cfg.num_disp,
            cfg.zero_disp, quant=True, ablate_exp=True, interpret=interp),
            img_l, img_r)
    if W("aggsweep"):
        # aggregation tile-shape sweep: cost init is recomputed inside each
        # timed graph (holding batched cost volumes would blow HBM at
        # 1080p); subtract the "cost" stage time to compare shapes
        from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern

        from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern_xm

        def agg(l, r, al, ar, rows, otile, digits):
            cl, cr = ci_adcensus_kern_xm(
                l, r, cfg.ad_coeff, cfg.census_coeff, cfg.num_disp,
                cfg.zero_disp, quant=True, interpret=interp)
            return tuple(B.band_aggregate_q(c, a, cfg.usd,
                                            zero_disp=cfg.zero_disp,
                                            interpret=interp, rows=rows,
                                            otile=otile, digits=digits)
                         for c, a in ((cl, al), (cr, ar)))
        for rows, otile, digits in ((8, 128, 2), (16, 128, 2), (8, 256, 2),
                                    (8, 512, 2), (16, 256, 2), (8, 256, 1),
                                    (8, 128, 1)):
            timed(f"cost+agg r{rows} t{otile} d{digits}",
                  lambda l, r, al, ar, rw=rows, ot=otile, dg=digits:
                  agg(l, r, al, ar, rw, ot, dg),
                  img_l, img_r, arms_l, arms_r, vmem_kib=65536)
    if W("dcc"):
        from stereo_to_multiview_tpu.ops.postkern import dcc_occl_kern
        timed("dcc_occl_kern", lambda a, b: dcc_occl_kern(
            a, b, cfg.dcc_thresh, with_labels=True,
            num_disp=cfg.num_disp, zero_disp=cfg.zero_disp,
            interpret=interp), disp_l, disp_r)
    if W("irv"):
        timed(f"dr_irv_chunked x{cfg.irv_iterations}",
              lambda dl, ol, dr_, orr, al, ar: B.dr_irv_band_chunked(
                  dl, ol, dr_, orr, al, ar, cfg, interp),
              disp_l, out_l, disp_r, out_r, arms_l, arms_r)
    if W("bilateral"):
        from stereo_to_multiview_tpu.ops.postkern import (
            filter_bilateral_kern)
        timed("bilateral_kern x2", lambda a, b: (
            filter_bilateral_kern(a, cfg.bilateral_radius,
                                  cfg.bilateral_sigma_color,
                                  cfg.bilateral_sigma_spatial,
                                  cfg.num_disp, interp),
            filter_bilateral_kern(b, cfg.bilateral_radius,
                                  cfg.bilateral_sigma_color,
                                  cfg.bilateral_sigma_spatial,
                                  cfg.num_disp, interp)),
            disp_l, disp_r)
    if W("synth"):
        from stereo_to_multiview_tpu.models.pipeline import synthesize_views
        timed(f"synthesize (V={cfg.num_views})",
              lambda l, r, a, b: synthesize_views(l, r, a, b, cfg),
              img_l, img_r, disp_l, disp_r)
    if W("synthsub"):
        # synth substages (sum ~ synth; the merge loop is the remainder)
        from stereo_to_multiview_tpu.ops.postkern import dcc_occl_kern
        from stereo_to_multiview_tpu.ops.dibr import dibr_feather_mask
        from stereo_to_multiview_tpu.ops.warpkern import dibr_warp_views_kern
        timed("s:occl", lambda a, b: dcc_occl_kern(
            a, b, with_labels=False, num_disp=cfg.num_disp,
            zero_disp=cfg.zero_disp, interpret=interp), disp_l, disp_r)
        occl_l, occl_r = dcc_occl_kern(
            disp_l, disp_r, with_labels=False, num_disp=cfg.num_disp,
            zero_disp=cfg.zero_disp, interpret=interp)
        from stereo_to_multiview_tpu.ops.postkern import (
            filter_bleed_mask_kern)
        timed("s:bleed+mask kern", lambda a, b: filter_bleed_mask_kern(
            a, b, cfg.bleed_radius, interp), occl_l, occl_r)
        mask_r = ops.dibr_occl_to_mask(ops.filter_bleed(
            occl_r, cfg.bleed_radius))
        timed("s:feather", lambda m: dibr_feather_mask(
            m, cfg.feather_radius, cfg.feather_sigma), mask_r)
        shifts = tuple(float(np.float32(1.0)
                             - np.float32(v_i)
                             / np.float32(cfg.num_views - 1.0))
                       for v_i in range(1, cfg.num_views - 1))
        # subsample the (V-2, H, W, 3) f32 outputs: lax.map would stack
        # batch x views full frames (25 GB at batch 4); the kernel's work
        # is opaque to DCE so the timing is unaffected
        from stereo_to_multiview_tpu.ops.warpkern import (
            dibr_warp_views_kern_xm)
        timed("s:warp_views xm", lambda l, r, a, b: jax.tree.map(
            lambda v: v[:, ::16, ::16], dibr_warp_views_kern_xm(
                l, r, a, b, shifts, cfg.num_disp, cfg.zero_disp, interp)),
            img_l, img_r, disp_l, disp_r)
        timed("s:warp_views natural", lambda l, r, a, b: jax.tree.map(
            lambda v: v[:, ::16, ::16], dibr_warp_views_kern(
                l, r, a, b, shifts, cfg.num_disp, cfg.zero_disp, interp)),
            img_l, img_r, disp_l, disp_r)
    if W("mux"):
        from stereo_to_multiview_tpu.models.pipeline import synthesize_views
        views = synthesize_views(img_l, img_r, disp_l, disp_r, cfg)
        timed("mux_multiview", lambda v: ops.mux_multiview(
            v, cfg.num_rows_out, cfg.num_cols_out, cfg.angle), views)
    if W("full"):
        from stereo_to_multiview_tpu.models.pipeline import process_frame
        sbs = jnp.concatenate([img_l, img_r], axis=1)
        timed("FULL process_frame", lambda s: process_frame(s, cfg), sbs)


if __name__ == "__main__":
    main()
