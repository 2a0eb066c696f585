#!/usr/bin/env python
"""Per-pass timing of the quantized band aggregation at the bench
geometry: pass 1 (H), fused V+V, pass 4 (H + WTA), each timed alone on
pre-materialized volumes.  Locates the gap between the measured
aggregate time (r4: 33 ms) and the additive roofline floor (17.3 ms).

Each pass runs `iters` times inside ONE jitted graph (the axon relay's
~30 ms dispatch floor would swamp per-call timing); a cheap input
perturbation per iteration defeats CSE.

  python scripts/agg_probe.py [--rows 1080 --cols 1920 --disp 128]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1080)
    ap.add_argument("--cols", type=int, default=1920)
    ap.add_argument("--disp", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--stages", default="all",
                    help="comma list from: passes, pair, full")
    ap.add_argument("--digits", type=int, default=3,
                    help="digit planes for the `full` stage "
                         "(cfg.band_digits; 3 is the shipping default)")
    args = ap.parse_args()
    want = args.stages.split(",")

    def W(name):
        return "all" in want or name in want

    import jax
    import jax.numpy as jnp
    from stereo_to_multiview_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from stereo_to_multiview_tpu import ops
    from stereo_to_multiview_tpu.ops import band as B
    from stereo_to_multiview_tpu.ops.cross import UP, DOWN, LEFT, RIGHT
    from stereo_to_multiview_tpu.config import PipelineConfig

    cfg = PipelineConfig(num_rows=args.rows, num_cols=args.cols,
                         num_rows_out=args.rows, num_cols_out=args.cols,
                         num_disp=args.disp, zero_disp=args.disp // 2)
    interp = jax.default_backend() == "cpu"
    h, w, d = args.rows, args.cols, args.disp
    usd = cfg.usd
    s1, s2, s3 = B.agg_rescale_shifts(usd)
    halo = B._halo_for(usd)

    # real arms (fish upscale) -- band sparsity tracks real content
    import bench
    sbs = bench.bench_input(cfg)
    img_l = jnp.asarray(np.ascontiguousarray(sbs[:, :w]))
    arms = jax.jit(lambda im: ops.cross_arms(
        im, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd))(img_l)
    arms = jax.tree.map(lambda a: a.astype(jnp.int32), arms)

    rng = np.random.default_rng(0)
    vol_u8 = jnp.asarray(rng.integers(0, 255, (h, w, d), dtype=np.uint8))
    vol_i16 = jnp.asarray(
        rng.integers(0, 32767, (w, h, d), dtype=np.int16))
    an_h, ap_h = arms[LEFT], arms[RIGHT]
    an_v, ap_v = arms[UP].T, arms[DOWN].T

    def timed(label, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(*xs)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        ms = (min(ts) - 0.030) / args.iters * 1e3
        print(f"{label:34s} {ms:7.2f} ms/call", flush=True)

    def loop_u8(pass_fn):
        def run(v):
            acc = jnp.float32(0)
            for i in range(args.iters):
                y = pass_fn(v ^ np.uint8(i))   # defeat CSE, ~0.1 ms
                for leaf in jax.tree.leaves(y):
                    acc = acc + leaf.ravel()[0].astype(jnp.float32)
            return acc
        return run

    def loop_i16(pass_fn):
        def run(v):
            acc = jnp.float32(0)
            for i in range(args.iters):
                y = pass_fn(v ^ np.int16(i))
                acc = acc + y.ravel()[0].astype(jnp.float32)
            return acc
        return run

    vol_hwd = jnp.asarray(
        rng.integers(0, 32767, (h, w, d), dtype=np.int16))
    if W("passes"):
        timed("pass1 (H, u8 in, i16 out_t)", loop_u8(
            lambda v: B._band_pass_h(v, an_h, ap_h, mode="int", terms=1,
                                     rescale=s1, out_dtype=jnp.int16,
                                     out_t=True, halo=halo,
                                     interpret=interp)), vol_u8)
        timed("VV fused (i16 in, i16 out_t)", loop_i16(
            lambda v: B._band_pass_vv(v, an_v, ap_v, s2=s2, s3=s3,
                                      halo=halo, digits=2, out_t=True,
                                      interpret=interp)), vol_i16)
        timed("pass4 (H + WTA, i16 in)", loop_i16(
            lambda v: B._band_pass_h(v, an_h, ap_h, mode="int", terms=2,
                                     wta=True, zero_disp=cfg.zero_disp,
                                     halo=halo, interpret=interp)),
              vol_hwd)

    # --- r5 digit-pair variants (pre-split bf16 lo/hi volumes) ---
    if W("pair"):
        _probe_pair(args, timed, loop_u8, loop_i16, B, an_h, ap_h, an_v,
                    ap_v, s1, s2, s3, halo, cfg, interp, vol_u8, vol_i16,
                    vol_hwd)
    if not W("full"):
        return

    arms4 = jnp.stack([an_v.T, ap_v.T, an_h, ap_h])   # UP, DOWN, L, R
    timed(f"full agg q (1 eye, digits={args.digits})", loop_u8(
        lambda v: B.band_aggregate_q(v, arms4, usd,
                                     zero_disp=cfg.zero_disp,
                                     digits=args.digits,
                                     interpret=interp)), vol_u8)
    # both eyes in ONE launch per pass: concat along the H grid axis --
    # H-pass windows run along W and V-pass windows along H *within each
    # eye's rows* (arms stop at each eye's borders), so the seam is never
    # crossed and results are bit-identical to two per-eye runs
    arms8 = jnp.concatenate([arms4, arms4], axis=1)
    timed("full agg q (2 eyes stacked)", loop_u8(
        lambda v: B.band_aggregate_q(
            jnp.concatenate([v, v ^ np.uint8(3)], axis=0), arms8, usd,
            zero_disp=cfg.zero_disp, interpret=interp)), vol_u8)
    for ot in (64, 192):
        timed(f"full agg q (1 eye, otile={ot})", loop_u8(
            lambda v, ot=ot: B.band_aggregate_q(
                v, arms4, usd, zero_disp=cfg.zero_disp, otile=ot,
                interpret=interp)), vol_u8)


def _probe_pair(args, timed, loop_u8, loop_i16, B, an_h, ap_h, an_v,
                ap_v, s1, s2, s3, halo, cfg, interp, vol_u8, vol_i16,
                vol_hwd):
    import jax
    import jax.numpy as jnp
    import numpy as np
    timed("pass1 -> digit pair", loop_u8(
        lambda v: B._band_pass_h(v, an_h, ap_h, mode="int", terms=1,
                                 rescale=s1, out_t=True, out_digits=True,
                                 halo=halo, interpret=interp)), vol_u8)

    def pair_of(v):
        vi = v.astype(jnp.int32)
        return ((vi % 256).astype(jnp.bfloat16),
                (vi // 256).astype(jnp.bfloat16))

    def loop_pair(pass_fn):
        def run(v):
            acc = jnp.float32(0)
            for i in range(args.iters):
                y = pass_fn(pair_of(v ^ np.int16(i)))
                acc = acc + jax.tree.leaves(y)[0].ravel()[0].astype(
                    jnp.float32)
            return acc
        return run

    timed("VV pair -> pair (+split ovh)", loop_pair(
        lambda p: B._band_pass_vv(p, an_v, ap_v, s2=s2, s3=s3, halo=halo,
                                  digits=2, out_t=True, out_digits=True,
                                  interpret=interp)), vol_i16)
    timed("pass4 pair (+split ovh)", loop_pair(
        lambda p: B._band_pass_h(p, an_h, ap_h, mode="int", terms=2,
                                 wta=True, zero_disp=cfg.zero_disp,
                                 halo=halo, interpret=interp)), vol_hwd)


if __name__ == "__main__":
    main()
