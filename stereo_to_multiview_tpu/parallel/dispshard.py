"""Disparity-plane sharding: the D axis of the stereo core across devices.

The reference's cost loop is a per-thread serial scan over disparities
(d_ci_ad.cu:53; WTA reduction d_dc_wta.cu:24-34).  Cost initialization and
cross aggregation are perfectly parallel over D, so the D axis shards
cleanly (BASELINE measurement config 3): each device builds and aggregates
its num_disp/n slice of the cost volume, computes a local first-min, and
one argmin-with-index all-reduce over the `disp` mesh axis produces the
global WTA winner.

SPMD subtlety: the per-shard disparity offset d0 = axis_index * dloc is
traced, so the usual static per-plane shifts cannot encode it.  Instead
the *other-eye* planes are pre-padded so that every absolute read
x + (d - zero_disp) lands in bounds (no clamping ever fires inside the
window), one lax.dynamic_slice at the traced offset extracts the shard's
(W + dloc)-wide window, and the per-local-plane shifts inside the window
are static again.  The result is bit-identical to the unsharded XLA
engine: per-plane arithmetic is untouched, and the all-reduce preserves
the reference's first-minimum tie rule (lower d wins) because shards are
ordered by d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from stereo_to_multiview_tpu.config import PipelineConfig
from stereo_to_multiview_tpu import ops

F32 = jnp.float32


def _window_cost(own_img, oth_planes_pad, own_cen, oth_cen_pad, start,
                 dloc: int, ad_coeff: float, census_coeff: float,
                 ascending: bool):
    """Cost for dloc consecutive planes from pre-padded other-eye planes.

    oth_*_pad are edge-padded along x so that absolute reads never clamp;
    `start` (traced) is the window origin for this shard's first plane.
    ascending: whether the plane offset inside the window increases with
    the local plane index (left eye) or decreases (right eye).
    Returns (dloc, H, W) f32, bit-identical to ops.ci_adcensus planes.
    """
    from stereo_to_multiview_tpu.ops.cost import ci_adcensus_combine
    h, w = own_img.shape[:2]
    third = F32(0.33333333333)
    img_win = jax.lax.dynamic_slice(
        oth_planes_pad, (0, start, 0), (h, w + dloc, 3))
    cen_win = jax.lax.dynamic_slice(
        oth_cen_pad, (0, start, 0), (h, w + dloc, 2))
    own_i = own_img.astype(jnp.int32)
    costs = []
    for dl in range(dloc):
        off = dl if ascending else (dloc - 1 - dl)
        oth_i = img_win[:, off:off + w].astype(jnp.int32)
        ad = jnp.abs(own_i - oth_i).sum(-1).astype(F32) * third
        ham = ops.hamming48(own_cen, cen_win[:, off:off + w]).astype(F32)
        costs.append(ci_adcensus_combine(ad, ham, ad_coeff, census_coeff))
    return jnp.stack(costs)


def disp_sharded_disparities(mesh: Mesh, cfg: PipelineConfig,
                             disp_axis: str = "disp",
                             with_arms: bool = False):
    """Jitted (img_l, img_r) -> (disp_l, disp_r), the AD-Census stereo
    core with cost init + aggregation sharded over the D axis and WTA as
    an argmin-with-index all-reduce.  Outputs are replicated.

    Per-shard aggregation follows cfg.engine: on the band engine each
    shard runs the quantized integer band aggregation (band_aggregate_q)
    on its D-slice -- per-plane exact, so the all-reduce consumes exact
    integer minima and the result is bit-identical to the unsharded
    band core (ties stay first-min: shards are ordered by d).  The XLA
    engine path keeps the f32 cross_aggregate (bit-identical to the
    unsharded XLA engine).

    with_arms=True: the returned fn takes (img_l, img_r, arms_l, arms_r)
    so a caller that needs the arms later (IRV) computes them once
    (VERDICT r2 item 7: disp_sharded_process_frame used to build them
    twice)."""
    n = mesh.shape[disp_axis]
    if cfg.num_disp % n:
        raise ValueError(f"num_disp {cfg.num_disp} not divisible by "
                         f"disp axis size {n}")
    dloc = cfg.num_disp // n
    nd, zd, usd = cfg.num_disp, cfg.zero_disp, cfg.usd
    from stereo_to_multiview_tpu.models.pipeline import _use_band
    band = _use_band(cfg)

    def shard_fn(img_l, img_r, arms_l, arms_r):
        idx = jax.lax.axis_index(disp_axis)
        d0 = idx * dloc
        from stereo_to_multiview_tpu.models import pipeline as _pl
        interpret = (jax.default_backend() == "cpu"
                     and not _pl.FORCE_MOSAIC)

        cen_l = ops.census_transform_9x7(ops.mux_average(img_l))
        cen_r = ops.census_transform_9x7(ops.mux_average(img_r))

        from stereo_to_multiview_tpu.ops.shiftops import edge_pad
        # left eye reads R at x + (d - zd), d in [d0, d0 + dloc):
        # pad lo=zd hi=nd -> padded index x + d; window start d0
        rp_img = edge_pad(img_r.astype(jnp.int32), 1, zd, nd)
        rp_cen = edge_pad(cen_r, 1, zd, nd)
        cost_l = _window_cost(img_l, rp_img, cen_l, rp_cen, d0, dloc,
                              cfg.ad_coeff, cfg.census_coeff,
                              ascending=True)
        # right eye reads L at x - (d - zd): padded index x + (nd - d);
        # window start nd - d0 - dloc + 1, offsets descend with local d
        lp_img = edge_pad(img_l.astype(jnp.int32), 1, nd - zd, zd + 1)
        lp_cen = edge_pad(cen_l, 1, nd - zd, zd + 1)
        start_r = nd - d0 - dloc + 1
        cost_r = _window_cost(img_r, lp_img, cen_r, lp_cen, start_r, dloc,
                              cfg.ad_coeff, cfg.census_coeff,
                              ascending=False)

        if band:
            from stereo_to_multiview_tpu.ops.band import (
                band_aggregate_q, quantize_cost)
            digits = getattr(cfg, "band_digits", 2)
            qsc = getattr(cfg, "band_qscale", 127.0)
            agg = lambda cost, arms: jnp.moveaxis(band_aggregate_q(
                quantize_cost(jnp.moveaxis(cost, 0, 2), qsc), arms, usd,
                digits=digits, qscale=qsc, interpret=interpret), 2, 0)
            acost_l = agg(cost_l, arms_l)
            acost_r = agg(cost_r, arms_r)
        else:
            acost_l = ops.cross_aggregate(cost_l, arms_l, max_arm=usd)
            acost_r = ops.cross_aggregate(cost_r, arms_r, max_arm=usd)

        def wta(acost):
            val = acost.min(axis=0)
            loc = jnp.argmin(acost, axis=0).astype(jnp.int32) + d0
            vals = jax.lax.all_gather(val, disp_axis)   # (n, H, W)
            locs = jax.lax.all_gather(loc, disp_axis)
            # global first-min: shards ordered by d, argmin takes the
            # first minimal shard; within a shard argmin was first-min
            k = jnp.argmin(vals, axis=0)
            disp = jnp.zeros(val.shape, jnp.int32)
            for i in range(n):
                disp = jnp.where(k == i, locs[i], disp)
            return (disp - zd).astype(F32)

        if not cfg.use_hslo:
            return wta(acost_l), wta(acost_r)

        # HSLO couples every d per column, so D-shards cannot run the
        # scanline DP locally.  Reshard disparity -> rows with ONE
        # all_to_all (each device trades its D-slice of other devices'
        # rows for all D of its own rows -- the sequence-parallel
        # "Ulysses" move), run the full-D DP + WTA on the local row
        # slab, and all_gather the disparity rows back.
        h, w = img_l.shape[:2]
        if h % n:
            raise ValueError("use_hslo with disparity sharding needs "
                             "num_rows divisible by the mesh")
        if band:
            from stereo_to_multiview_tpu.ops.band import agg_cost_scale
            kq = agg_cost_scale(usd, getattr(cfg, "band_digits", 2),
                                getattr(cfg, "band_qscale", 127.0))
        else:
            kq = cfg.xla_agg_qscale if cfg.xla_agg_qscale > 0 else 1.0
        hloc = h // n
        gray_l = ops.mux_average(img_l)
        gray_r = ops.mux_average(img_r)
        gl = jax.lax.dynamic_slice(gray_l, (d0 // dloc * hloc, 0),
                                   (hloc, w))
        gr = jax.lax.dynamic_slice(gray_r, (d0 // dloc * hloc, 0),
                                   (hloc, w))

        from stereo_to_multiview_tpu.models import pipeline as _pl
        interpret2 = (jax.default_backend() == "cpu"
                      and not _pl.FORCE_MOSAIC)

        def hslo_wta(acost, sign):
            full = jax.lax.all_to_all(acost.astype(F32), disp_axis,
                                      split_axis=1, concat_axis=0,
                                      tiled=True)       # (nd, hloc, W)
            if band:
                # the SAME fused DP+WTA kernel the band core runs (the
                # DP carry's f32 association is kernel-specific, so
                # bit-exactness vs single device requires the identical
                # kernel); its (H, W, D) layout wants one moveaxis of
                # the row slab
                from stereo_to_multiview_tpu.ops.hslokern import (
                    dc_hslo_wta_kern)
                ga, gb = (gl, gr) if sign > 0 else (gr, gl)
                rows = dc_hslo_wta_kern(
                    jnp.transpose(full, (2, 1, 0)), ga, gb, nd, zd,
                    cfg.hslo_T, cfg.hslo_H1 * kq, cfg.hslo_H2 * kq,
                    sign=sign, interpret=interpret2)
            else:
                a = ops.dc_hslo(full, gl, gr, nd, zd, cfg.hslo_T,
                                cfg.hslo_H1 * kq, cfg.hslo_H2 * kq,
                                sign=sign)
                rows = (jnp.argmin(a, axis=0).astype(jnp.int32)
                        - zd).astype(F32)               # (hloc, W)
            return jax.lax.all_gather(rows, disp_axis, tiled=True)

        return hslo_wta(acost_l, +1), hslo_wta(acost_r, -1)

    from jax import shard_map
    # check_vma off: outputs are made replicated by the all_gather+argmin
    # reduce, which the varying-axis checker cannot see through.
    fn = shard_map(shard_fn, mesh=mesh, in_specs=(P(),) * 4,
                   out_specs=(P(), P()), check_vma=False)
    if with_arms:
        return jax.jit(fn)

    @jax.jit
    def fn_noarms(img_l, img_r):
        arms_l = ops.cross_arms(img_l, cfg.ucd, cfg.lcd, usd, cfg.lsd)
        arms_r = ops.cross_arms(img_r, cfg.ucd, cfg.lcd, usd, cfg.lsd)
        return fn(img_l, img_r, arms_l, arms_r)

    return fn_noarms


def disp_sharded_process_frame(mesh: Mesh, cfg: PipelineConfig,
                               disp_axis: str = "disp"):
    """Full SBS -> (disp_l, disp_r, interlaced) pipeline with the stereo
    core D-sharded (BASELINE config 3).  Refinement + synthesis run
    replicated (they are O(H*W), not O(H*W*D) -- the core dominates)."""
    core = disp_sharded_disparities(mesh, cfg, disp_axis, with_arms=True)

    @jax.jit
    def fn(sbs):
        from stereo_to_multiview_tpu.models.pipeline import synthesize_views
        img_l, img_r = ops.demux_sbs(sbs)
        arms_l = ops.cross_arms(img_l, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
        arms_r = ops.cross_arms(img_r, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
        disp_l, disp_r = core(img_l, img_r, arms_l, arms_r)
        out_l, out_r = ops.dr_dcc(disp_l, disp_r, cfg.dcc_thresh,
                                  num_disp=cfg.num_disp,
                                  zero_disp=cfg.zero_disp)
        disp_l, out_l = ops.dr_irv(disp_l, out_l, arms_l, cfg.irv_thresh_s,
                                   cfg.irv_thresh_h, cfg.num_disp,
                                   cfg.zero_disp, cfg.usd,
                                   cfg.irv_iterations)
        disp_r, out_r = ops.dr_irv(disp_r, out_r, arms_r, cfg.irv_thresh_s,
                                   cfg.irv_thresh_h, cfg.num_disp,
                                   cfg.zero_disp, cfg.usd,
                                   cfg.irv_iterations)
        for_bl = (cfg.bilateral_radius, cfg.bilateral_sigma_color,
                  cfg.bilateral_sigma_spatial, cfg.num_disp)
        disp_l = ops.filter_bilateral(disp_l, *for_bl)
        disp_r = ops.filter_bilateral(disp_r, *for_bl)
        views = synthesize_views(img_l, img_r, disp_l, disp_r,
                                 cfg.replace(engine="xla"))
        interlaced = ops.mux_multiview(views, cfg.num_rows_out,
                                       cfg.num_cols_out, cfg.angle)
        return disp_l, disp_r, interlaced

    return fn
