"""Whole-frame pipelines -- the TPU analog of the reference orchestrator.

`process_frame` mirrors adcensus_stm's contract (d_io.h:32-40, d_io.cu:7-238):
SBS uint8 frame in -> (disp_l, disp_r, interlaced) out, with every stage in
one traced graph.  Where the reference cudaMallocs/frees every buffer per
frame and cudaDeviceSynchronizes between stages, here XLA owns scheduling and
memory: one compile, zero per-frame allocation chatter, fused elementwise
chains.

`process_frame_lowres` mirrors adcensus_stm_2 (d_io.cu:240-508): disparity
estimated at a reduced resolution, upscaled with value scaling, DIBR + mux at
full resolution.

Stage order (d_io.cu:43-205):
  demux_sbs -> ci_adcensus -> cross arms/aggregate (LR) -> [optional hslo]
  -> wta (LR) -> dcc -> irv x iterations (LR) -> bilateral (LR)
  -> dibr_occl -> bleed (LR) -> occl_to_mask (LR)
  -> dibr_dbm per intermediate view -> mux_multiview
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from stereo_to_multiview_tpu.config import PipelineConfig
from stereo_to_multiview_tpu import ops

F32 = jnp.float32


# When True, Pallas kernels lower to real Mosaic even on the CPU backend
# (chipless AOT compile checks, scripts/aot_check.py); never set in a
# graph that will actually execute on CPU.
FORCE_MOSAIC = False


def _use_band(cfg: PipelineConfig) -> bool:
    """Resolve the engine choice at trace time.  'auto' uses the banded-MXU
    Pallas kernels on TPU only: CPU runs the pure-XLA path (interpret-mode
    kernels would be slow and the pjit partitioner needs a plain-HLO
    graph), and other accelerators (GPU) cannot lower Mosaic kernels."""
    if cfg.engine == "band":
        return True
    if cfg.engine == "xla":
        return False
    return jax.default_backend() == "tpu"


def xla_quant_costs(cost_l, cost_r, cfg: PipelineConfig):
    """cfg.xla_agg_qscale > 0: integer-quantize the cost volumes so the
    XLA engine's cumsum aggregation is exact -- and therefore
    bit-deterministic under any halo sharding (the exactness harness for
    parallel.halo; see tests/test_halo.py).  Every cumsum prefix must
    stay f32-exact (< 2^24) at this geometry, checked here at trace
    time.  qscale 0 returns the costs untouched (reference-parity f32)."""
    if cfg.xla_agg_qscale <= 0:
        return cost_l, cost_r
    wmax = 2 * cfg.usd + 1
    v = 2.0 * cfg.xla_agg_qscale              # cost <= 2
    hh, ww = cfg.num_rows + 2 * 64, cfg.num_cols + 2 * 64
    for axis_len in (ww, hh, hh, ww):         # H,V,V,H pass prefixes
        if v * axis_len >= 2.0 ** 24:
            raise ValueError("xla_agg_qscale too large for exact integer "
                             "aggregation at this geometry")
        v = v * wmax
    q = lambda c: jnp.rint(c * F32(cfg.xla_agg_qscale))
    return q(cost_l), q(cost_r)


def compute_disparities(img_l: jnp.ndarray, img_r: jnp.ndarray,
                        cfg: PipelineConfig):
    """Stereo matching half of the pipeline: images -> refined (disp_l,
    disp_r) float32 plus the outlier labels (debug/metrics surface)."""
    from stereo_to_multiview_tpu.utils.profiling import stage_scope
    band = _use_band(cfg)
    interpret = jax.default_backend() == "cpu" and not FORCE_MOSAIC

    with stage_scope("ca_cross_arms"):
        if band and cfg.usd <= 64:
            from stereo_to_multiview_tpu.ops.postkern import (
                cross_arms_kern_lr)
            arms_l, arms_r = cross_arms_kern_lr(
                img_l, img_r, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd,
                interpret=interpret)
        else:
            arms_l = ops.cross_arms(img_l, cfg.ucd, cfg.lcd, cfg.usd,
                                    cfg.lsd)
            arms_r = ops.cross_arms(img_r, cfg.ucd, cfg.lcd, cfg.usd,
                                    cfg.lsd)

    if band:
        from stereo_to_multiview_tpu.ops.band import band_stereo_core_chunked
        with stage_scope("stereo_core"):
            # cost init + aggregation + WTA, streamed over row chunks so
            # the (H, W, D) volume never fully materializes in HBM
            disp_l, disp_r = band_stereo_core_chunked(
                img_l, img_r, arms_l, arms_r, cfg, interpret)
    else:
        cost_l, cost_r = ops.ci_adcensus(
            img_l, img_r, cfg.ad_coeff, cfg.census_coeff,
            cfg.num_disp, cfg.zero_disp)                     # (D, H, W)
        cost_l, cost_r = xla_quant_costs(cost_l, cost_r, cfg)
        acost_l = ops.cross_aggregate(cost_l, arms_l, max_arm=cfg.usd)
        acost_r = ops.cross_aggregate(cost_r, arms_r, max_arm=cfg.usd)

        if cfg.use_hslo:
            # quantized costs (xla_agg_qscale) scale the aggregate's
            # units; the DP penalties must scale with them
            kq = cfg.xla_agg_qscale if cfg.xla_agg_qscale > 0 else 1.0
            gray_l = ops.mux_average(img_l)
            gray_r = ops.mux_average(img_r)
            acost_l = ops.dc_hslo(acost_l, gray_l, gray_r, cfg.num_disp,
                                  cfg.zero_disp, cfg.hslo_T,
                                  cfg.hslo_H1 * kq, cfg.hslo_H2 * kq,
                                  sign=+1)
            acost_r = ops.dc_hslo(acost_r, gray_l, gray_r, cfg.num_disp,
                                  cfg.zero_disp, cfg.hslo_T,
                                  cfg.hslo_H1 * kq, cfg.hslo_H2 * kq,
                                  sign=-1)

        disp_l = ops.dc_wta(acost_l, cfg.zero_disp)
        disp_r = ops.dc_wta(acost_r, cfg.zero_disp)

    with stage_scope("dr_dcc"):
        if band:
            from stereo_to_multiview_tpu.ops.postkern import dcc_occl_kern
            out_l, out_r = dcc_occl_kern(disp_l, disp_r, cfg.dcc_thresh,
                                         with_labels=True,
                                         num_disp=cfg.num_disp,
                                         zero_disp=cfg.zero_disp,
                                         interpret=interpret)
        else:
            out_l, out_r = ops.dr_dcc(disp_l, disp_r, cfg.dcc_thresh,
                                      num_disp=cfg.num_disp,
                                      zero_disp=cfg.zero_disp)
    with stage_scope("dr_irv"):
        if band:
            from stereo_to_multiview_tpu.ops.band import dr_irv_band_chunked
            ((disp_l, out_l),
             (disp_r, out_r)) = dr_irv_band_chunked(
                disp_l, out_l, disp_r, out_r, arms_l, arms_r, cfg,
                interpret)
        else:
            disp_l, out_l = ops.dr_irv(disp_l, out_l, arms_l,
                                       cfg.irv_thresh_s, cfg.irv_thresh_h,
                                       cfg.num_disp, cfg.zero_disp,
                                       cfg.usd, cfg.irv_iterations)
            disp_r, out_r = ops.dr_irv(disp_r, out_r, arms_r,
                                       cfg.irv_thresh_s, cfg.irv_thresh_h,
                                       cfg.num_disp, cfg.zero_disp,
                                       cfg.usd, cfg.irv_iterations)

    if cfg.use_median:
        # reference call site: between IRV and the bilateral filter
        # (image_io.cpp:239-240, commented on the live path)
        with stage_scope("filter_median"):
            disp_l = ops.filter_median(disp_l)
            disp_r = ops.filter_median(disp_r)

    with stage_scope("filter_bilateral"):
        if band and cfg.bilateral_radius <= 8:
            # one kernel for both eyes (edge-replicated seam spacer)
            from stereo_to_multiview_tpu.ops.postkern import (
                filter_bilateral_kern_lr)
            disp_l, disp_r = filter_bilateral_kern_lr(
                disp_l, disp_r, cfg.bilateral_radius,
                cfg.bilateral_sigma_color, cfg.bilateral_sigma_spatial,
                cfg.num_disp, interpret)
        else:
            blf = lambda d: ops.filter_bilateral(
                d, cfg.bilateral_radius, cfg.bilateral_sigma_color,
                cfg.bilateral_sigma_spatial, cfg.num_disp)
            disp_l = blf(disp_l)
            disp_r = blf(disp_r)
    return disp_l, disp_r, out_l, out_r


def synth_disp_bounds(cfg: PipelineConfig):
    """(num_disp, zero_disp) bounds covering the disparity VALUES the
    synthesis stages see.  On the full-res path these are the config's
    own; on the lowres path the upscaled disparities were multiplied by
    1/disp_scale (d_io.cu:415-417), so the bounds scale with them --
    passing the unscaled bounds would silently drop occlusion writers
    and warp samples beyond the unscaled reach (ADVICE r3)."""
    import math
    if not cfg.lowres or cfg.disp_scale == 1.0:
        return cfg.num_disp, cfg.zero_disp
    inv = 1.0 / cfg.disp_scale
    zd = int(math.ceil(cfg.zero_disp * inv))
    top = int(math.floor((cfg.num_disp - 1 - cfg.zero_disp) * inv))
    return zd + top + 1, zd


def synthesize_views(img_l, img_r, disp_l, disp_r, cfg: PipelineConfig):
    """DIBR half: images + disparities -> (V, H, W, 3) view stack.

    View 0 = right source, view V-1 = left source (d_io.cu:182-183);
    intermediate view v uses shift = 1 - v/(V-1) (d_io.cu:189).  The
    feathered blend mask is shift-independent and computed once (the
    reference recomputes it per view); the V-2 intermediate warps unroll as
    a static Python loop so each view's select-shift warp gets the tightest
    offset bound for its shift (V is small and static).

    Disparity-value bounds come from synth_disp_bounds(cfg): on the
    lowres path the upscaled disparity values exceed cfg.num_disp/
    zero_disp by the 1/disp_scale factor.
    """
    from stereo_to_multiview_tpu.ops.dibr import dibr_backward_warp
    from stereo_to_multiview_tpu.ops.mux import mux_merge_ab
    from stereo_to_multiview_tpu.utils.profiling import stage_scope

    band = _use_band(cfg)
    interpret = jax.default_backend() == "cpu" and not FORCE_MOSAIC
    nd_s, zd_s = synth_disp_bounds(cfg)
    with stage_scope("dibr_occl"):
        if band:
            from stereo_to_multiview_tpu.ops.postkern import dcc_occl_kern
            occl_l, occl_r = dcc_occl_kern(disp_l, disp_r,
                                           with_labels=False,
                                           num_disp=nd_s,
                                           zero_disp=zd_s,
                                           interpret=interpret)
        else:
            occl_l, occl_r = ops.dibr_occl(disp_l, disp_r,
                                           num_disp=nd_s,
                                           zero_disp=zd_s)
        if band and cfg.bleed_radius == 1:
            from stereo_to_multiview_tpu.ops.postkern import (
                filter_bleed_mask_kern)
            mask_l, mask_r = filter_bleed_mask_kern(
                occl_l, occl_r, cfg.bleed_radius, interpret)
        else:
            mask_l = ops.dibr_occl_to_mask(
                ops.filter_bleed(occl_l, cfg.bleed_radius))
            mask_r = ops.dibr_occl_to_mask(
                ops.filter_bleed(occl_r, cfg.bleed_radius))

    with stage_scope("dibr_feather"):
        feathered = ops.dibr.dibr_feather_mask(
            mask_r, cfg.feather_radius, cfg.feather_sigma)

    v = cfg.num_views
    mids = []
    with stage_scope("dibr_dbm"):
        # f32 arithmetic like the reference's float expression
        # (d_io.cu:189) -- also keeps the traced-shift sharded
        # synthesizer bit-identical
        shifts = _synth_shifts(v)
        if band and shifts:
            # one x-major kernel for every intermediate view, with
            # data-adaptive per-view offset loops; the mask multiply and
            # truncating merge run in its transposed (W, H) domain and
            # only the merged u8 views transpose back (~40x less data
            # than the warp volumes)
            from stereo_to_multiview_tpu.ops.warpkern import (
                dibr_warp_views_kern_xm)
            va, vb = dibr_warp_views_kern_xm(img_l, img_r, disp_l, disp_r,
                                             shifts, nd_s, zd_s, interpret)
            mrt = mask_r.T[:, :, None]
            mlt = mask_l.T[:, :, None]
            ft = feathered.T
            for j in range(len(shifts)):
                view_from_l = (va[j] * mrt).astype(jnp.uint8)
                view_from_r = (vb[j] * mlt).astype(jnp.uint8)
                mids.append(jnp.swapaxes(
                    mux_merge_ab(view_from_l, view_from_r, ft), 0, 1))
        else:
            for shift in shifts:
                view_from_l = dibr_backward_warp(
                    img_l, mask_r, disp_r, -shift, nd_s, zd_s)
                view_from_r = dibr_backward_warp(
                    img_r, mask_l, disp_l, 1.0 - shift, nd_s, zd_s)
                mids.append(mux_merge_ab(view_from_l, view_from_r,
                                         feathered))

    if v > 2:
        views = jnp.stack([img_r] + mids + [img_l])
    else:
        views = jnp.stack([img_r, img_l])
    return views


def _synth_shifts(v: int):
    """Intermediate-view fractions, f32 like the reference's expression
    (d_io.cu:189)."""
    import numpy as np
    return tuple(float(np.float32(1.0)
                       - np.float32(v_i) / np.float32(v - 1.0))
                 for v_i in range(1, v - 1))


def synthesize_interlace(img_l, img_r, disp_l, disp_r, cfg: PipelineConfig):
    """views synthesis + lenticular interlace, fused.  On the band engine
    at identity output resolution the whole chain runs in the warp
    kernel's TRANSPOSED (W, H) domain -- occlusion hits, bleed masks and
    the feather never relayout, the mask multiply and truncating merge
    run inside the warp kernel (u8 outputs, ~16x less view traffic), and
    the interlace selects transposed; ONE final u8 transpose restores the
    natural orientation.  Values are bit-identical to
    mux_multiview(synthesize_views(...)) (same op order everywhere; the
    transposed feather preserves the natural accumulation order).
    Falls back to the unfused pair otherwise."""
    from stereo_to_multiview_tpu.utils.profiling import stage_scope

    band = _use_band(cfg)
    h, w = img_l.shape[:2]
    v = cfg.num_views
    fused = (band and v > 2 and cfg.bleed_radius == 1
             and (cfg.num_rows_out, cfg.num_cols_out) == (h, w))
    if not fused:
        views = synthesize_views(img_l, img_r, disp_l, disp_r, cfg)
        return ops.mux_multiview(views, cfg.num_rows_out,
                                 cfg.num_cols_out, cfg.angle)

    from stereo_to_multiview_tpu.ops.postkern import (
        dcc_occl_kern, filter_bleed_mask_kern)
    from stereo_to_multiview_tpu.ops.filters import filter_gaussian_lift_t
    from stereo_to_multiview_tpu.ops.warpkern import (
        dibr_warp_merge_views_kern_xm)
    from stereo_to_multiview_tpu.ops.mux import mux_multiview_t
    from stereo_to_multiview_tpu.ops.dibr import op_invertnormf

    interpret = jax.default_backend() == "cpu" and not FORCE_MOSAIC
    nd_s, zd_s = synth_disp_bounds(cfg)
    with stage_scope("dibr_occl"):
        occl_l_t, occl_r_t = dcc_occl_kern(
            disp_l, disp_r, with_labels=False, num_disp=nd_s,
            zero_disp=zd_s, transposed=True, interpret=interpret)
        mask_l_t, mask_r_t = filter_bleed_mask_kern(
            occl_l_t, occl_r_t, cfg.bleed_radius, interpret)
    with stage_scope("dibr_feather"):
        feathered_t = filter_gaussian_lift_t(
            op_invertnormf(mask_r_t), cfg.feather_radius, cfg.feather_sigma)
    with stage_scope("dibr_dbm"):
        merged_t = dibr_warp_merge_views_kern_xm(
            img_l, img_r, disp_l, disp_r, mask_l_t, mask_r_t, feathered_t,
            _synth_shifts(v), nd_s, zd_s, interpret)      # (nv, W, H, 3) u8
    with stage_scope("mux_multiview"):
        views_t = jnp.concatenate(
            [jnp.swapaxes(img_r, 0, 1)[None], merged_t,
             jnp.swapaxes(img_l, 0, 1)[None]], axis=0)
        return jnp.swapaxes(mux_multiview_t(views_t, cfg.angle), 0, 1)


def make_process_frame(cfg: PipelineConfig, lowres: bool = False):
    """Build the jitted SBS -> (disp_l, disp_r, interlaced) function."""

    def fn(sbs: jnp.ndarray):
        img_l, img_r = ops.demux_sbs(sbs)

        if lowres:
            lo_l = ops.tx_scale_bilinear(img_l, cfg.num_rows_disp,
                                         cfg.num_cols_disp)
            lo_r = ops.tx_scale_bilinear(img_r, cfg.num_rows_disp,
                                         cfg.num_cols_disp)
            dl, dr, _, _ = compute_disparities(lo_l, lo_r, cfg)
            disp_l = ops.tx_disp_scale(dl, cfg.num_rows, cfg.num_cols,
                                       1.0 / cfg.disp_scale)
            disp_r = ops.tx_disp_scale(dr, cfg.num_rows, cfg.num_cols,
                                       1.0 / cfg.disp_scale)
        else:
            disp_l, disp_r, _, _ = compute_disparities(img_l, img_r, cfg)

        interlaced = synthesize_interlace(img_l, img_r, disp_l, disp_r, cfg)
        return disp_l, disp_r, interlaced

    return jax.jit(fn)


@functools.partial(jax.jit, static_argnames=("cfg",))
def process_frame(sbs: jnp.ndarray, cfg: PipelineConfig) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """adcensus_stm analog: (H, 2W, 3) uint8 SBS -> (disp_l, disp_r,
    interlaced).  cfg is static; one compiled graph per config."""
    img_l, img_r = ops.demux_sbs(sbs)
    disp_l, disp_r, _, _ = compute_disparities(img_l, img_r, cfg)
    interlaced = synthesize_interlace(img_l, img_r, disp_l, disp_r, cfg)
    return disp_l, disp_r, interlaced


@functools.partial(jax.jit, static_argnames=("cfg",))
def process_frame_lowres(sbs: jnp.ndarray, cfg: PipelineConfig):
    """adcensus_stm_2 analog (d_io.cu:240-508): disparity at
    (num_rows_disp, num_cols_disp), upscaled by 1/disp_scale, full-res DIBR."""
    if not cfg.lowres:
        raise ValueError("cfg must set num_rows_disp/num_cols_disp")
    img_l, img_r = ops.demux_sbs(sbs)
    lo_l = ops.tx_scale_bilinear(img_l, cfg.num_rows_disp, cfg.num_cols_disp)
    lo_r = ops.tx_scale_bilinear(img_r, cfg.num_rows_disp, cfg.num_cols_disp)
    dl, dr, _, _ = compute_disparities(lo_l, lo_r, cfg)
    disp_l = ops.tx_disp_scale(dl, cfg.num_rows, cfg.num_cols,
                               1.0 / cfg.disp_scale)
    disp_r = ops.tx_disp_scale(dr, cfg.num_rows, cfg.num_cols,
                               1.0 / cfg.disp_scale)
    interlaced = synthesize_interlace(img_l, img_r, disp_l, disp_r, cfg)
    return disp_l, disp_r, interlaced
