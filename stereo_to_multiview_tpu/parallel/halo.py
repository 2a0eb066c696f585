"""Explicit halo-exchange sharding: shard_map + lax.ppermute over ICI.

Strategy B (SURVEY.md section 2.5/7): shard the frame's row axis across
the mesh and exchange exactly the stencil halos each stage needs, instead
of trusting the pjit partitioner (Strategy A, parallel.sharded).  This
bounds communication to the true halo widths and -- crucially -- runs the
Pallas banded-MXU kernels per shard (a pallas_call inside shard_map is a
plain per-device call; the pjit partitioner cannot split one).

Halo widths (all verified against the stage stencils):
  image           3*usd        arms need +-usd of every cost row; cost /
                               pass1 rows +-2*usd feed the two V passes
                               (census's +-3 fits inside for usd >= 3)
  IRV per iter    usd          histogram V span, re-exchanged per round
  bilateral       radius
  bleed           radius       (with the reference's quirky edge rule)
  feather         radius       (clamp)
  mux             0            row-local, but needs the global row index
                               for the lenticular phase (out res == in res)

Global-border semantics: ppermute fills outermost halos with zeros; they
are then overwritten per edge mode (clamp replication, the bleed mirror
quirk) so every stage sees exactly the borders the unsharded op computes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_to_multiview_tpu.config import PipelineConfig
from stereo_to_multiview_tpu import ops

F32 = jnp.float32


def _neighbor_perms(n):
    up = [(i, i - 1) for i in range(1, n)]      # send to previous shard
    down = [(i, i + 1) for i in range(n - 1)]   # send to next shard
    return up, down


def halo_exchange(x: jnp.ndarray, lo: int, hi: int, axis_size: int,
                  axis_name: str = "row",
                  edge: str = "clamp") -> jnp.ndarray:
    """Extend the local row shard with `lo` rows from the previous shard
    and `hi` rows from the next (axis 0).  `axis_size` is the static mesh
    extent of `axis_name`.  Outermost shards fill their missing halo per
    `edge`:
      "clamp"  -- replicate the true border row (reference clamp-to-edge)
      "zero"   -- zeros
      "bleed"  -- the reference bleed filter's quirky rule
                  (d_filter.cu:124-127): above-top row -off mirrors to
                  row +off; below-bottom maps to row n-1-off.  Exact for
                  radius 1 (the live-path value); for radius > 1 readers
                  other than the border row see clamp-like rows at the
                  two global frame edges.
    """
    n = axis_size
    idx = jax.lax.axis_index(axis_name)
    up, down = _neighbor_perms(n)

    parts = []
    if lo > 0:
        from_prev = jax.lax.ppermute(x[-lo:], axis_name, down)
        if edge == "clamp":
            fill = jnp.broadcast_to(x[:1], from_prev.shape)
        elif edge == "bleed":
            # rows -lo..-1 mirror to rows lo..1
            fill = x[1:lo + 1][::-1]
        else:
            fill = jnp.zeros_like(from_prev)
        parts.append(jnp.where(idx == 0, fill, from_prev))
    parts.append(x)
    if hi > 0:
        from_next = jax.lax.ppermute(x[:hi], axis_name, up)
        if edge == "clamp":
            fill = jnp.broadcast_to(x[-1:], from_next.shape)
        elif edge == "bleed":
            # rows n..n+hi-1 read row n-1-off, off = 1..hi
            fill = x[-2:-hi - 2:-1] if hi > 1 else x[-2:-1]
        else:
            fill = jnp.zeros_like(from_next)
        parts.append(jnp.where(idx == n - 1, fill, from_next))
    return jnp.concatenate(parts, axis=0)


def _halo_filter(fn, x, radius, axis_size, axis_name, edge="clamp"):
    """Run a row-stencil filter of vertical reach `radius` on a shard:
    exchange, apply, crop."""
    ext = halo_exchange(x, radius, radius, axis_size, axis_name, edge=edge)
    out = fn(ext)
    return out[radius:ext.shape[0] - radius]


def halo_process_frame(mesh: Mesh, cfg: PipelineConfig,
                       row_axis: str = "row",
                       view_axis: str | None = None):
    """Jitted SBS -> (disp_l, disp_r, interlaced), row-sharded over the
    mesh with explicit halo exchanges.  Requires out res == in res (the
    interlace is then row-local) and num_rows divisible by the mesh size.

    With `view_axis` set (a second mesh axis), the DIBR view fan-out is
    additionally sharded: each device synthesizes num_views/n_view of
    the views for its rows and contributes a partial interlace; one psum
    over the view axis assembles the frame (each output subpixel samples
    exactly one view, so partials are disjoint).  The stereo half is
    replicated along the view axis -- this axis pays off when V is large
    (e.g. the 4K 16-view config).

    Matches the single-device pipeline's outputs except where a halo
    window would cross a shard AND the engine differs; with the same
    engine the stages are exact by construction (halos cover every
    stencil; global borders are reproduced per edge mode).
    """
    resample = ((cfg.num_rows_out, cfg.num_cols_out)
                != (cfg.num_rows, cfg.num_cols))
    if resample and view_axis is not None:
        raise ValueError("resampled-output interlace is row-sharded only; "
                         "drop the view axis or use identity resolution")
    n_dev = mesh.shape[row_axis]
    n_view = mesh.shape[view_axis] if view_axis else 1
    if cfg.num_rows % n_dev:
        raise ValueError(f"num_rows {cfg.num_rows} not divisible by "
                         f"mesh axis {n_dev}")
    if cfg.num_views % n_view:
        raise ValueError(f"num_views {cfg.num_views} not divisible by "
                         f"view axis {n_view}")
    rows_loc = cfg.num_rows // n_dev

    # --- resampled-output interlace (d_mux_multiview.cu:57-82): the
    # output rows of shard i bilinearly sample input rows that sit inside
    # shard i's input rows up to a tiny, statically-computable halo
    # (sampling is y*h_in/h_out, so output and input shards stay aligned
    # to within the lerp's 1-row reach).  Exchange exactly that halo of
    # the synthesized views, then resample with the shard's slice of the
    # global bilinear weight matrix -- each output row still sums the
    # same two adjacent input rows in the same order, so the interlace
    # is bit-identical to the unsharded mux_multiview.
    if resample:
        import numpy as np
        from stereo_to_multiview_tpu.ops.mux import _resample_mats
        if cfg.num_rows_out % n_dev:
            raise ValueError(f"num_rows_out {cfg.num_rows_out} not "
                             f"divisible by mesh axis {n_dev}")
        ho_loc = cfg.num_rows_out // n_dev
        my0, my1, wy_out = _resample_mats(cfg.num_rows_out, cfg.num_rows)
        mx_mats = _resample_mats(cfg.num_cols_out, cfg.num_cols)
        y0 = my0.argmax(axis=0)
        y1 = my1.argmax(axis=0)
        rs_lo = rs_hi = 0
        for i in range(n_dev):
            sl = slice(i * ho_loc, (i + 1) * ho_loc)
            rs_lo = max(rs_lo, i * rows_loc - int(y0[sl].min()))
            rs_hi = max(rs_hi, int(y1[sl].max()) - ((i + 1) * rows_loc - 1))
        rs_lo, rs_hi = max(rs_lo, 0), max(rs_hi, 0)
        if max(rs_lo, rs_hi) > rows_loc:
            raise ValueError("resample halo exceeds the shard height; "
                             "use fewer devices or parallel.sharded")
        # global (h_in, h_out) one-hot row selects, zero-padded so shard
        # i's row window [i*rows_loc - rs_lo, (i+1)*rows_loc + rs_hi)
        # slices at the in-bounds offset i*rows_loc
        def _pad_rows(m):
            p = np.zeros((cfg.num_rows + rs_lo + rs_hi,
                          cfg.num_rows_out), np.float32)
            p[rs_lo:rs_lo + cfg.num_rows] = m
            return p
        my0_pad, my1_pad = _pad_rows(my0), _pad_rows(my1)

    usd = cfg.usd
    h_img = 3 * usd            # image halo for arms+cost+2 V passes
    max_halo = max(h_img, cfg.bilateral_radius, cfg.feather_radius,
                   cfg.bleed_radius)
    if rows_loc < max_halo:
        raise ValueError(
            f"shard height {rows_loc} smaller than the largest halo "
            f"{max_halo}; use fewer devices or a taller frame")
    from stereo_to_multiview_tpu.models.pipeline import _use_band
    if _use_band(cfg) and usd > 64:
        raise ValueError("band engine requires usd <= 64 (256-wide kernel "
                         "windows); set engine='xla' for larger arms")

    def shard_fn(sbs):
        axis = row_axis
        idx = jax.lax.axis_index(axis)
        row0 = idx * rows_loc                    # global first row (traced)

        img_l, img_r = ops.demux_sbs(sbs)
        ext_l = halo_exchange(img_l, h_img, h_img, n_dev, axis)
        ext_r = halo_exchange(img_r, h_img, h_img, n_dev, axis)
        ext_row0 = row0 - h_img

        # --- stereo half on the extended domain ---
        from stereo_to_multiview_tpu.models.pipeline import _use_band
        band = _use_band(cfg)
        from stereo_to_multiview_tpu.models import pipeline as _pl
        interpret = (jax.default_backend() == "cpu"
                     and not _pl.FORCE_MOSAIC)
        if band:
            from stereo_to_multiview_tpu.ops.postkern import (
                cross_arms_kern_lr)
            arms_l, arms_r = cross_arms_kern_lr(
                ext_l, ext_r, cfg.ucd, cfg.lcd, usd, cfg.lsd,
                row_offset=ext_row0, global_h=cfg.num_rows,
                interpret=interpret)
        else:
            arms_l = ops.cross_arms(ext_l, cfg.ucd, cfg.lcd, usd, cfg.lsd,
                                    row_offset=ext_row0,
                                    global_h=cfg.num_rows)
            arms_r = ops.cross_arms(ext_r, cfg.ucd, cfg.lcd, usd, cfg.lsd,
                                    row_offset=ext_row0,
                                    global_h=cfg.num_rows)
        if band:
            # Same Pallas kernels + quantized integer aggregation as the
            # single-device band engine (ops.band.band_stereo_core_chunked)
            # run per shard on the extended domain.  Exact integer sums
            # make the result bit-identical to the unsharded run: the
            # shard origin only regroups accumulations.
            from stereo_to_multiview_tpu.ops.band import (
                band_stereo_core_chunked)
            disp_l, disp_r = band_stereo_core_chunked(
                ext_l, ext_r, arms_l, arms_r, cfg, interpret)
        else:
            from stereo_to_multiview_tpu.models.pipeline import (
                xla_quant_costs)
            cost_l, cost_r = ops.ci_adcensus(
                ext_l, ext_r, cfg.ad_coeff, cfg.census_coeff,
                cfg.num_disp, cfg.zero_disp)
            cost_l, cost_r = xla_quant_costs(cost_l, cost_r, cfg)
            acost_l = ops.cross_aggregate(cost_l, arms_l, max_arm=usd)
            acost_r = ops.cross_aggregate(cost_r, arms_r, max_arm=usd)
            if cfg.use_hslo:
                # rows are DP-independent: the extended shard's rows get
                # full-width scans, bit-identical to the unsharded graph
                kq = (cfg.xla_agg_qscale if cfg.xla_agg_qscale > 0
                      else 1.0)
                gl = ops.mux_average(ext_l)
                gr = ops.mux_average(ext_r)
                acost_l = ops.dc_hslo(acost_l, gl, gr, cfg.num_disp,
                                      cfg.zero_disp, cfg.hslo_T,
                                      cfg.hslo_H1 * kq, cfg.hslo_H2 * kq,
                                      sign=+1)
                acost_r = ops.dc_hslo(acost_r, gl, gr, cfg.num_disp,
                                      cfg.zero_disp, cfg.hslo_T,
                                      cfg.hslo_H1 * kq, cfg.hslo_H2 * kq,
                                      sign=-1)
            disp_l = ops.dc_wta(acost_l, cfg.zero_disp)
            disp_r = ops.dc_wta(acost_r, cfg.zero_disp)

        # crop to the local rows; arms cropped for IRV
        sl = slice(h_img, h_img + rows_loc)
        disp_l, disp_r = disp_l[sl], disp_r[sl]

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

        # --- IRV: exchange disp/outlier halos every iteration ---
        arms_l_irv = arms_l[:, h_img - usd:h_img + rows_loc + usd]
        arms_r_irv = arms_r[:, h_img - usd:h_img + rows_loc + usd]

        def irv(disp, outl, arms):
            irv_fn = (_irv_band_iter if band else _irv_xla_iter)
            for _ in range(cfg.irv_iterations):
                dx = halo_exchange(disp, usd, usd, n_dev, axis, edge="zero")
                ox = halo_exchange(outl, usd, usd, n_dev, axis, edge="zero")
                # zero-filled outlier halo rows are label 0 = "reliable",
                # but their disp is 0 too; mark them outliers so they
                # never vote: outside the image there are no pixels.
                rows_ext = jnp.arange(rows_loc + 2 * usd) - usd \
                    + idx * rows_loc
                valid = ((rows_ext >= 0)
                         & (rows_ext < cfg.num_rows))[:, None]
                ox = jnp.where(valid, ox, jnp.uint8(1))
                dx, ox = irv_fn(dx, ox, arms, cfg, interpret)
                disp = dx[usd:usd + rows_loc]
                outl = ox[usd:usd + rows_loc]
            return disp, outl

        disp_l, out_l = irv(disp_l, out_l, arms_l_irv)
        disp_r, out_r = irv(disp_r, out_r, arms_r_irv)

        # --- bilateral ---
        rb = cfg.bilateral_radius
        if band and rb <= 8:
            from stereo_to_multiview_tpu.ops.postkern import (
                filter_bilateral_kern)
            blf = lambda d: filter_bilateral_kern(
                d, rb, cfg.bilateral_sigma_color,
                cfg.bilateral_sigma_spatial, cfg.num_disp, interpret)
        else:
            blf = lambda d: ops.filter_bilateral(
                d, rb, cfg.bilateral_sigma_color,
                cfg.bilateral_sigma_spatial, cfg.num_disp)
        disp_l = _halo_filter(blf, disp_l, rb, n_dev, axis)
        disp_r = _halo_filter(blf, disp_r, rb, n_dev, axis)

        # --- view synthesis (occl/warps horizontal; bleed+feather need
        # small vertical halos) ---
        if band:
            from stereo_to_multiview_tpu.ops.postkern import dcc_occl_kern
            occl_l, occl_r = dcc_occl_kern(disp_l, disp_r,
                                           with_labels=False,
                                           num_disp=cfg.num_disp,
                                           zero_disp=cfg.zero_disp,
                                           interpret=interpret)
        else:
            occl_l, occl_r = ops.dibr_occl(disp_l, disp_r,
                                           num_disp=cfg.num_disp,
                                           zero_disp=cfg.zero_disp)
        bld = lambda m: ops.filter_bleed(m, cfg.bleed_radius)
        occl_l = _halo_filter(bld, occl_l, cfg.bleed_radius, n_dev, axis,
                              edge="bleed")
        occl_r = _halo_filter(bld, occl_r, cfg.bleed_radius, n_dev, axis,
                              edge="bleed")
        mask_l = ops.dibr_occl_to_mask(occl_l)
        mask_r = ops.dibr_occl_to_mask(occl_r)

        fr = cfg.feather_radius
        fth = lambda m: ops.dibr.dibr_feather_mask(m, fr, cfg.feather_sigma)
        feathered = _halo_filter(fth, mask_r, fr, n_dev, axis)

        from stereo_to_multiview_tpu.ops.dibr import (dibr_backward_warp,
                                                      dibr_backward_warp_dyn)
        from stereo_to_multiview_tpu.ops.mux import (mux_merge_ab,
                                                     mux_multiview_rows,
                                                     mux_view_pattern)
        v = cfg.num_views
        if view_axis is None:
            import numpy as np
            shifts = tuple(float(np.float32(1.0)
                                 - np.float32(v_i) / np.float32(v - 1.0))
                           for v_i in range(1, v - 1))
            mids = []
            if band and shifts:
                # the SAME x-major kernel + transposed merge the
                # single-device pipeline runs: the warp lerp's FMA
                # contraction is compilation-context-dependent, so
                # bit-exactness vs process_frame requires the identical
                # kernel, not an ulp-compatible twin
                from stereo_to_multiview_tpu.ops.warpkern import (
                    dibr_warp_views_kern_xm)
                va, vb = dibr_warp_views_kern_xm(
                    img_l, img_r, disp_l, disp_r, shifts,
                    cfg.num_disp, cfg.zero_disp, interpret)
                mrt = mask_r.T[:, :, None]
                mlt = mask_l.T[:, :, None]
                ft = feathered.T
                for j in range(len(shifts)):
                    a = (va[j] * mrt).astype(jnp.uint8)
                    b = (vb[j] * mlt).astype(jnp.uint8)
                    mids.append(jnp.swapaxes(
                        mux_merge_ab(a, b, ft), 0, 1))
            else:
                for shift in shifts:
                    a = dibr_backward_warp(img_l, mask_r, disp_r, -shift,
                                           cfg.num_disp, cfg.zero_disp)
                    b = dibr_backward_warp(img_r, mask_l, disp_l,
                                           1.0 - shift,
                                           cfg.num_disp, cfg.zero_disp)
                    mids.append(mux_merge_ab(a, b, feathered))
            views = (jnp.stack([img_r] + mids + [img_l]) if v > 2
                     else jnp.stack([img_r, img_l]))
            if not resample:
                interlaced = mux_multiview_rows(views, cfg.angle, row0)
                return disp_l, disp_r, interlaced

            # resampled interlace: exchange the statically-computed
            # view-row halo, resample with the shard's slice of the
            # padded one-hot selects + elementwise lerps (the exact
            # computation ops.mux.resample_views_f32 runs unsharded --
            # one-hot dots are blocking-independent, so bit-exact), then
            # the V-way select at the GLOBAL output row phase
            from stereo_to_multiview_tpu.ops.mux import resample_views_f32
            vr = jnp.moveaxis(views, 1, 0)       # (rows, V, W, 3)
            if rs_lo or rs_hi:
                vr = halo_exchange(vr, rs_lo, rs_hi, n_dev, axis,
                                   edge="zero")  # zero-weight rows
            ext_v = jnp.moveaxis(vr, 0, 1).astype(F32)
            hsz = rows_loc + rs_lo + rs_hi
            my0_loc = jax.lax.dynamic_slice(
                jnp.asarray(my0_pad), (idx * rows_loc, idx * ho_loc),
                (hsz, ho_loc))
            my1_loc = jax.lax.dynamic_slice(
                jnp.asarray(my1_pad), (idx * rows_loc, idx * ho_loc),
                (hsz, ho_loc))
            wy_loc = jax.lax.dynamic_slice(
                jnp.asarray(wy_out), (idx * ho_loc,), (ho_loc,))
            sampled = resample_views_f32(
                ext_v, my0_loc, my1_loc, wy_loc,
                *mx_mats).astype(jnp.uint8)
            ty_out = jnp.arange(ho_loc) + idx * ho_loc
            pattern = mux_view_pattern(v, ho_loc, cfg.num_cols_out,
                                       cfg.angle, ty_out)
            interlaced = jnp.zeros((ho_loc, cfg.num_cols_out, 3),
                                   jnp.uint8)
            for vi in range(v):
                interlaced = jnp.where(pattern == vi, sampled[vi],
                                       interlaced)
            return disp_l, disp_r, interlaced

        # view-axis fan-out: this device synthesizes views
        # [v_idx*vloc, (v_idx+1)*vloc) for its rows, builds the partial
        # interlace, and one psum assembles the frame.
        vloc = v // n_view
        v_idx = jax.lax.axis_index(view_axis)
        ty = jnp.arange(rows_loc) + row0
        pattern = mux_view_pattern(v, rows_loc, cfg.num_cols, cfg.angle, ty)
        partial = jnp.zeros((rows_loc, cfg.num_cols, 3), jnp.int32)
        for j in range(vloc):
            vg = v_idx * vloc + j                       # traced view id
            shift = (F32(1.0)
                     - vg.astype(F32) / F32(v - 1.0))   # d_io.cu:189
            a = dibr_backward_warp_dyn(img_l, mask_r, disp_r, -shift,
                                       cfg.num_disp, cfg.zero_disp)
            b = dibr_backward_warp_dyn(img_r, mask_l, disp_l,
                                       F32(1.0) - shift,
                                       cfg.num_disp, cfg.zero_disp)
            merged = mux_merge_ab(a, b, feathered)
            view = jnp.where(vg == 0, img_r,
                             jnp.where(vg == v - 1, img_l, merged))
            partial = partial + jnp.where(pattern == vg,
                                          view.astype(jnp.int32), 0)
        interlaced = jax.lax.psum(partial, view_axis).astype(jnp.uint8)
        return disp_l, disp_r, interlaced

    from jax import shard_map
    spec3 = P(row_axis, None, None)
    spec2 = P(row_axis, None)
    # check_vma off in two cases the varying-axis checker cannot see
    # through: (a) a view axis, where the disparities are computed
    # replicated along it (and the psum'd interlace is identical);
    # (b) the band engine, whose pallas_call outputs carry no vma info.
    fn = shard_map(shard_fn, mesh=mesh, in_specs=(spec3,),
                   out_specs=(spec2, spec2, spec3),
                   check_vma=view_axis is None and not _use_band(cfg))
    return jax.jit(fn)


def _irv_xla_iter(disp, outl, arms, cfg, interpret):
    return ops.dr_irv(disp, outl, arms, cfg.irv_thresh_s, cfg.irv_thresh_h,
                      cfg.num_disp, cfg.zero_disp, cfg.usd, 1)


def _irv_band_iter(disp, outl, arms, cfg, interpret):
    from stereo_to_multiview_tpu.ops.irvkern import irv_round_kern
    return irv_round_kern(disp, outl, arms, cfg.irv_thresh_s,
                          cfg.irv_thresh_h, cfg.num_disp, cfg.zero_disp,
                          cfg.usd, interpret)
