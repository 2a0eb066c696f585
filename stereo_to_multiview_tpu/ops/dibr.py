"""Depth-image-based rendering: occlusion masks, backward (gather) warp +
blend -- the live view synthesizer -- and the forward (scatter) warp
capability.  Reference: d_dibr_occl.cu, d_dibr_bwarp.cu, d_dibr_fwarp.cu,
d_op.cu.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stereo_to_multiview_tpu.ops import shiftops
from stereo_to_multiview_tpu.ops.mux import mux_merge_ab
from stereo_to_multiview_tpu.ops.filters import filter_gaussian_lift

F32 = jnp.float32


def op_invertnormf(v: jnp.ndarray) -> jnp.ndarray:
    """v -> 1 - v (d_op.cu:7-16)."""
    return F32(1.0) - v.astype(F32)


def dibr_occl(disp_l: jnp.ndarray, disp_r: jnp.ndarray,
              num_disp: int | None = None, zero_disp: int | None = None):
    """Visibility masks by forward scatter: occl_r[clamp(x+trunc(d_l))]=1,
    occl_l[clamp(x-trunc(d_r))]=1.  The reference's benign write race
    (d_dibr_occl.cu:114-128, all writers store 1) becomes a race-free
    bounded select-shift hit test (no scatter HLO -- see ops.shiftops).
    num_disp/zero_disp give the static disparity bound; None falls back to
    the image width."""
    h, w = disp_l.shape
    if num_disp is None or zero_disp is None:
        dmin, dmax = -(w - 1), w - 1
    else:
        dmin, dmax = -zero_disp, num_disp - zero_disp
    hit_r = shiftops.select_scatter_hit(disp_l.astype(jnp.int32), 1,
                                        dmin, dmax)
    hit_l = shiftops.select_scatter_hit(-disp_r.astype(jnp.int32), 1,
                                        -dmax, -dmin)
    return hit_l.astype(jnp.uint8), hit_r.astype(jnp.uint8)


def dibr_occl_to_mask(occl: jnp.ndarray) -> jnp.ndarray:
    """uchar mask -> float {0,1}; only the value 1 maps to 1.0
    (d_dibr_occl.cu:17-31)."""
    return (occl == 1).astype(F32)


def dibr_backward_warp(img_in: jnp.ndarray, mask: jnp.ndarray,
                       disp: jnp.ndarray, shift: float,
                       num_disp: int | None = None,
                       zero_disp: int | None = None) -> jnp.ndarray:
    """Gather warp (d_dibr_bwarp.cu:5-22): sample img_in at
    clamp(x + disp*shift) with x-only bilinear interpolation (row index is
    integral), truncate to u8 (alu_bilinear_interp returns uchar), multiply
    by mask, truncate again.

    The sample offset disp*shift is bounded by the disparity range times
    |shift| <= 1, so the interpolating read is a bounded linear_gather
    (select-shift chain; no gather HLO).
    """
    h, w, _ = img_in.shape
    if num_disp is None or zero_disp is None:
        dmin, dmax = -(w - 1), w - 1
    else:
        dmin, dmax = -zero_disp, num_disp - zero_disp
    s = float(shift)
    # offset = disp*s; disp in [dmin, dmax], s in [-1, 1]
    cands = (dmin * s, dmax * s)
    off_lo = int(np.floor(min(cands)))
    off_hi = int(np.ceil(max(cands)))
    xs = jnp.arange(w, dtype=F32)[None, :, None]
    sx = xs + (disp.astype(F32) * F32(s))[:, :, None]
    interp = shiftops.linear_gather(img_in.astype(F32), sx, 1,
                                    off_lo, off_hi).astype(jnp.uint8)
    out = interp.astype(F32) * mask.astype(F32)[:, :, None]
    return out.astype(jnp.uint8)


def dibr_backward_warp_dyn(img_in: jnp.ndarray, mask: jnp.ndarray,
                           disp: jnp.ndarray, shift,
                           num_disp: int, zero_disp: int) -> jnp.ndarray:
    """dibr_backward_warp with a *traced* shift in [-1, 1] (used by the
    view-axis-sharded synthesizer, where the view fraction depends on the
    device index).  The select-shift bound widens to the full disparity
    range both ways."""
    h, w, _ = img_in.shape
    dmax = max(zero_disp, num_disp - zero_disp)
    xs = jnp.arange(w, dtype=F32)[None, :, None]
    sx = xs + (disp.astype(F32) * shift.astype(F32))[:, :, None]
    interp = shiftops.linear_gather(img_in.astype(F32), sx, 1,
                                    -dmax - 1, dmax + 1).astype(jnp.uint8)
    out = interp.astype(F32) * mask.astype(F32)[:, :, None]
    return out.astype(jnp.uint8)


def dibr_feather_mask(mask_r: jnp.ndarray, feather_radius: int,
                      feather_sigma: float) -> jnp.ndarray:
    """Blend weight for view merging: invert the right-eye mask and feather
    it with the lifting Gaussian (d_dibr_bwarp.cu:60-63).  Shift-independent,
    so the fused pipeline computes it once for all views (the reference
    recomputes the identical mask per view)."""
    return filter_gaussian_lift(op_invertnormf(mask_r),
                                feather_radius, feather_sigma)


def dibr_dbm(img_l, img_r, disp_l, disp_r, mask_l, mask_r, shift,
             feather_radius: int = 10, feather_sigma: float = 15.0,
             feathered_mask=None):
    """Backward-mapped intermediate view at fraction `shift` from the right
    (d_dibr_bwarp.cu:24-70).  Note the asymmetric pairing: the view warps
    the LEFT image with the RIGHT eye's disparity/mask at -shift and vice
    versa (d_dibr_bwarp.cu:56-57)."""
    view_from_l = dibr_backward_warp(img_l, mask_r, disp_r, -shift)
    view_from_r = dibr_backward_warp(img_r, mask_l, disp_l, 1.0 - shift)
    m = feathered_mask
    if m is None:
        m = dibr_feather_mask(mask_r, feather_radius, feather_sigma)
    return mux_merge_ab(view_from_l, view_from_r, m)


def dibr_forward_warp(img_in: jnp.ndarray, disp: jnp.ndarray,
                      shift: float, num_disp: int | None = None,
                      zero_disp: int | None = None) -> jnp.ndarray:
    """Forward scatter warp out[clamp(x + trunc(disp*shift))] = in[x].

    The reference kernel (d_dibr_fwarp.cu:9-25) has a last-writer-wins race
    with no z-buffer; we define the deterministic rule 'largest source x
    wins'.  Unhit targets are 0.  Race-free bounded select-shift: for each
    candidate offset k (descending source x == ascending k at fixed target)
    take the first matching writer.
    """
    h, w, c = img_in.shape
    if num_disp is None or zero_disp is None:
        dmin, dmax = -(w - 1), w - 1
    else:
        dmin, dmax = -zero_disp, num_disp - zero_disp
    s = float(shift)
    cands = (dmin * s, dmax * s)
    off_lo = int(np.floor(min(cands)))
    off_hi = int(np.ceil(max(cands)))

    off = (disp.astype(F32) * F32(s)).astype(jnp.int32)   # trunc toward 0
    pos = jnp.arange(w, dtype=jnp.int32)[None, :]
    tgt = jnp.clip(pos + off, 0, w - 1)

    out = jnp.zeros((h, w, c), img_in.dtype)
    found = jnp.zeros((h, w), bool)
    # source x = target - k; largest source wins => scan k ascending and
    # keep the first match... largest x means smallest k, so scan k
    # ascending and keep the FIRST hit.
    for k in range(off_lo, off_hi + 1):
        writer_tgt = shiftops.shift(tgt, 1, -k)
        valid = (pos - k >= 0) & (pos - k <= w - 1)
        match = valid & (writer_tgt == pos) & ~found
        src_px = shiftops.shift(img_in, 1, -k)
        out = jnp.where(match[:, :, None], src_px, out)
        found = found | match
    return out


def dibr_dfm(img_l, img_r, disp_l, disp_r, mask_l, mask_r, shift):
    """Forward-mapped view synthesis (the legacy d_dibr_dfm capability,
    d_dibr_fwarp.cu:27-95): forward-warp L by shift*disp_l and R by
    (shift-1)*disp_r, then mask-blend (A = R-warp weighted by inverted,
    feathered right mask like dbm's merge)."""
    view_from_l = dibr_forward_warp(img_l, disp_l, shift)
    view_from_r = dibr_forward_warp(img_r, disp_r, shift - 1.0)
    m = dibr_feather_mask(mask_r, 10, 15.0)
    return mux_merge_ab(view_from_l, view_from_r, m)
