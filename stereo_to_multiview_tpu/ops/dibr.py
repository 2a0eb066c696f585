"""Depth-image-based rendering: occlusion masks, backward (gather) warp +
blend -- the live view synthesizer -- and the forward (scatter) warp
capability.  Reference: d_dibr_occl.cu, d_dibr_bwarp.cu, d_dibr_fwarp.cu,
d_op.cu.
"""

from __future__ import annotations

import jax.numpy as jnp

from stereo_to_multiview_tpu.ops.mux import mux_merge_ab
from stereo_to_multiview_tpu.ops.filters import filter_gaussian_lift

F32 = jnp.float32


def op_invertnormf(v: jnp.ndarray) -> jnp.ndarray:
    """v -> 1 - v (d_op.cu:7-16)."""
    return F32(1.0) - v.astype(F32)


def dibr_occl(disp_l: jnp.ndarray, disp_r: jnp.ndarray):
    """Visibility masks by forward scatter: occl_r[clamp(x+trunc(d_l))]=1,
    occl_l[clamp(x-trunc(d_r))]=1.  The reference's benign write race
    (d_dibr_occl.cu:114-128, all writers store 1) becomes a scatter-max."""
    h, w = disp_l.shape
    xs = jnp.arange(w)[None, :]
    rows = jnp.broadcast_to(jnp.arange(h)[:, None], (h, w))
    ones = jnp.ones((h, w), jnp.uint8)
    tgt_r = jnp.clip(xs + disp_l.astype(jnp.int32), 0, w - 1)
    tgt_l = jnp.clip(xs - disp_r.astype(jnp.int32), 0, w - 1)
    zeros = jnp.zeros((h, w), jnp.uint8)
    occl_r = zeros.at[rows, tgt_r].max(ones)
    occl_l = zeros.at[rows, tgt_l].max(ones)
    return occl_l, occl_r


def dibr_occl_to_mask(occl: jnp.ndarray) -> jnp.ndarray:
    """uchar mask -> float {0,1}; only the value 1 maps to 1.0
    (d_dibr_occl.cu:17-31)."""
    return (occl == 1).astype(F32)


def dibr_backward_warp(img_in: jnp.ndarray, mask: jnp.ndarray,
                       disp: jnp.ndarray, shift: float) -> jnp.ndarray:
    """Gather warp (d_dibr_bwarp.cu:5-22): sample img_in at
    clamp(x + disp*shift) with x-only bilinear interpolation (row index is
    integral), truncate to u8 (alu_bilinear_interp returns uchar), multiply
    by mask, truncate again."""
    h, w, _ = img_in.shape
    xs = jnp.arange(w, dtype=F32)[None, :]
    sx = jnp.clip(xs + disp.astype(F32) * F32(shift), F32(0.0), F32(w - 1))
    x0 = jnp.floor(sx).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wx = (sx - x0.astype(F32))[:, :, None]
    v0 = jnp.take_along_axis(img_in, x0[:, :, None], axis=1).astype(F32)
    v1 = jnp.take_along_axis(img_in, x1[:, :, None], axis=1).astype(F32)
    interp = (v0 * (1 - wx) + v1 * wx).astype(jnp.uint8)
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
                      shift: float) -> jnp.ndarray:
    """Forward scatter warp out[clamp(x + trunc(disp*shift))] = in[x].

    The reference kernel (d_dibr_fwarp.cu:9-25) has a last-writer-wins race
    with no z-buffer; we define the deterministic rule 'largest source x
    wins' via an argmax scatter of the source index.  Unhit targets are 0.
    """
    h, w, c = img_in.shape
    xs = jnp.arange(w)[None, :]
    rows = jnp.broadcast_to(jnp.arange(h)[:, None], (h, w))
    tgt = jnp.clip(xs + (disp.astype(F32) * F32(shift)).astype(jnp.int32),
                   0, w - 1)
    winner = jnp.full((h, w), -1, jnp.int32).at[rows, tgt].max(
        jnp.broadcast_to(xs, (h, w)).astype(jnp.int32))
    hit = winner >= 0
    src = jnp.clip(winner, 0, w - 1)
    gathered = jnp.take_along_axis(img_in, src[:, :, None], axis=1)
    return jnp.where(hit[:, :, None], gathered, jnp.uint8(0))


def dibr_dfm(img_l, img_r, disp_l, disp_r, mask_l, mask_r, shift):
    """Forward-mapped view synthesis (the legacy d_dibr_dfm capability,
    d_dibr_fwarp.cu:27-95): forward-warp L by shift*disp_l and R by
    (shift-1)*disp_r, then mask-blend (A = R-warp weighted by inverted,
    feathered right mask like dbm's merge)."""
    view_from_l = dibr_forward_warp(img_l, disp_l, shift)
    view_from_r = dibr_forward_warp(img_r, disp_r, shift - 1.0)
    m = dibr_feather_mask(mask_r, 10, 15.0)
    return mux_merge_ab(view_from_l, view_from_r, m)
