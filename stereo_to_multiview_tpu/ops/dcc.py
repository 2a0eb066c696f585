"""Disparity cross-check + disocclusion classification (d_dr_dcc.cu).

Outlier labels: 0 ok, 1 mismatch, 2 mismatch & disoccluded.

Gather/scatter-free: disparities are bounded in [-zero_disp,
num_disp - zero_disp), so both the consistency lookup and the
forward-scatter disocclusion test compile to short select-shift chains
over static slices (see ops.shiftops for why gathers are avoided on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp

from stereo_to_multiview_tpu.ops import shiftops

F32 = jnp.float32


def dr_dcc(disp_l: jnp.ndarray, disp_r: jnp.ndarray, thresh: float = 1.0,
           num_disp: int | None = None, zero_disp: int | None = None):
    """Left-right consistency (|d - d_ref| > thresh, truncating int shift,
    clamped; d_dr_dcc.cu:57-82) and forward-scatter disocclusion detection
    (every pixel clears its warp target; survivors are disoccluded,
    d_dr_dcc.cu:35-54).  The scatter is re-expressed race-free.

    num_disp/zero_disp give the static disparity bound [-zd, D-zd); when
    None the image width is used (correct but a longer select chain --
    always pass them on hot paths).
    """
    h, w = disp_l.shape
    if num_disp is None or zero_disp is None:
        dmin, dmax = -(w - 1), w - 1
    else:
        dmin, dmax = -zero_disp, num_disp - zero_disp

    def mismatch(d_a, d_b, sign):
        off = sign * d_a.astype(jnp.int32)
        lo, hi = (dmin, dmax) if sign > 0 else (-dmax, -dmin)
        d_ref = shiftops.select_gather(d_b, off, 1, lo, hi)
        return (jnp.abs(d_a - d_ref) > F32(thresh)).astype(jnp.uint8)

    out_l = mismatch(disp_l, disp_r, +1)
    out_r = mismatch(disp_r, disp_l, -1)

    hit_r = shiftops.select_scatter_hit(disp_l.astype(jnp.int32), 1,
                                        dmin, dmax)
    hit_l = shiftops.select_scatter_hit(-disp_r.astype(jnp.int32), 1,
                                        -dmax, -dmin)
    dis_l = ~hit_l   # never hit by any right-eye writer => disoccluded
    dis_r = ~hit_r

    out_l = jnp.where((out_l == 1) & dis_l, jnp.uint8(2), out_l)
    out_r = jnp.where((out_r == 1) & dis_r, jnp.uint8(2), out_r)
    return out_l, out_r
