"""Disparity cross-check + disocclusion classification (d_dr_dcc.cu).

Outlier labels: 0 ok, 1 mismatch, 2 mismatch & disoccluded.
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32


def dr_dcc(disp_l: jnp.ndarray, disp_r: jnp.ndarray, thresh: float = 1.0):
    """Left-right consistency (|d - d_ref| > thresh, truncating int shift,
    clamped; d_dr_dcc.cu:57-82) and forward-scatter disocclusion detection
    (every pixel clears its warp target; survivors are disoccluded,
    d_dr_dcc.cu:35-54).  The scatter is re-expressed as a race-free
    scatter-min (all writers store 0)."""
    h, w = disp_l.shape
    xs = jnp.arange(w)[None, :]
    rows = jnp.broadcast_to(jnp.arange(h)[:, None], (h, w))

    def mismatch(d_a, d_b, sign):
        coord = jnp.clip(xs + sign * d_a.astype(jnp.int32), 0, w - 1)
        d_ref = jnp.take_along_axis(d_b, coord, axis=1)
        return (jnp.abs(d_a - d_ref) > F32(thresh)).astype(jnp.uint8)

    out_l = mismatch(disp_l, disp_r, +1)
    out_r = mismatch(disp_r, disp_l, -1)

    tgt_r = jnp.clip(xs + disp_l.astype(jnp.int32), 0, w - 1)
    tgt_l = jnp.clip(xs - disp_r.astype(jnp.int32), 0, w - 1)
    ones = jnp.ones((h, w), jnp.uint8)
    zeros = jnp.zeros((h, w), jnp.uint8)
    dis_r = ones.at[rows, tgt_r].min(zeros)
    dis_l = ones.at[rows, tgt_l].min(zeros)

    out_l = jnp.where((out_l == 1) & (dis_l == 1), jnp.uint8(2), out_l)
    out_r = jnp.where((out_r == 1) & (dis_r == 1), jnp.uint8(2), out_r)
    return out_l, out_r
