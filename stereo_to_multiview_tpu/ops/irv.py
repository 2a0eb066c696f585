"""Iterative region voting (reference d_dr_irv.cu).

TPU-native redesign: the reference walks every outlier's full cross region
and builds a 65-bin histogram per pixel per iteration (dr_irv_pre_kernel,
d_dr_irv.cu:134-220).  The region is 'vertical arms of p, horizontal arms of
each covered row' -- separable per bin:

    hist[b, p] = sum_{y in [-U(p), D(p)]} rowspan[b, r+y, c]
    rowspan[b, q] = sum_{x in [-L(q), R(q)]} onehot[b, q + x]

so one exclusive prefix sum per axis + endpoint gathers computes every
histogram exactly (counts are integers < 2^24, exact in f32).  The reliable
count is the same sum with an all-ones 'bin', and the bin argmax with
first-max tie-break matches the reference's strict `max_bin <` scan.

Vote rule reproduced exactly, including the reference's quirk of dividing
the winning *disparity*, not the bin count: accept iff reliable > thresh_s
and (max_d + zero_disp)/reliable > thresh_h (dr_irv_kernel_3:36).  Bins
beyond num_disp can never be hit, so num_disp bins are equivalent to the
reference's fixed 65.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stereo_to_multiview_tpu.ops import shiftops

F32 = jnp.float32

UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3


def _span_sum_inclusive(vol, arm_neg, arm_pos, axis, max_arm):
    """out[i] = sum vol[i - arm_neg[i] .. i + arm_pos[i]] (inclusive both
    ends -- IRV's loops are `<=`, unlike aggregation's half-open spans).
    Prefix sum + bounded select-shift endpoint reads (no gather HLO)."""
    n = vol.shape[axis]
    m = min(int(max_arm), n)
    cs = jnp.cumsum(vol, axis=axis, dtype=F32)
    pad = [(0, 0)] * vol.ndim
    pad[axis] = (1, 0)
    cs = jnp.pad(cs, pad)                     # length n+1
    nd_extra = vol.ndim - arm_neg.ndim
    a_neg = arm_neg.reshape((1,) * nd_extra + arm_neg.shape)
    a_pos = arm_pos.reshape((1,) * nd_extra + arm_pos.shape)
    hi = shiftops.select_gather(cs, a_pos + 1, axis, 1, m + 1, out_len=n)
    lo = shiftops.select_gather(cs, -a_neg, axis, -m, 0, out_len=n)
    return hi - lo


@functools.partial(jax.jit, static_argnames=(
    "thresh_s", "thresh_h", "num_disp", "zero_disp", "usd", "iterations"))
def dr_irv(disp: jnp.ndarray, outliers: jnp.ndarray, arms: jnp.ndarray,
           thresh_s: int, thresh_h: float, num_disp: int, zero_disp: int,
           usd: int, iterations: int):
    """(disp, outliers) after `iterations` synchronous voting rounds."""
    up = jnp.minimum(arms[UP], usd)   # pre-kernel clamps U to sm padding
    down = arms[DOWN]
    left = arms[LEFT]
    right = arms[RIGHT]
    bins = jnp.arange(num_disp)[:, None, None]

    def one_iter(_, state):
        disp, outliers = state
        reliable = (outliers == 0)
        dint = disp.astype(jnp.int32)          # trunc toward zero
        onehot = (reliable[None] & (dint[None] + zero_disp == bins)
                  ).astype(F32)                # (D, H, W)
        row = _span_sum_inclusive(onehot, left, right, axis=2, max_arm=usd)
        hist = _span_sum_inclusive(row, up, down, axis=1, max_arm=usd)

        rel_row = _span_sum_inclusive(reliable[None].astype(F32),
                                      left, right, axis=2, max_arm=usd)
        total = _span_sum_inclusive(rel_row, up, down, axis=1,
                                    max_arm=usd)[0]
        total = total.astype(jnp.int32)

        max_bin = hist.max(axis=0)
        winner = jnp.argmax(hist, axis=0).astype(jnp.int32)  # first max
        max_d = jnp.where(max_bin > 0, winner - zero_disp, dint)

        ratio = (max_d + zero_disp).astype(F32) / jnp.maximum(total, 1).astype(F32)
        accept = ((outliers != 0)
                  & (total > thresh_s)
                  & (ratio > F32(thresh_h)))
        new_disp = jnp.where(accept, max_d.astype(F32), disp)
        new_out = jnp.where(accept, jnp.uint8(0), outliers)
        return new_disp, new_out

    return jax.lax.fori_loop(0, iterations, one_iter, (disp, outliers))
