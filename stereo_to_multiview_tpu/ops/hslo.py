"""Horizontal scanline optimization (semi-global DP along rows).

The reference ships only a stub: dc_hslo_h_cost_kernel computes nothing
observable and the host frees everything without output (d_dc_hslo.cu:9-29,
97-221; its single call site is commented out, image_io.cpp:310-316).  What
it *does* implement is the adaptive penalty scheme -- three tiers of
(P1, P2) keyed on color gradients in both images with T as threshold and
full / one-quarter / one-tenth strengths (dc_hslo_h_cdiff_kernel:73-93).

This module ships the real horizontal scanline optimization those penalties
set up (the AD-Census paper's SO step, restricted to the two horizontal
directions), as an optional stage behind PipelineConfig.use_hslo (off by
default to preserve output parity with the reference):

    C_r(p,d) = C(p,d) - min_k C_r(p-r,k) +
               min( C_r(p-r,d),
                    C_r(p-r,d-1) + P1, C_r(p-r,d+1) + P1,
                    min_k C_r(p-r,k) + P2 )

scanned left-to-right and right-to-left with `jax.lax.scan` (the whole DP
is one compiled loop over columns; each step is a (H, D) vector op block),
then averaged over the two directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32
BIG = jnp.float32(1e30)


def _penalties(gray_l: jnp.ndarray, gray_r: jnp.ndarray, num_disp: int,
               zero_disp: int, T: float, H1: float, H2: float,
               sign: int = +1):
    """Per-(d, row, col) adaptive penalties for the left image's DP.

    d1 = |I_l(x) - I_l(x-1)|, d2 = |I_r(x') - I_r(x'-1)| at the matching
    column x' = clamp(x + (d - zero_disp)).  Tiers (dc_hslo_h_cdiff_kernel):
    both < T -> (H1, H2); exactly one < T -> /4; both >= T -> /10.
    """
    from stereo_to_multiview_tpu.ops import shiftops
    h, w = gray_l.shape
    gl = gray_l.astype(F32)
    gr = gray_r.astype(F32)
    d1 = jnp.abs(gl - shiftops.shift(gl, 1, -1))
    d2_full = jnp.abs(gr - shiftops.shift(gr, 1, -1))
    # per-d matching column is a static shift: stack D edge-padded slices
    d2 = jnp.stack([
        shiftops.shift(d2_full, 1, sign * (d - zero_disp))
        for d in range(num_disp)
    ])
    small1 = d1[None] < F32(T)
    small2 = d2 < F32(T)
    scale = jnp.where(small1 & small2, F32(1.0),
                      jnp.where(small1 | small2, F32(0.25), F32(0.1)))
    return F32(H1) * scale, F32(H2) * scale


def _scan_dir(cost: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray,
              reverse: bool) -> jnp.ndarray:
    """One-direction DP over columns.  cost, p1, p2: (D, H, W)."""
    c = jnp.moveaxis(cost, 2, 0)      # (W, D, H)
    p1 = jnp.moveaxis(p1, 2, 0)
    p2 = jnp.moveaxis(p2, 2, 0)

    def step(prev, inp):
        ci, p1i, p2i = inp            # (D, H)
        mn = prev.min(axis=0, keepdims=True)          # (1, H)
        up = jnp.concatenate([prev[1:], jnp.broadcast_to(BIG, (1,) + prev.shape[1:])])
        dn = jnp.concatenate([jnp.broadcast_to(BIG, (1,) + prev.shape[1:]), prev[:-1]])
        best = jnp.minimum(jnp.minimum(prev, mn + p2i),
                           jnp.minimum(up, dn) + p1i)
        out = ci + best - mn
        return out, out

    init = c[-1] if reverse else c[0]
    xs = (c[:-1][::-1], p1[:-1][::-1], p2[:-1][::-1]) if reverse else \
         (c[1:], p1[1:], p2[1:])
    _, outs = jax.lax.scan(step, init, xs)
    if reverse:
        res = jnp.concatenate([outs[::-1], init[None]], axis=0)
    else:
        res = jnp.concatenate([init[None], outs], axis=0)
    return jnp.moveaxis(res, 0, 2)    # back to (D, H, W)


def dc_hslo(cost: jnp.ndarray, gray_l: jnp.ndarray, gray_r: jnp.ndarray,
            num_disp: int, zero_disp: int, T: float = 15.0,
            H1: float = 1.0, H2: float = 3.0, sign: int = +1) -> jnp.ndarray:
    """Scanline-optimized cost volume (average of the two horizontal
    directions).  `sign` selects the matching-direction convention: +1 for
    the left eye's volume, -1 for the right's."""
    if sign < 0:
        p1, p2 = _penalties(gray_r, gray_l, num_disp, zero_disp, T, H1, H2,
                            sign=-1)
    else:
        p1, p2 = _penalties(gray_l, gray_r, num_disp, zero_disp, T, H1, H2,
                            sign=+1)
    lr = _scan_dir(cost, p1, p2, reverse=False)
    rl = _scan_dir(cost, p1, p2, reverse=True)
    return (lr + rl) * F32(0.5)


# ---------------------------------------------------------------------------
# (H, W, D) layout variant -- the band engine's native orientation (D on
# the TPU lane axis), so the per-column DP steps are (H, D) vector blocks
# and no (D, H, W) relayout of the aggregated volume is ever needed.
# ---------------------------------------------------------------------------


def _penalties_hwd(gray_a: jnp.ndarray, gray_b: jnp.ndarray, num_disp: int,
                   zero_disp: int, T: float, H1: float, H2: float,
                   sign: int):
    """(H, W, D) adaptive penalties; same tiers as _penalties."""
    from stereo_to_multiview_tpu.ops import shiftops
    ga = gray_a.astype(F32)
    gb = gray_b.astype(F32)
    d1 = jnp.abs(ga - shiftops.shift(ga, 1, -1))
    d2_full = jnp.abs(gb - shiftops.shift(gb, 1, -1))
    d2 = jnp.stack([
        shiftops.shift(d2_full, 1, sign * (d - zero_disp))
        for d in range(num_disp)
    ], axis=2)
    small1 = d1[:, :, None] < F32(T)
    small2 = d2 < F32(T)
    scale = jnp.where(small1 & small2, F32(1.0),
                      jnp.where(small1 | small2, F32(0.25), F32(0.1)))
    return F32(H1) * scale, F32(H2) * scale


def _scan_dir_hwd(cost: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray,
                  reverse: bool) -> jnp.ndarray:
    """One-direction DP over columns of an (H, W, D) volume: each scan
    step is an (H, D) block with D riding the lanes."""
    c = jnp.moveaxis(cost, 1, 0)      # (W, H, D)
    p1 = jnp.moveaxis(p1, 1, 0)
    p2 = jnp.moveaxis(p2, 1, 0)

    def step(prev, inp):
        ci, p1i, p2i = inp            # (H, D)
        mn = prev.min(axis=1, keepdims=True)          # (H, 1)
        big = jnp.broadcast_to(BIG, prev.shape[:1] + (1,))
        up = jnp.concatenate([prev[:, 1:], big], axis=1)
        dn = jnp.concatenate([big, prev[:, :-1]], axis=1)
        best = jnp.minimum(jnp.minimum(prev, mn + p2i),
                           jnp.minimum(up, dn) + p1i)
        out = ci + best - mn
        return out, out

    init = c[-1] if reverse else c[0]
    xs = (c[:-1][::-1], p1[:-1][::-1], p2[:-1][::-1]) if reverse else \
         (c[1:], p1[1:], p2[1:])
    _, outs = jax.lax.scan(step, init, xs)
    if reverse:
        res = jnp.concatenate([outs[::-1], init[None]], axis=0)
    else:
        res = jnp.concatenate([init[None], outs], axis=0)
    return jnp.moveaxis(res, 0, 1)    # back to (H, W, D)


def dc_hslo_hwd(cost: jnp.ndarray, gray_l: jnp.ndarray, gray_r: jnp.ndarray,
                num_disp: int, zero_disp: int, T: float = 15.0,
                H1: float = 1.0, H2: float = 3.0,
                sign: int = +1) -> jnp.ndarray:
    """dc_hslo on an (H, W, D) volume (the band engine's layout): same
    per-element f32 math, no volume relayout.  When the volume is the
    quantized integer aggregate, scale H1/H2 by its cost-unit factor
    (ops.band.agg_cost_scale) so the penalties keep their reference
    strength relative to the data term."""
    if sign < 0:
        p1, p2 = _penalties_hwd(gray_r, gray_l, num_disp, zero_disp, T,
                                H1, H2, sign=-1)
    else:
        p1, p2 = _penalties_hwd(gray_l, gray_r, num_disp, zero_disp, T,
                                H1, H2, sign=+1)
    lr = _scan_dir_hwd(cost, p1, p2, reverse=False)
    rl = _scan_dir_hwd(cost, p1, p2, reverse=True)
    return (lr + rl) * F32(0.5)
