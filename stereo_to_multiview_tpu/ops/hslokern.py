"""Fused Pallas TPU kernel for the horizontal scanline optimization.

The lax.scan formulation (ops/hslo.py) measured 275 ms/frame at
1080p/D=128: it materializes two (H, W, D) f32 penalty volumes, pays
(W, H, D) relayouts for every operand of both scan directions, and
round-trips each direction's output through HBM.  This kernel streams
row blocks of the W-MAJOR volume (the band aggregation emits that
orientation for free via its transposed in-kernel stores): both DP
directions run as dynamic-bound fori_loops with an (8, D) carry and
per-column major-dim slices (Mosaic allows arbitrary dynamic indices
only on non-vreg dims), the forward pass parks its rows in a VMEM
scratch, and the backward pass fuses the two-direction average AND the
first-min WTA, emitting disparities in 8-column aligned groups -- the
scanned volume never exists in HBM.

Semantics: ops.hslo.dc_hslo_hwd followed by argmin (the real SO step
for the penalties of d_dc_hslo.cu:31-95), same f32 recurrence; both
carries start at BIG, which makes column 0 (resp. W-1) come out as
exactly its own cost (BIG - BIG == 0), so no special-casing.  The
carry's f32 association can differ from the scan twin's only through
FMA contraction; disparities are tested to a tie-flip fraction bound.

Both eyes run in ONE call stacked along H (rows are DP-independent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
_GRP = 8     # columns per aligned output store group
BIG = 1e30
_VMEM_BUDGET = 112 * 1024 * 1024


def _pick_rows(wp: int, d: int, vol_itemsize: int) -> int:
    """Image rows per grid step.  The DP's per-column carry chain is
    serial (latency-bound), so wider blocks amortize it: 8-row blocks
    measured 157 ms at 1080p, 16-row 109, 32-row halves the chain count
    again.  Rows are DP-independent, so the block height never changes
    the result -- only whether the step's VMEM (double-buffered vol +
    tier blocks plus the fwd scratch) fits the v5e's 128 MB."""
    per_cell = 2 * vol_itemsize + 2 * 1 + 4
    for rows in (32, 16, 8):
        if wp * rows * d * per_cell <= _VMEM_BUDGET:
            return rows
    return 8


def _hslo_kernel(vol_ref, tier_ref, out_ref, fwd_ref, *, w: int,
                 rows: int, h1: float, h2: float, zero_disp: int):
    """One `rows`-row step over a W-major block.

    vol: (W, rows, D) aggregated costs (any exact dtype; converted on
    load); tier: (W, rows, D) i8 in {0,1,2} (count of small gradients;
    penalty scales 0.1 / 0.25 / 1.0); fwd scratch (W, rows, D) f32;
    out (1, W, rows) f32 -- this step's disparity page (a lane block
    is legal only when it spans the full array dim, hence one page per
    grid step; the caller reshapes the 16 MB map).
    """
    d = vol_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, d), 1)
    first = lane == 0
    last = lane == d - 1
    big = jnp.full((rows, d), F32(BIG))

    def col(x):
        return vol_ref[pl.ds(x, 1)].reshape(rows, d).astype(F32)

    def penalties(x):
        # tier rides HBM as int8; no direct i8->f32 cast in Mosaic
        t = (tier_ref[pl.ds(x, 1)].reshape(rows, d)
             .astype(jnp.int32).astype(F32))
        s = jnp.where(t == F32(2.0), F32(1.0),
                      jnp.where(t == F32(1.0), F32(0.25), F32(0.1)))
        return F32(h1) * s, F32(h2) * s

    def step(prev, ci, p1, p2):
        mn = jnp.min(prev, axis=1, keepdims=True)
        up = jnp.where(last, F32(BIG), pltpu.roll(prev, d - 1, 1))
        dn = jnp.where(first, F32(BIG), pltpu.roll(prev, 1, 1))
        best = jnp.minimum(jnp.minimum(prev, mn + p2),
                           jnp.minimum(up, dn) + p1)
        return ci + best - mn

    def fbody(x, prev):
        p1, p2 = penalties(x)
        out = step(prev, col(x), p1, p2)
        fwd_ref[pl.ds(x, 1)] = out[None]
        return out

    jax.lax.fori_loop(0, w, fbody, big)

    # backward, fused average + first-min WTA, stored in 8-column
    # aligned groups (dynamic stores on a vreg dim must be 8-aligned)
    ng = w // _GRP

    def bgroup(gi, prev):
        g = ng - 1 - gi
        tiles = []
        for j in range(_GRP - 1, -1, -1):
            x = g * _GRP + j
            p1, p2 = penalties(x)
            prev = step(prev, col(x), p1, p2)
            a = (fwd_ref[pl.ds(x, 1)].reshape(rows, d) + prev) * F32(0.5)
            am = jnp.argmin(a, axis=1).astype(jnp.int32)
            tiles.append(((am - zero_disp).astype(F32))[None, :])
        out_ref[0, pl.ds(pl.multiple_of(g * _GRP, _GRP), _GRP), :] = \
            jnp.concatenate(tiles[::-1], axis=0)
        return prev

    jax.lax.fori_loop(0, ng, bgroup, big)


def _tier_volume_whd(gray_a, gray_b, num_disp: int, zero_disp: int,
                     T: float, sign: int):
    """(W, H, D) int8 tier volume: count of small gradients in
    {0, 1, 2} (ops.hslo._penalties_hwd semantics, W-major)."""
    from stereo_to_multiview_tpu.ops import shiftops
    ga = gray_a.astype(F32).T                # (W, H)
    gb = gray_b.astype(F32).T
    d1 = jnp.abs(ga - shiftops.shift(ga, 0, -1))
    d2f = jnp.abs(gb - shiftops.shift(gb, 0, -1))
    s1 = (d1 < F32(T)).astype(jnp.int8)[:, :, None]
    # build the shifted stack as a flat 2D concat: ANY stack that gives
    # a slice a degenerate dimension lets XLA pick a layout that pads
    # it 128x (measured 818 MB -> 32 GB of HLO temps for both
    # jnp.stack(axis=2) and axis=0); (D*W, H) planes have no degenerate
    # dims, the reshape is free, and the final (D, W, H) -> (W, H, D)
    # move is one bandwidth-bound relayout of the int8 volume
    sm2 = (d2f < F32(T)).astype(jnp.int8)
    s2 = jnp.concatenate([
        shiftops.shift(sm2, 0, sign * (dd - zero_disp))
        for dd in range(num_disp)], axis=0)
    s2 = s2.reshape(num_disp, ga.shape[0], ga.shape[1])
    return s1 + jnp.transpose(s2, (1, 2, 0))


@functools.partial(jax.jit, static_argnames=("num_disp", "zero_disp",
                                             "T", "H1", "H2", "sign",
                                             "interpret"))
def dc_hslo_wta_kern(vol_whd: jnp.ndarray, gray_a: jnp.ndarray,
                     gray_b: jnp.ndarray, num_disp: int, zero_disp: int,
                     T: float = 15.0, H1: float = 1.0, H2: float = 3.0,
                     sign: int = +1,
                     interpret: bool = False) -> jnp.ndarray:
    """(W, H, D) W-major aggregated volume -> (H, W) f32 disparities:
    the full two-direction scanline DP + first-min WTA in one fused
    kernel.  The band aggregation emits the W-major orientation with no
    relayout (band_aggregate_q(..., out_t=True)); grays stay (H, W).
    `sign` selects the eye's matching convention (+1 left, -1 right);
    pass (gray_r, gray_l) for the right eye like ops.hslo.dc_hslo.

    H1/H2 must already be in the volume's cost units (the band engine
    scales by ops.band.agg_cost_scale)."""
    w, h, d = vol_whd.shape
    wp = -(-w // _GRP) * _GRP
    rows = _pick_rows(wp, d, vol_whd.dtype.itemsize)
    hp = -(-h // rows) * rows
    tier = _tier_volume_whd(gray_a, gray_b, num_disp, zero_disp, T, sign)
    # zero-cost padded columns are NEUTRAL: the forward pass only sees
    # them after the real data, and in the backward pass the first pad
    # column collapses the BIG carry to uniform zero (ci + BIG - BIG)
    # which stays uniform zero through every pad column, so the last
    # real column receives exactly the correct rl start (its own cost)
    volp = jnp.pad(vol_whd, ((0, wp - w), (0, hp - h), (0, 0)))
    tierp = jnp.pad(tier, ((0, wp - w), (0, hp - h), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_hslo_kernel, w=wp, rows=rows, h1=float(H1),
                          h2=float(H2), zero_disp=zero_disp),
        grid=(hp // rows,),
        in_specs=[pl.BlockSpec((wp, rows, d), lambda y: (0, y, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((wp, rows, d), lambda y: (0, y, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, wp, rows), lambda y: (y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp // rows, wp, rows),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((wp, rows, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(volp, tierp)
    return out.transpose(0, 2, 1).reshape(hp, wp)[:h, :w]
