"""Pallas TPU kernels for iterative region voting (d_dr_irv.cu).

The band-matmul IRV (ops.band.dr_irv_band) materializes a one-hot
(H, W, D) volume, two span volumes and transposes per round.  These two
kernels fuse the round:

  I1 `_rowspan_kernel`: builds each row's one-hot tile in VMEM straight
     from the disparity/outlier rows and contracts it with the L/R-arm
     band matrix on the MXU -- writing the row-span volume directly in
     (W, H, B) layout as uint8 (counts <= 2*usd+1 <= 129, exact).
  I2 `_vote_kernel`: the vertical pass in that transposed layout (bins on
     the MXU lanes, like the band kernel) with the histogram reduced
     *in-kernel*: running first-max winner, max count and total -- no
     histogram volume ever exists.

Outlier-sparse skipping (round 5: MANUAL flag-gated DMA -- the round-4
dense block specs wrote/read the whole ~300-600 MB row-span volume every
round regardless of flags, which bounded round 1):

  * the row-span volume lives in compiler-chosen (HBM) memory, never as
    pipelined blocks.  The rowspan kernel DMAs each (256-x, 32-row)
    block VMEM->HBM only when its write flag says a needed vote can read
    it (flag 1 = compute+write, 2 = zero-fill, 0 = skip entirely -- no
    zero write, no DMA).
  * the vote kernel DMAs only the (8-W, 256-row) span windows of H
    segments that contain a `need` pixel (vflags); skipped segments
    write zero totals (never accepted).
  * zero-fill flags (2) cover exactly the rows a FLAGGED vote segment's
    window can touch beyond the computed blocks, so gated reads never
    see uninitialized memory (a NaN there would poison the 0-weight band
    columns of needed votes).  Unflagged regions are never read: votes
    at non-`need` pixels are masked out of the accept (need_px below).

All skips are exact; a full IRV round remains bit-identical to
ops.irv.dr_irv / ops.band.dr_irv_band.  The early-stopping round loop
(ops.band.dr_irv_band_chunked) removes converged rounds entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_to_multiview_tpu.ops.band import _band01

F32 = jnp.float32
BF16 = jnp.bfloat16
_LANE = 128
_ROWS = 32    # rowspan image rows per grid step
_XTILE = 256  # rowspan output columns per grid step (fewer, fatter units)
_VROWS = 8    # vote W-rows per grid step
_PAD = 128    # x padding of the disparity rows (row-pass window reach)
_HPAD = 64    # H padding of the row-span volume (vote window reach)


def _rowspan_kernel(wflags_ref, disp_ref, outl_ref, al_ref, ar_ref,
                    rs_hbm, scratch, sem, *, num_disp: int, zero_disp: int,
                    reach: int, n_xt: int):
    """One (32-row, 256-column) step: (256x, 32row, B) u8 row spans,
    written to the HBM-resident span volume by flag-gated manual DMA.

    `reach` is the usd-adaptive window radius (8-multiple >= usd <= 64):
    only the columns [x0-reach, x0+_XTILE+reach) of the padded span feed
    the contraction.  wflags (scalar-prefetched): 1 = compute + write,
    2 = write zeros (read-cover of a flagged vote window that no
    computed block fills), 0 = skip -- no write at all (round 4 wrote
    zeros densely, which made round 1 DMA-bound)."""
    yb = pl.program_id(0)
    s = pl.program_id(1)
    flag = wflags_ref[yb * n_xt + s]

    @pl.when(flag == 1)
    def _compute():
        base = pl.multiple_of(s * _XTILE, _LANE)
        win = _XTILE + 2 * reach
        d_win = disp_ref[:, pl.ds(base, _XTILE + 2 * _LANE)]  # (R, X+256)
        o_win = outl_ref[:, pl.ds(base, _XTILE + 2 * _LANE)]
        # output-pixel arms, sublane-oriented
        an_t = al_ref[:, pl.ds(base + _PAD, _XTILE)].T     # (Xx, R)
        ap_t = ar_ref[:, pl.ds(base + _PAD, _XTILE)].T
        lo = _LANE - reach
        d_t = d_win.T[lo:lo + win]                         # (win_i, R)
        o_t = o_win.T[lo:lo + win]

        o = jax.lax.broadcasted_iota(jnp.int32, (_XTILE, win), 0)
        i = jax.lax.broadcasted_iota(jnp.int32, (_XTILE, win), 1)
        r_off = i - reach - o
        b_iota = jax.lax.broadcasted_iota(jnp.int32, (win, num_disp), 1)

        rows = []
        for r in range(_ROWS):
            an = an_t[:, r:r + 1]
            ap = ap_t[:, r:r + 1]
            band = _band01(r_off, an, ap, True)
            dint = d_t[:, r:r + 1].astype(jnp.int32)       # (win_i, 1)
            reli = o_t[:, r:r + 1] == 0
            onehot = (reli & (dint + zero_disp == b_iota)).astype(BF16)
            y_dot = jnp.dot(band, onehot, preferred_element_type=F32)
            rows.append(y_dot.astype(jnp.int32))           # exact: <= 129
        scratch[...] = jnp.stack(rows, axis=1).astype(jnp.uint8)

    @pl.when(flag == 2)
    def _zero():
        scratch[...] = jnp.zeros((_XTILE, _ROWS, num_disp), jnp.uint8)

    @pl.when(flag != 0)
    def _write():
        dma = pltpu.make_async_copy(
            scratch,
            rs_hbm.at[pl.ds(s * _XTILE, _XTILE),
                      pl.ds(yb * _ROWS + _HPAD, _ROWS), :],
            sem)
        dma.start()
        dma.wait()


def _vote_kernel(vflags_ref, rs_hbm, au_ref, ad_ref,
                 win_ref, max_ref, tot_ref, scratch, sem, *,
                 num_disp: int, n_hseg: int):
    """One 8-W-row grid step in the (W, H, B) layout: vertical inclusive
    span + in-kernel histogram reduction.  The span volume stays in HBM;
    each FLAGGED 128-H segment DMAs only its (8, 128 + 2*_HPAD, B)
    window into VMEM (u8 -> bf16 in-kernel).  Skipped H tiles (no `need`
    pixel among their output pixels) write zero totals (never accepted)
    and move no data."""
    b = pl.program_id(0)

    au_all = au_ref[:].T                 # (hp, VROWS)
    ad_all = ad_ref[:].T

    win = _LANE + 2 * _HPAD
    o = jax.lax.broadcasted_iota(jnp.int32, (_LANE, win), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (_LANE, win), 1)
    r_off = i - _HPAD - o

    for s in range(n_hseg):
        a0 = s * _LANE
        flag = vflags_ref[b * n_hseg + s]

        @pl.when(flag != 0)
        def _compute(s=s, a0=a0):
            dma = pltpu.make_async_copy(
                rs_hbm.at[pl.ds(b * _VROWS, _VROWS),
                          pl.ds(a0, win), :],
                scratch, sem)
            dma.start()
            dma.wait()
            for r in range(_VROWS):
                an = au_all[a0:a0 + _LANE, r:r + 1]
                ap = ad_all[a0:a0 + _LANE, r:r + 1]
                band = _band01(r_off, an, ap, True)
                x = scratch[r].astype(jnp.int32).astype(BF16)
                hist = jnp.dot(band, x, preferred_element_type=F32)
                tot_ref[r, a0:a0 + _LANE] = jnp.sum(hist, axis=1)
                max_ref[r, a0:a0 + _LANE] = jnp.max(hist, axis=1)
                # Mosaic's native argmax: deterministic, but its tie
                # index is not guaranteed lowest-first (the reference's
                # rule, dr_irv_pre_kernel).  See ops/band.py _res_kernel
                # for the measured cost of exact-tie constructions
                # (+20 ms/frame); same-backend determinism (chunking /
                # sharding) is unaffected.  Guarded by
                # scripts/tpu_validate.py tierule.
                win_ref[r, a0:a0 + _LANE] = jnp.argmax(
                    hist, axis=1).astype(jnp.int32)

        @pl.when(flag == 0)
        def _zero(a0=a0):
            zf = jnp.zeros((_VROWS, _LANE), F32)
            win_ref[:, a0:a0 + _LANE] = jnp.zeros((_VROWS, _LANE),
                                                  jnp.int32)
            max_ref[:, a0:a0 + _LANE] = zf
            tot_ref[:, a0:a0 + _LANE] = zf


@functools.partial(jax.jit, static_argnames=("num_disp", "zero_disp",
                                             "usd", "interpret"))
def irv_round_kern(disp: jnp.ndarray, outliers: jnp.ndarray,
                   arms: jnp.ndarray, thresh_s: int, thresh_h: float,
                   num_disp: int, zero_disp: int, usd: int,
                   interpret: bool = False, need: jnp.ndarray = None):
    """One synchronous IRV voting round.  Bit-identical to
    ops.irv.dr_irv with iterations=1 (same vote rule, dr_irv_kernel_3:36;
    U arm clamped to usd like the reference pre-kernel).

    `need` (bool (H, W), default = every outlier): the pixels whose vote
    must be (re)evaluated this round; everything else keeps its
    outlier/disparity state untouched.  A pixel's vote outcome can only
    change when a reliable pixel inside its cross region (a Chebyshev
    ball of radius usd) changed since its last evaluation, so the round
    loop passes the dilated change frontier -- exact.  With the manual
    flag-gated DMA the round's span-volume traffic scales with the
    flagged fraction, not the frame size."""
    from stereo_to_multiview_tpu.ops.cross import UP, DOWN, LEFT, RIGHT
    if usd > _LANE // 2:
        raise ValueError("usd must be <= 64 (256-wide kernel windows)")
    reach = max(8, -(-usd // 8) * 8)     # usd-adaptive window radius
    # bins padded to a full 128-lane tile: Mosaic (current toolchain)
    # rejects the rowspan's middle-index store at narrower lane
    # widths ("unsupported shape cast").  Pad bins never match a
    # disparity (one-hot compares against dint + zero_disp < num_disp),
    # so their counts are zero and winner/max/total are unchanged.
    num_bins = max(num_disp, _LANE)
    h, w = disp.shape
    hp = -(-h // _LANE) * _LANE        # H padded for I2's 128-chunks
    wp = -(-w // _XTILE) * _XTILE      # W padded for I1's 256-tiles

    def pad_hw(x, fill):
        return jnp.pad(x, ((0, hp - h), (0, wp - w)), constant_values=fill)

    disp_p = pad_hw(disp.astype(F32), 0)
    outl_p = pad_hw(outliers.astype(jnp.int32), 1)   # pads never vote
    al = pad_hw(arms[LEFT].astype(jnp.int32), 0)
    ar = pad_hw(arms[RIGHT].astype(jnp.int32), 0)
    au = pad_hw(jnp.minimum(arms[UP], usd).astype(jnp.int32), 0)
    ad_ = pad_hw(arms[DOWN].astype(jnp.int32), 0)

    # --- per-block vote flags (pads are non-outliers: their votes are
    # discarded, so blocks they alone touch can skip) ---
    if need is None:
        need = outliers != 0
    else:
        need = need & (outliers != 0)
    need_px = need                     # unpadded: gates the accept below
    need = jnp.pad(need, ((0, hp - h), (0, wp - w)))
    n_yb, n_xt = hp // _ROWS, wp // _XTILE
    n_xb, n_hseg = wp // _VROWS, hp // _LANE
    m2 = need.reshape(n_hseg, _LANE, n_xb, _VROWS).any(axis=(1, 3)).T
    vflags = m2.astype(jnp.int32).reshape(-1)
    # rowspan write flags: 1 where an outlier sits within vertical vote
    # reach of the block's rows (block-any at the (32-row, 256-col)
    # grain, dilated by ceil(usd/32) block rows -- an over-approximation
    # of the exact +-usd reach); 2 where a FLAGGED vote segment's DMA
    # window ([s*128 - _HPAD, s*128 + 128 + _HPAD) rows) touches the
    # block but no computed block fills it -- those must be zero, not
    # uninitialized memory; 0 elsewhere (no write at all)
    blk = need.reshape(n_yb, _ROWS, n_xt, _XTILE).any(axis=(1, 3))
    r_reach = -(-usd // _ROWS)
    dil = blk
    for k in range(1, r_reach + 1):
        up = jnp.pad(blk[k:], ((0, k), (0, 0)))
        dn = jnp.pad(blk[:-k], ((k, 0), (0, 0)))
        dil = dil | up | dn
    # read cover: vote seg s (any flagged 8-W strip in the x-tile) reads
    # rowspan blocks [4s - _HPAD/_ROWS, 4s + 3 + _HPAD/_ROWS]
    vt = m2.T.reshape(n_hseg, n_xt, _XTILE // _VROWS).any(axis=2)
    segs_per = _LANE // _ROWS                     # 4 rowspan blocks/seg
    cover = jnp.repeat(vt, segs_per, axis=0)      # (n_yb, n_xt)
    c_reach = _HPAD // _ROWS
    cov = cover
    for k in range(1, c_reach + 1):
        up = jnp.pad(cover[k:], ((0, k), (0, 0)))
        dn = jnp.pad(cover[:-k], ((k, 0), (0, 0)))
        cov = cov | up | dn
    wflags = jnp.where(dil, 1, jnp.where(cov, 2, 0)) \
        .astype(jnp.int32).reshape(-1)

    # x-neighbor reach for the row pass
    dx = jnp.pad(disp_p, ((0, 0), (_PAD, _PAD)))
    ox = jnp.pad(outl_p, ((0, 0), (_PAD, _PAD)), constant_values=1)
    alx = jnp.pad(al, ((0, 0), (_PAD, _PAD)))
    arx = jnp.pad(ar, ((0, 0), (_PAD, _PAD)))

    row_spec = pl.BlockSpec((_ROWS, wp + 2 * _PAD),
                            lambda y, s, f: (y, 0),
                            memory_space=pltpu.VMEM)
    rs = pl.pallas_call(
        functools.partial(_rowspan_kernel, num_disp=num_bins,
                          zero_disp=zero_disp, reach=reach, n_xt=n_xt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_yb, n_xt),
            in_specs=[row_spec] * 4,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((_XTILE, _ROWS, num_bins),
                                       jnp.uint8),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((wp, hp + 2 * _HPAD, num_bins),
                                       jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(wflags, dx, ox, alx, arx)

    # vertical pass + reduce, in the (W, H, B) layout
    au_t = au.T                        # (W, H)
    ad_t = ad_.T

    arm_spec = pl.BlockSpec((_VROWS, hp), lambda b, f: (b, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_VROWS, hp), lambda b, f: (b, 0),
                            memory_space=pltpu.VMEM)
    vwin = _LANE + 2 * _HPAD
    win_t, max_t, tot_t = pl.pallas_call(
        functools.partial(_vote_kernel, num_disp=num_bins, n_hseg=n_hseg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_xb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      arm_spec, arm_spec],
            out_specs=(out_spec,) * 3,
            scratch_shapes=[pltpu.VMEM((_VROWS, vwin, num_bins),
                                       jnp.uint8),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=(jax.ShapeDtypeStruct((wp, hp), jnp.int32),
                   jax.ShapeDtypeStruct((wp, hp), jnp.float32),
                   jax.ShapeDtypeStruct((wp, hp), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(vflags, rs, au_t, ad_t)

    winner = win_t.T[:h, :w]
    max_bin = max_t.T[:h, :w]
    total = tot_t.T[:h, :w].astype(jnp.int32)

    dint = disp.astype(jnp.int32)
    max_d = jnp.where(max_bin > 0, winner - zero_disp, dint)
    ratio = ((max_d + zero_disp).astype(F32)
             / jnp.maximum(total, 1).astype(F32))
    # accept ONLY need pixels: the rowspan flags guarantee full span
    # windows exactly for need's dilation, so a non-need outlier sharing
    # a flagged 128-row vote segment may see partially-zeroed windows
    # (smaller total RAISES the reference's ratio quirk) -- masking keeps
    # its state untouched, which the frontier invariant says is its true
    # outcome (caught by the r4 second review pass)
    accept = (need_px & (total > thresh_s)
              & (ratio > F32(thresh_h)))
    new_disp = jnp.where(accept, max_d.astype(F32), disp)
    new_out = jnp.where(accept, jnp.uint8(0), outliers)
    return new_disp, new_out
