"""Pallas TPU kernel for the DIBR backward (gather) warp.

The XLA select-shift formulation materializes intermediates across the
~2*dmax-term chain and measured far off roofline at 1080p.  Here each
(8-row, 128-column) tile keeps the row-resident padded image planes in
VMEM and resolves the per-pixel sample with a select chain over static
lane rolls; both directional warps of one view run in a single call.

Semantics match ops.dibr.dibr_backward_warp exactly (d_dibr_bwarp.cu:
5-22): sample at clamp(x + disp*shift, 0, w-1), x-only bilinear
interpolation, truncation to u8 (the mask multiply + second truncation
stay outside -- they are cheap elementwise XLA).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
_LANE = 128
_ROWS = 8
_PAD = 128


def _window(chunks, lo: int):
    k = lo // _LANE
    r = lo % _LANE
    a, b = chunks[k], chunks[min(k + 1, 2)]
    if r == 0:
        return a
    rolled_a = pltpu.roll(a, _LANE - r, axis=1)
    rolled_b = pltpu.roll(b, _LANE - r, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANE), 1)
    return jnp.where(lane < _LANE - r, rolled_a, rolled_b)


def _warp_one(planes_chunks, disp, shift, off_lo, off_hi, w):
    """(8, 128) warped value per channel for one direction."""
    s = pl.program_id(1)
    base = pl.multiple_of(s * _LANE, _LANE)
    xg = (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANE), 1)
          + base).astype(F32)
    coord = jnp.clip(xg + disp * F32(shift), F32(0.0), F32(w - 1))
    k0f = jnp.floor(coord)
    frac = coord - k0f
    k0 = k0f.astype(jnp.int32) - xg.astype(jnp.int32)   # in [off_lo, off_hi]

    outs = [jnp.zeros((_ROWS, _LANE), F32) for _ in range(3)]
    for k in range(off_lo, off_hi + 1):
        sel = (k0 == k)
        for c in range(3):
            v0 = _window(planes_chunks[c], _PAD + k).astype(F32)
            v1 = _window(planes_chunks[c], _PAD + k + 1).astype(F32)
            val = v0 * (F32(1.0) - frac) + v1 * frac
            outs[c] = jnp.where(sel, val, outs[c])
    # alu_bilinear_interp returns uchar: truncate toward zero
    return [jnp.floor(o) for o in outs]


def _warp_kernel(dl_ref, dr_ref, lb, lg, lr, rb, rg, rr,
                 ol0, ol1, ol2, or0, or1, or2,
                 *, shift_l, shift_r, lo_l, hi_l, lo_r, hi_r, w):
    """View warp pair: from-L using disp_r at shift_l, from-R using
    disp_l at shift_r (the reference's asymmetric pairing,
    d_dibr_bwarp.cu:56-57)."""
    s = pl.program_id(1)
    base = pl.multiple_of(s * _LANE, _LANE)

    def chunks(ref):
        return [ref[:, pl.ds(base + k * _LANE, _LANE)] for k in range(3)]

    l_ch = [chunks(r_) for r_ in (lb, lg, lr)]
    r_ch = [chunks(r_) for r_ in (rb, rg, rr)]
    disp_l = dl_ref[:, pl.ds(base, _LANE)]
    disp_r = dr_ref[:, pl.ds(base, _LANE)]

    a = _warp_one(l_ch, disp_r, shift_l, lo_l, hi_l, w)
    b = _warp_one(r_ch, disp_l, shift_r, lo_r, hi_r, w)
    for ref, val in zip((ol0, ol1, ol2, or0, or1, or2), a + b):
        ref[...] = val


def _bounds(dmin, dmax, s):
    c = (dmin * s, dmax * s)
    return int(np.floor(min(c))), int(np.ceil(max(c)))


def _warp_views_kernel(dl_ref, dr_ref, lb, lg, lr, rb, rg, rr,
                       oa0, oa1, oa2, ob0, ob1, ob2,
                       *, shifts_l, shifts_r, bounds_l, bounds_r, w):
    """All intermediate views' directional warps in one pass: the sample
    windows (image values at x + k) are shared across views, so each k of
    the union offset range builds one new window per channel and every
    view just selects from it.  Outputs: (nv, R, 128) per (direction,
    channel)."""
    s = pl.program_id(1)
    base = pl.multiple_of(s * _LANE, _LANE)

    def chunks(ref):
        return [ref[:, pl.ds(base + k * _LANE, _LANE)] for k in range(3)]

    l_ch = [chunks(r_) for r_ in (lb, lg, lr)]
    r_ch = [chunks(r_) for r_ in (rb, rg, rr)]
    disp_l = dl_ref[:, pl.ds(base, _LANE)]
    disp_r = dr_ref[:, pl.ds(base, _LANE)]
    xg = (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANE), 1)
          + base).astype(F32)

    for disp, shifts, bounds, ch, outs in (
            (disp_r, shifts_l, bounds_l, l_ch, (oa0, oa1, oa2)),
            (disp_l, shifts_r, bounds_r, r_ch, (ob0, ob1, ob2))):
        nv = len(shifts)
        k0s, fracs = [], []
        for sh in shifts:
            coord = jnp.clip(xg + disp * F32(sh), F32(0.0), F32(w - 1))
            k0f = jnp.floor(coord)
            fracs.append(coord - k0f)
            k0s.append(k0f.astype(jnp.int32) - xg.astype(jnp.int32))
        lo = min(b[0] for b in bounds)
        hi = max(b[1] for b in bounds)
        accs = [[jnp.zeros((_ROWS, _LANE), F32) for _ in range(3)]
                for _ in range(nv)]
        v1 = [_window(ch[c], _PAD + lo).astype(F32) for c in range(3)]
        for k in range(lo, hi + 1):
            v0 = v1
            v1 = [_window(ch[c], _PAD + k + 1).astype(F32)
                  for c in range(3)]
            for v in range(nv):
                if k < bounds[v][0] or k > bounds[v][1]:
                    continue
                sel = k0s[v] == k
                f = fracs[v]
                for c in range(3):
                    val = v0[c] * (F32(1.0) - f) + v1[c] * f
                    accs[v][c] = jnp.where(sel, val, accs[v][c])
        for c in range(3):
            for v in range(nv):
                outs[c][v] = jnp.floor(accs[v][c])


@functools.partial(jax.jit, static_argnames=("shifts", "num_disp",
                                             "zero_disp", "interpret"))
def dibr_warp_views_kern(img_l, img_r, disp_l, disp_r, shifts,
                         num_disp: int, zero_disp: int,
                         interpret: bool = False):
    """All V-2 intermediate views' warp pairs in one kernel call:
    returns (va, vb) with va[v] = warp of img_l at -shifts[v] with
    disp_r, vb[v] = warp of img_r at 1-shifts[v] with disp_l -- each
    (nv, H, W, 3) f32 with integral values, bit-identical to per-view
    dibr_warp_pair_kern / ops.dibr.dibr_backward_warp."""
    h, w = disp_l.shape
    nv = len(shifts)
    hp = -(-h // _ROWS) * _ROWS
    wp = -(-w // _LANE) * _LANE
    dmin, dmax = -zero_disp, num_disp - zero_disp
    shifts_l = tuple(-float(s) for s in shifts)
    shifts_r = tuple(1.0 - float(s) for s in shifts)
    bounds_l = tuple(_bounds(dmin, dmax, s) for s in shifts_l)
    bounds_r = tuple(_bounds(dmin, dmax, s) for s in shifts_r)
    reach = max(max(abs(b[0]), abs(b[1]))
                for b in bounds_l + bounds_r) + 1
    if reach > _PAD:
        raise ValueError("disparity reach exceeds one 128-lane chunk")

    def planes(img):
        out = []
        for c in range(3):
            p = img[:, :, c].astype(jnp.int32)
            p = jnp.pad(p, ((0, hp - h), (0, 0)), mode="edge")
            p = jnp.pad(p, ((0, 0), (_PAD, _PAD + wp - w)))
            out.append(p)
        return out

    def disp_pad(d):
        d = jnp.pad(d.astype(F32), ((0, hp - h), (0, 0)), mode="edge")
        return jnp.pad(d, ((0, 0), (0, wp - w)))

    args = ([disp_pad(disp_l), disp_pad(disp_r)]
            + planes(img_l) + planes(img_r))

    grid = (hp // _ROWS, wp // _LANE)
    dspec = pl.BlockSpec((_ROWS, wp), lambda y, s_: (y, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((_ROWS, wp + 2 * _PAD), lambda y, s_: (y, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((nv, _ROWS, _LANE), lambda y, s_: (0, y, s_),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((nv, hp, wp), jnp.float32)

    outs = pl.pallas_call(
        functools.partial(_warp_views_kernel, shifts_l=shifts_l,
                          shifts_r=shifts_r, bounds_l=bounds_l,
                          bounds_r=bounds_r, w=w),
        grid=grid,
        in_specs=[dspec, dspec] + [pspec] * 6,
        out_specs=(ospec,) * 6,
        out_shape=(oshape,) * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*args)
    va = jnp.stack([o[:, :h, :w] for o in outs[:3]], axis=-1)
    vb = jnp.stack([o[:, :h, :w] for o in outs[3:]], axis=-1)
    return va, vb


@functools.partial(jax.jit, static_argnames=("shift", "num_disp",
                                             "zero_disp", "interpret"))
def dibr_warp_pair_kern(img_l, img_r, disp_l, disp_r, shift: float,
                        num_disp: int, zero_disp: int,
                        interpret: bool = False):
    """Intermediate view at fraction `shift` from the right: returns
    (view_from_l, view_from_r) as (H, W, 3) f32 with integral values
    (pre-mask, pre-final-truncation) -- warp from L at -shift with
    disp_r, from R at 1-shift with disp_l."""
    h, w = disp_l.shape
    hp = -(-h // _ROWS) * _ROWS
    wp = -(-w // _LANE) * _LANE
    dmin, dmax = -zero_disp, num_disp - zero_disp
    s_l, s_r = -float(shift), 1.0 - float(shift)
    lo_l, hi_l = _bounds(dmin, dmax, s_l)
    lo_r, hi_r = _bounds(dmin, dmax, s_r)
    if max(abs(lo_l), abs(hi_l), abs(lo_r), abs(hi_r)) + 1 > _PAD:
        raise ValueError("disparity reach exceeds one 128-lane chunk")

    def planes(img):
        out = []
        for c in range(3):
            p = img[:, :, c].astype(jnp.int32)
            p = jnp.pad(p, ((0, hp - h), (0, 0)), mode="edge")
            p = jnp.pad(p, ((0, 0), (_PAD, _PAD + wp - w)))
            out.append(p)
        return out

    def disp_pad(d):
        d = jnp.pad(d.astype(F32), ((0, hp - h), (0, 0)), mode="edge")
        return jnp.pad(d, ((0, 0), (0, wp - w)))

    args = ([disp_pad(disp_l), disp_pad(disp_r)]
            + planes(img_l) + planes(img_r))

    grid = (hp // _ROWS, wp // _LANE)
    dspec = pl.BlockSpec((_ROWS, wp), lambda y, s_: (y, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((_ROWS, wp + 2 * _PAD), lambda y, s_: (y, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((_ROWS, _LANE), lambda y, s_: (y, s_),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((hp, wp), jnp.float32)

    outs = pl.pallas_call(
        functools.partial(_warp_kernel, shift_l=s_l, shift_r=s_r,
                          lo_l=lo_l, hi_l=hi_l, lo_r=lo_r, hi_r=hi_r, w=w),
        grid=grid,
        in_specs=[dspec, dspec] + [pspec] * 6,
        out_specs=(ospec,) * 6,
        out_shape=(oshape,) * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*args)
    va = jnp.stack([o[:h, :w] for o in outs[:3]], axis=-1)
    vb = jnp.stack([o[:h, :w] for o in outs[3:]], axis=-1)
    return va, vb


# ---------------------------------------------------------------------------
# x-major data-adaptive warp (round 4).
#
# The natural-layout kernel above walks the full static offset range of
# every view (~sum_v D*|shift_v| ~ 768 select steps at D=128/V=8) with a
# lane roll + select per window -- measured ~15 ms at 1080p.  Transposed
# to (W, H), every sample offset is a SUBLANE slice, and the per-view
# loop can run over the block's ACTUAL offset range [min k0, max k0]
# (dynamic-bound fori_loop): on real content the per-block disparity
# spread is a small fraction of the search range.  Exact in all cases
# (offsets outside the block range select nothing).
# ---------------------------------------------------------------------------

_XX = 128    # x sublanes per grid step (window = 3 consecutive blocks)
_XY = 128    # image rows per grid step (lane axis)


def _warp_views_xm_kernel(*refs, shifts_l, shifts_r, w: int, nv: int):
    """One (128-x, 128-row) step of every intermediate view's two
    directional warps, x-major.  refs: disp_l, disp_r (XX, XY) center
    blocks; 6 image planes (l b/g/r, r b/g/r) x 3 consecutive x-blocks;
    6 outputs (nv, XX, XY); 6 scratches (3*XX, XY) f32 holding the
    window spans for dynamic slicing."""
    dl_ref, dr_ref = refs[0], refs[1]
    planes = refs[2:20]                      # 6 planes x 3 blocks
    outs = refs[20:26]                       # a b/g/r, b b/g/r
    scr = refs[26:32]
    xx = _XX

    for p in range(6):
        scr[p][...] = jnp.concatenate(
            [planes[3 * p][:].astype(F32), planes[3 * p + 1][:].astype(F32),
             planes[3 * p + 2][:].astype(F32)], axis=0)

    x0 = pl.program_id(0)
    xg = (jax.lax.broadcasted_iota(jnp.int32, (xx, _XY), 0)
          + x0 * xx).astype(F32)

    for disp_ref, shifts, ch0, out3 in (
            (dr_ref, shifts_l, 0, outs[0:3]),      # from-L, disp_r
            (dl_ref, shifts_r, 3, outs[3:6])):     # from-R, disp_l
        disp = disp_ref[...]
        for v, sh in enumerate(shifts):
            coord = jnp.clip(xg + disp * F32(sh), F32(0.0), F32(w - 1))
            k0f = jnp.floor(coord)
            f = coord - k0f
            g = F32(1.0) - f
            k0 = (k0f - xg).astype(jnp.int32)    # offset of floor sample
            lo = jnp.min(k0)
            hi = jnp.max(k0)

            def body(k, accs, k0=k0, f=f, g=g, ch0=ch0):
                sel = k0 == k
                new = []
                for c in range(3):
                    w0 = scr[ch0 + c][pl.ds(xx + k, xx), :]
                    w1 = scr[ch0 + c][pl.ds(xx + k + 1, xx), :]
                    new.append(jnp.where(sel, w0 * g + w1 * f, accs[c]))
                return tuple(new)

            zero = jnp.zeros((xx, _XY), F32)
            accs = jax.lax.fori_loop(lo, hi + 1, body, (zero, zero, zero))
            for c in range(3):
                # alu_bilinear_interp returns uchar: truncate toward zero
                out3[c][v] = jnp.floor(accs[c])


def _warp_merge_views_xm_kernel(*refs, shifts_l, shifts_r, w: int, nv: int):
    """_warp_views_xm_kernel with the mask multiply and the truncating
    mux merge fused as an epilogue (d_mux_common.cu:43-45 semantics):

        out[v] = u8((1-m) * u8(floor(warpL_v) * mask_r))
               + u8(  m   * u8(floor(warpR_v) * mask_l))

    with m = the feathered blend weight.  The inner u8 casts are
    lossless (integral products <= 255), so they fold into the outer
    expression; results are bit-identical to the unfused
    dibr_warp_views_kern_xm + XLA mask/merge chain.  Outputs are the
    merged u8 views -- 16x less HBM write traffic than the (nv, W, H)
    f32 warp volumes the unfused path materializes and re-reads.

    refs: disp_l, disp_r, mask_l, mask_r, feathered (XX, XY) center
    blocks; 6 image planes x 3 consecutive x-blocks; 3 outputs
    (nv, XX, XY) u8 (b/g/r); 6 scratches (3*XX, XY) f32."""
    dl_ref, dr_ref = refs[0], refs[1]
    ml_ref, mr_ref, f_ref = refs[2], refs[3], refs[4]
    planes = refs[5:23]                      # 6 planes x 3 blocks
    outs = refs[23:26]                       # merged b/g/r
    scr = refs[26:32]
    xx = _XX

    for p in range(6):
        scr[p][...] = jnp.concatenate(
            [planes[3 * p][:].astype(F32), planes[3 * p + 1][:].astype(F32),
             planes[3 * p + 2][:].astype(F32)], axis=0)

    x0 = pl.program_id(0)
    xg = (jax.lax.broadcasted_iota(jnp.int32, (xx, _XY), 0)
          + x0 * xx).astype(F32)

    m = f_ref[...]
    terms = [[None] * 3 for _ in range(nv)]
    for disp_ref, shifts, ch0, msk, wgt, first in (
            (dr_ref, shifts_l, 0, mr_ref[...], F32(1.0) - m, True),
            (dl_ref, shifts_r, 3, ml_ref[...], m, False)):
        disp = disp_ref[...]
        for v, sh in enumerate(shifts):
            coord = jnp.clip(xg + disp * F32(sh), F32(0.0), F32(w - 1))
            k0f = jnp.floor(coord)
            f = coord - k0f
            g = F32(1.0) - f
            k0 = (k0f - xg).astype(jnp.int32)
            lo = jnp.min(k0)
            hi = jnp.max(k0)

            def body(k, accs, k0=k0, f=f, g=g, ch0=ch0):
                sel = k0 == k
                new = []
                for c in range(3):
                    w0 = scr[ch0 + c][pl.ds(xx + k, xx), :]
                    w1 = scr[ch0 + c][pl.ds(xx + k + 1, xx), :]
                    new.append(jnp.where(sel, w0 * g + w1 * f, accs[c]))
                return tuple(new)

            zero = jnp.zeros((xx, _XY), F32)
            accs = jax.lax.fori_loop(lo, hi + 1, body, (zero, zero, zero))
            for c in range(3):
                # the two u8 truncations ride i32 (Mosaic has no u8
                # vector add); values stay in [0, 255] so the final u8
                # cast is exact
                t = (wgt * (jnp.floor(accs[c]) * msk)).astype(jnp.int32)
                if first:
                    terms[v][c] = t
                else:
                    outs[c][v] = (terms[v][c] + t).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("shifts", "num_disp",
                                             "zero_disp", "interpret"))
def dibr_warp_merge_views_kern_xm(img_l, img_r, disp_l, disp_r,
                                  mask_l_t, mask_r_t, feathered_t, shifts,
                                  num_disp: int, zero_disp: int,
                                  interpret: bool = False):
    """Fused warp + mask + merge: every intermediate view synthesized to
    its final u8 values in one x-major kernel (see
    _warp_merge_views_xm_kernel).  mask_l_t/mask_r_t/feathered_t are
    TRANSPOSED (W, H) f32 planes (the synthesis chain's native layout);
    returns merged (nv, W, H, 3) u8 views, bit-identical (transposed) to
    mux_merge_ab(u8(warpL*mask_r), u8(warpR*mask_l), feathered) on the
    unfused warp outputs (d_dibr_bwarp.cu:56-63 + d_mux_common.cu:43-45)."""
    h, w = disp_l.shape
    nv = len(shifts)
    wp = -(-w // _XX) * _XX
    hp = -(-h // _XY) * _XY
    dmin, dmax = -zero_disp, num_disp - zero_disp
    shifts_l = tuple(-float(s) for s in shifts)
    shifts_r = tuple(1.0 - float(s) for s in shifts)
    reach = int(np.ceil(max(abs(dmin), abs(dmax))
                        * max(abs(s) for s in shifts_l + shifts_r))) + 1
    if reach > _XX:
        raise ValueError("disparity reach exceeds one 128-x block")

    def planes(img):
        out = []
        for c in range(3):
            p = img[:, :, c].astype(jnp.int32).T           # (W, H)
            p = jnp.pad(p, ((0, wp - w), (0, hp - h)), mode="edge")
            p = jnp.pad(p, ((_XX, _XX), (0, 0)))
            out.append(p)
        return out

    def disp_pad(d):
        dt = d.astype(F32).T
        return jnp.pad(dt, ((0, wp - w), (0, hp - h)), mode="edge")

    def mask_pad(m):
        return jnp.pad(m.astype(F32), ((0, wp - w), (0, hp - h)))

    args = ([disp_pad(disp_l), disp_pad(disp_r), mask_pad(mask_l_t),
             mask_pad(mask_r_t), mask_pad(feathered_t)]
            + [b for p in planes(img_l) + planes(img_r)
               for b in (p, p, p)])

    dspec = pl.BlockSpec((_XX, _XY), lambda x, y: (x, y),
                         memory_space=pltpu.VMEM)
    pspecs = [pl.BlockSpec((_XX, _XY), lambda x, y, d=d: (x + d, y),
                           memory_space=pltpu.VMEM) for d in range(3)]
    ospec = pl.BlockSpec((nv, _XX, _XY), lambda x, y: (0, x, y),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((nv, wp, hp), jnp.uint8)
    scratch = pltpu.VMEM((3 * _XX, _XY), jnp.float32)

    outs = pl.pallas_call(
        functools.partial(_warp_merge_views_xm_kernel, shifts_l=shifts_l,
                          shifts_r=shifts_r, w=w, nv=nv),
        grid=(wp // _XX, hp // _XY),
        in_specs=[dspec] * 5 + [pspecs[d] for _ in range(6)
                                for d in range(3)],
        out_specs=(ospec,) * 3,
        out_shape=(oshape,) * 3,
        scratch_shapes=[scratch] * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return jnp.stack([o[:, :w, :h] for o in outs], axis=-1)


@functools.partial(jax.jit, static_argnames=("shifts", "num_disp",
                                             "zero_disp", "interpret"))
def dibr_warp_views_kern_xm(img_l, img_r, disp_l, disp_r, shifts,
                            num_disp: int, zero_disp: int,
                            interpret: bool = False):
    """x-major twin of dibr_warp_views_kern: returns (va, vb) with
    va[v] = warp of img_l at -shifts[v] with disp_r, vb[v] = warp of
    img_r at 1-shifts[v] with disp_l -- each (nv, W, H, 3) f32 with
    integral values, TRANSPOSED (the caller keeps the synthesis chain in
    the transposed domain and transposes the merged u8 views, ~40x less
    data than these volumes).  Values bit-identical (transposed) to
    dibr_warp_views_kern."""
    h, w = disp_l.shape
    nv = len(shifts)
    wp = -(-w // _XX) * _XX
    hp = -(-h // _XY) * _XY
    dmin, dmax = -zero_disp, num_disp - zero_disp
    shifts_l = tuple(-float(s) for s in shifts)
    shifts_r = tuple(1.0 - float(s) for s in shifts)
    reach = int(np.ceil(max(abs(dmin), abs(dmax))
                        * max(abs(s) for s in shifts_l + shifts_r))) + 1
    if reach > _XX:
        raise ValueError("disparity reach exceeds one 128-x block")

    def planes(img):
        out = []
        for c in range(3):
            p = img[:, :, c].astype(jnp.int32).T           # (W, H)
            p = jnp.pad(p, ((0, wp - w), (0, hp - h)), mode="edge")
            p = jnp.pad(p, ((_XX, _XX), (0, 0)))
            out.append(p)
        return out

    def disp_pad(d):
        dt = d.astype(F32).T
        return jnp.pad(dt, ((0, wp - w), (0, hp - h)), mode="edge")

    args = ([disp_pad(disp_l), disp_pad(disp_r)]
            + [b for p in planes(img_l) + planes(img_r)
               for b in (p, p, p)])

    dspec = pl.BlockSpec((_XX, _XY), lambda x, y: (x, y),
                         memory_space=pltpu.VMEM)
    pspecs = [pl.BlockSpec((_XX, _XY), lambda x, y, d=d: (x + d, y),
                           memory_space=pltpu.VMEM) for d in range(3)]
    ospec = pl.BlockSpec((nv, _XX, _XY), lambda x, y: (0, x, y),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((nv, wp, hp), jnp.float32)
    scratch = pltpu.VMEM((3 * _XX, _XY), jnp.float32)

    outs = pl.pallas_call(
        functools.partial(_warp_views_xm_kernel, shifts_l=shifts_l,
                          shifts_r=shifts_r, w=w, nv=nv),
        grid=(wp // _XX, hp // _XY),
        in_specs=[dspec, dspec] + [pspecs[d] for _ in range(6)
                                   for d in range(3)],
        out_specs=(ospec,) * 6,
        out_shape=(oshape,) * 6,
        scratch_shapes=[scratch] * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    va = jnp.stack([o[:, :w, :h] for o in outs[:3]], axis=-1)
    vb = jnp.stack([o[:, :w, :h] for o in outs[3:]], axis=-1)
    return va, vb
