"""Banded-matmul span sums on the MXU (Pallas TPU kernel).

The cross-aggregation and IRV-histogram stages both reduce to the same
primitive: a per-pixel windowed sum along one image axis where the window
[i - arm_neg(i), i + arm_pos(i)) is data-dependent but bounded by usd and
*identical across the D (disparity / histogram-bin) axis*.  On TPU the
per-pixel endpoint lookup is a gather (pathological) and the select-shift
chain costs O(usd) VPU ops per element.  Instead, observe that for an
output tile of 128 pixels the window sum is a banded 0/1 matrix product:

    out[o, :] = sum_i A[o, i] * vol[i, :]        A[o, i] = [i-o in window(o)]

with the D axis riding the MXU lanes.  A is built on the fly from the arm
vectors (2 compares per entry, VPU) and is *exact* in bfloat16.

Kernel layout (round 2): ONE row-resident volume block per grid step --
(rows, W + 128, D) in VMEM -- with every 256-wide window taken by *static*
sublane slices inside the kernel.  The round-1 design fed each 128-column
tile three overlapping neighbor blocks, which re-read the whole volume
3x from HBM and made every pass bandwidth-bound.

Aggregation numerics (round 2): the aggregated volumes are kept as exact
small integers end to end ("quantized" path):

  * the cost volume is quantized once at init to q = round(cost * 127)
    in [0, 254] -- exactly representable in bf16;
  * pass 1 sums <= 129 such values (usd <= 64), exact in f32;
  * passes 2-4 split their integer inputs into two base-256 digits (each
    < 256, bf16-exact) -> two exact MXU dots, recombined in f32;
  * after passes 2 and 3 the volume is rescaled by floor(x/256 + 0.5)
    to keep every subsequent accumulation below 2^24 (f32-exact).

Every intermediate is therefore an exact integer and the final WTA argmin
is fully deterministic: the result is bit-identical no matter how the
frame is chunked over rows (the V-pass tile origin shifts with the chunk,
but exact sums are order-independent) or sharded over devices.  The only
deviation from the reference's f32 math is the single initial 1/127
quantization of the per-pixel cost.

Reference semantics: d_ca_cross_sum.cu:243-293 (half-open spans, arm_pos
excludes the anchor when 0) and d_dr_irv.cu:134-220 (inclusive spans).
Vertical passes run this same kernel on a (W, H, D)-transposed volume --
the reference uses the identical transpose trick (d_ca_cross.cu:255-270).

The kernel assumes windows never extend past the image (guaranteed: cross
arms stop at the border by construction, d_ca_cross.cu:41-69), so
out-of-range band columns have A == 0 and only zero padding is read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF16 = jnp.bfloat16

_LANE = 128   # output tile width
_HALO = 64    # max window reach beyond the tile on each side (usd <= 64)
_ROWS = 8     # image rows per grid step

# cost quantization scale: cost in [0, 2] -> integers in [0, 254]
QSCALE = 127.0

_VMEM_LIMIT = 96 * 1024 * 1024


def _halo_for(max_arm: int) -> int:
    """Smallest sublane-aligned window halo covering arms <= max_arm.
    The round-2 kernels contracted a fixed 64-lane halo regardless of
    usd; at the bench config (usd=34) that made >=35% of every
    aggregation dot zeros by construction (VERDICT r2 item 1a)."""
    if max_arm > _HALO:
        raise ValueError("band kernels require max_arm (usd) <= 64")
    return max(8, -(-max_arm // 8) * 8)


def _terms(x, mode: str, terms: int):
    """Split a (256, D) window into bf16 planes with f32 recombination
    scales.  mode 'int': x holds exact non-negative integers < 256^terms;
    base-256 digits, each < 256 hence bf16-exact -> the recombined dot is
    exact.  mode 'float': successive bf16 remainders (hi = bf16(x),
    mid = bf16(x - hi), ...) for ~f32 accuracy at `terms` x the bf16 cost.
    """
    if x.dtype in (jnp.uint8, jnp.int16):
        x = x.astype(jnp.int32)   # no direct narrow-int -> bf16/f32 casts
    if mode == "int":
        if terms == 1:
            return [(x.astype(BF16), None)]
        xf = x.astype(F32)
        hi = jnp.floor(xf * F32(1.0 / 256.0))
        lo = xf - hi * F32(256.0)
        out = [(lo.astype(BF16), None), (hi.astype(BF16), F32(256.0))]
        if terms >= 3:
            h2 = jnp.floor(hi * F32(1.0 / 256.0))
            out[1] = ((hi - h2 * F32(256.0)).astype(BF16), F32(256.0))
            out.append((h2.astype(BF16), F32(65536.0)))
        return out
    xf = x.astype(F32)
    out = []
    for k in range(terms):
        part = xf.astype(BF16)
        out.append((part, None))
        if k + 1 < terms:
            xf = xf - part.astype(F32)
    return out


def _band01(roff, an, ap, inclusive: bool):
    """Exact 0/1 bf16 band matrix in ONE wide compare: -an <= roff < ap
    (or <= ap) is 0 <= roff + an < an + ap (+1), and with arms >= 0 the
    unsigned reinterpretation makes the lower bound free (negative
    roff + an wraps far above any arm sum).  One add + one compare +
    one select instead of two compares + and + select -- the band build
    is the issue-bound aggregation kernels' largest VPU term."""
    t = (roff + an).astype(jnp.uint32)
    s = (an + ap + (1 if inclusive else 0)).astype(jnp.uint32)
    return (t < s).astype(BF16)


def _tiles_for(w: int, otile: int, halo: int):
    """Static output tiles ((a0, width, lo_trim, hi_trim), ...) covering
    [0, w): `otile`-wide plus a remainder (widths stay 8-multiples when w
    is one).  lo/hi_trim clip each tile's window [a0 - halo, a0 + width +
    halo) to the ARRAY bounds -- the kernels read unpadded volumes (a
    jnp.pad of an (H, W, D) volume is a full-volume HBM copy; round 2
    paid three of them per aggregation)."""
    tiles, a0 = [], 0
    while a0 < w:
        width = min(otile, w - a0)
        lo = max(0, halo - a0)
        hi = max(0, a0 + width + halo - w)
        tiles.append((a0, width, lo, hi))
        a0 += otile
    return tuple(tiles)


def _split256(y):
    """Exact base-256 bf16 digit pair of a non-negative integer-valued
    f32 array < 2^16 (hi <= 255, lo < 256: both bf16-exact)."""
    hi = jnp.floor(y * F32(1.0 / 256.0))
    lo = y - hi * F32(256.0)
    return lo.astype(BF16), hi.astype(BF16)


def _res_kernel(an_ref, ap_ref, *refs, inclusive: bool,
                mode: str, terms: int, rescale: int, wta: bool,
                zero_disp: int, tiles: tuple, rows: int, halo: int,
                out_t: bool, in_digits: bool, out_digits: bool):
    """One `rows`-row grid step over the whole width.

    an/ap: (rows, W) i32 arms in natural layout.
    vol: (rows, W, D) volume, UNPADDED -- each tile's window is trimmed
    to the array bounds (windows never select out-of-image columns: arms
    stop at the border, so trimming only drops zero band columns).
    out: (rows, W, D) sums; (W, rows, D) when `out_t` (the store is a
    middle-index write, so the next pass's transposed read needs no XLA
    relayout); or (rows, W) f32 disparities when `wta`.
    tiles: static ((a0, width, lo_trim, hi_trim), ...) from _tiles_for.
    256-wide tiles halve the per-unit instruction stream (the measured
    bottleneck -- the kernel is issue-bound, not MXU- or DMA-bound, at
    128).

    in_digits: the volume arrives as TWO bf16 refs holding exact base-256
    digits -- the window loads feed the MXU directly with ZERO per-window
    convert/split ops (the splits were the kernels' largest VPU term at
    1.625x window redundancy; r5).  out_digits stores the pair the same
    way for the next pass.
    """
    if in_digits:
        vlo_ref, vhi_ref, *orefs = refs
    else:
        vol_ref, *orefs = refs

    roffs = {}
    for _, width, _, _ in tiles:
        if width not in roffs:
            o = jax.lax.broadcasted_iota(
                jnp.int32, (width, width + 2 * halo), 0)
            i = jax.lax.broadcasted_iota(
                jnp.int32, (width, width + 2 * halo), 1)
            roffs[width] = i - halo - o   # offset of window pos i from o

    an_all = an_ref[:].T            # (W, rows): one small relayout/step
    ap_all = ap_ref[:].T

    for a0, width, lo, hi in tiles:
        roff = roffs[width]
        win = width + 2 * halo
        for r in range(rows):
            an = an_all[a0:a0 + width, r:r + 1]      # (width, 1)
            ap = ap_all[a0:a0 + width, r:r + 1]
            a = _band01(roff, an, ap, inclusive)[:, lo:win - hi]
            sl = (r, slice(a0 - halo + lo, a0 + width + halo - hi),
                  slice(None))
            if in_digits:
                parts = [(vlo_ref[sl], None), (vhi_ref[sl], F32(256.0))]
            else:
                parts = _terms(vol_ref[sl], mode, terms)
            y = None
            for part, scale in parts:
                dot = jnp.dot(a, part, preferred_element_type=F32)
                if scale is not None:
                    dot = dot * scale
                y = dot if y is None else y + dot
            if rescale:
                y = jnp.floor(y * F32(2.0 ** -rescale) + F32(0.5))
            if wta:
                # Mosaic's native argmin.  Its tie index is deterministic
                # but NOT guaranteed to be the lowest (the reference's
                # first-min rule, d_dc_wta.cu:24-34): at exact integer
                # cost ties (~1% of pixels on the fish pair) the TPU
                # backend may pick a different d than XLA.  Every
                # exact-tie construction measured +20 ms/frame at 1080p
                # (encoded value*D+d min-reduce and min+where+min both;
                # the native argmin reduce is hardware-assisted), and
                # golden fidelity is measurably identical either way, so
                # the trade is documented rather than paid.  Chunking /
                # sharding determinism is unaffected (same backend ==
                # same tie choice).
                am = jnp.argmin(y, axis=1).astype(jnp.int32)
                orefs[0][r, a0:a0 + width] = (am - zero_disp).astype(F32)
            elif out_digits:
                lo_d, hi_d = _split256(y)
                osl = ((slice(a0, a0 + width), r, slice(None)) if out_t
                       else (r, slice(a0, a0 + width), slice(None)))
                orefs[0][osl] = lo_d
                orefs[1][osl] = hi_d
            elif out_t:
                orefs[0][a0:a0 + width, r, :] = y.astype(orefs[0].dtype)
            else:
                orefs[0][r, a0:a0 + width, :] = y.astype(orefs[0].dtype)


@functools.partial(jax.jit, static_argnames=(
    "inclusive", "mode", "terms", "rescale", "wta", "zero_disp", "rows",
    "otile", "out_dtype", "halo", "out_t", "out_digits", "interpret"))
def _band_pass_h(vol, arm_neg: jnp.ndarray,
                 arm_pos: jnp.ndarray, *, inclusive: bool = False,
                 mode: str = "float", terms: int = 2, rescale: int = 0,
                 wta: bool = False, zero_disp: int = 0, rows: int = _ROWS,
                 otile: int = _LANE, out_dtype=jnp.float32,
                 halo: int = _HALO, out_t: bool = False,
                 out_digits: bool = False,
                 interpret: bool = False):
    """Windowed sum along axis 1 of a (H, W, D) volume (see _res_kernel).
    out_dtype int16 is valid when every output fits in [-32768, 32767]
    (the quantized pipeline's rescales guarantee it) and halves the HBM
    traffic of the intermediate volumes.  `halo` must cover the arm bound
    (_halo_for(max_arm)); smaller halos shrink every window slice and
    band matrix.  out_t=True returns (W, H, D) via transposed in-kernel
    stores -- the next (vertical) pass reads it directly, with no
    full-volume XLA relayout.

    `vol` may be a (lo, hi) TUPLE of bf16 base-256 digit volumes (the
    pre-split inter-pass format, r5): the window loads then feed the MXU
    with no per-window convert/split work.  out_digits=True returns such
    a pair (valid when every output is a non-negative integer < 2^16 --
    the quantized rescales guarantee < 2^15).

    The volume is read UNPADDED when H is a `rows`-multiple and W is an
    8-multiple (every shipping config); otherwise a one-off pad copy
    aligns it."""
    in_digits = isinstance(vol, (tuple, list))
    vols = list(vol) if in_digits else [vol]
    h0, w0, d = vols[0].shape
    h, w = h0, w0
    if h % rows or w % 8:
        hp = -(-h // rows) * rows
        wp = -(-w // 8) * 8
        vols = [jnp.pad(v, ((0, hp - h), (0, wp - w), (0, 0)))
                for v in vols]
        zpad = ((0, hp - h), (0, wp - w))
        arm_neg = jnp.pad(arm_neg.astype(jnp.int32), zpad)
        arm_pos = jnp.pad(arm_pos.astype(jnp.int32), zpad)
        h, w = hp, wp
    tiles = _tiles_for(w, otile, halo)

    an_n = arm_neg.astype(jnp.int32)
    ap_n = arm_pos.astype(jnp.int32)

    arm_spec = pl.BlockSpec((rows, w), lambda y: (y, 0),
                            memory_space=pltpu.VMEM)
    vol_spec = pl.BlockSpec((rows, w, d), lambda y: (y, 0, 0),
                            memory_space=pltpu.VMEM)
    if wta:
        out_spec = pl.BlockSpec((rows, w), lambda y: (y, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((h, w), jnp.float32)
    elif out_t:
        out_spec = pl.BlockSpec((w, rows, d), lambda y: (0, y, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((w, h, d),
                                         BF16 if out_digits else out_dtype)
    else:
        out_spec = pl.BlockSpec((rows, w, d), lambda y: (y, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((h, w, d),
                                         BF16 if out_digits else out_dtype)
    nouts = 2 if out_digits else 1

    out = pl.pallas_call(
        functools.partial(_res_kernel, inclusive=inclusive, mode=mode,
                          terms=terms, rescale=rescale, wta=wta,
                          zero_disp=zero_disp, tiles=tiles, rows=rows,
                          halo=halo, out_t=out_t, in_digits=in_digits,
                          out_digits=out_digits),
        grid=(h // rows,),
        in_specs=[arm_spec, arm_spec] + [vol_spec] * len(vols),
        out_specs=[out_spec] * nouts if out_digits else out_spec,
        out_shape=[out_shape] * nouts if out_digits else out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(an_n, ap_n, *vols)
    outs = list(out) if out_digits else [out]
    if (h, w) != (h0, w0):
        if wta:
            outs = [o[:h0, :w0] for o in outs]
        else:
            outs = [o[:w0, :h0] if out_t else o[:h0, :w0] for o in outs]
    return tuple(outs) if out_digits else outs[0]


def _vv_kernel(an_ref, ap_ref, *refs, s2: int,
               s3: int, tiles: tuple, rows: int, halo: int, digits: int,
               out_t: bool, in_digits: bool, out_digits: bool):
    """Fused passes 2+3 (the two V-passes share one window axis and one
    arm pair): pass-2 sums from the int16 volume, rescale by 2^-s2, split
    into base-256 bf16 digits held in VMEM scratch, pass-3 sums from the
    digits, rescale by 2^-s3, store int16.  Saves the intermediate
    volume's HBM round trip and one kernel launch per aggregation.

    Both passes use the SAME band matrix per (tile, row) (same arms, same
    window geometry), so the tiles are software-pipelined per row --
    pass 3 of tile k runs right after pass 2 of tile k+1, reusing tile
    k's band (its pass-2 digits through column a0_k + width_k + halo are
    in scratch by then since every width >= 128 >= halo).  This halves
    the band-build VPU work, the measured bottleneck of the issue-bound
    kernel.

    digits=2: exact base-256 digit pair (values < 2^15).  digits=1: the
    rescales keep every value < 256, one bf16 plane, one dot per pass
    (the fast path; final WTA precision drops ~4 bits per pass, see
    agg_rescale_shifts).

    vol is UNPADDED (pass-2 windows trim to the array bounds, see
    _tiles_for); scratch: `digits` planes of (rows, L + 2*halo, D) bf16
    with zero halo strips, so pass 3 reads untrimmed windows.  out_t
    stores (L, rows, D) -- pass 4 then reads (H, W, D) directly.

    in_digits / out_digits: pre-split bf16 base-256 digit pairs on the
    HBM side (see _res_kernel), killing pass-2's per-window split ops
    and pass-4's downstream ones."""
    if in_digits:
        vlo_ref, vhi_ref, *orefs = refs
    else:
        vol_ref, *orefs = refs
    nscr = digits
    scratch = orefs[len(orefs) - nscr:]
    orefs = orefs[:len(orefs) - nscr]
    roffs = {}
    for _, width, _, _ in tiles:
        if width not in roffs:
            o = jax.lax.broadcasted_iota(
                jnp.int32, (width, width + 2 * halo), 0)
            i = jax.lax.broadcasted_iota(
                jnp.int32, (width, width + 2 * halo), 1)
            roffs[width] = i - halo - o

    lo_ref = scratch[0]

    an_all = an_ref[:].T
    ap_all = ap_ref[:].T

    # zero the scratch halo strips (window reach beyond the output span)
    d = lo_ref.shape[-1]
    z = jnp.zeros((rows, halo, d), BF16)
    for ref in scratch:
        ref[:, :halo, :] = z
        ref[:, ref.shape[1] - halo:, :] = z

    def pass2(a0, width, band, lo_t, hi_t, r):
        win = width + 2 * halo
        sl = (r, slice(a0 - halo + lo_t, a0 + width + halo - hi_t),
              slice(None))
        if in_digits:
            parts = [(vlo_ref[sl], None), (vhi_ref[sl], F32(256.0))]
        else:
            parts = _terms(vol_ref[sl], "int", digits)
        y = None
        for part, scale in parts:
            dot = jnp.dot(band[:, lo_t:win - hi_t], part,
                          preferred_element_type=F32)
            if scale is not None:
                dot = dot * scale
            y = dot if y is None else y + dot
        y = jnp.floor(y * F32(2.0 ** -s2) + F32(0.5))
        # base-256 digit planes into scratch (1, 2 or 3 -- exact for
        # values < 256^digits)
        rem = y
        for k in range(digits - 1, 0, -1):
            base = F32(float(256 ** k))
            dig = jnp.floor(rem * (F32(1.0) / base))
            rem = rem - dig * base
            scratch[k][r, halo + a0:halo + a0 + width, :] = \
                dig.astype(BF16)
        lo_ref[r, halo + a0:halo + a0 + width, :] = rem.astype(BF16)

    def pass3(a0, width, band, r):
        y = None
        for k, ref in enumerate(scratch):
            part = ref[r, a0:a0 + width + 2 * halo, :]
            dot = jnp.dot(band, part, preferred_element_type=F32)
            if k:
                dot = dot * F32(float(256 ** k))
            y = dot if y is None else y + dot
        y = jnp.floor(y * F32(2.0 ** -s3) + F32(0.5))
        osl = ((slice(a0, a0 + width), r, slice(None)) if out_t
               else (r, slice(a0, a0 + width), slice(None)))
        if out_digits:
            lo_d, hi_d = _split256(y)
            orefs[0][osl] = lo_d
            orefs[1][osl] = hi_d
        else:
            orefs[0][osl] = y.astype(orefs[0].dtype)

    for r in range(rows):
        prev = None                    # (a0, width, band) awaiting pass 3
        for a0, width, lo_t, hi_t in tiles:
            roff = roffs[width]
            an = an_all[a0:a0 + width, r:r + 1]
            ap = ap_all[a0:a0 + width, r:r + 1]
            band = _band01(roff, an, ap, False)
            pass2(a0, width, band, lo_t, hi_t, r)
            if prev is not None:
                pass3(*prev, r)
            prev = (a0, width, band)
        pass3(*prev, r)


@functools.partial(jax.jit, static_argnames=("s2", "s3", "rows", "otile",
                                             "halo", "digits", "out_t",
                                             "out_digits", "out_dtype",
                                             "interpret"))
def _band_pass_vv(vol, arm_neg: jnp.ndarray,
                  arm_pos: jnp.ndarray, *, s2: int, s3: int,
                  rows: int = _ROWS, otile: int = _LANE,
                  halo: int = _HALO, digits: int = 2, out_t: bool = False,
                  out_digits: bool = False, out_dtype=None,
                  interpret: bool = False):
    """Both V-passes of the quantized aggregation in one kernel (see
    _vv_kernel).  Bit-identical to two _band_pass_h(mode='int',
    terms=digits) calls with rescales s2 then s3.  Input is read
    unpadded (aligned shapes); out_t stores the (W, H, D)-shaped result
    for a (W, H, D)-shaped input, i.e. back in natural orientation.
    `vol` may be a (lo, hi) bf16 digit pair and out_digits returns one
    (see _band_pass_h)."""
    in_digits = isinstance(vol, (tuple, list))
    vols = list(vol) if in_digits else [vol]
    h0, w0, d = vols[0].shape
    h, w = h0, w0
    if h % rows or w % 8:
        hp = -(-h // rows) * rows
        wp = -(-w // 8) * 8
        vols = [jnp.pad(v, ((0, hp - h), (0, wp - w), (0, 0)))
                for v in vols]
        zpad = ((0, hp - h), (0, wp - w))
        arm_neg = jnp.pad(arm_neg.astype(jnp.int32), zpad)
        arm_pos = jnp.pad(arm_pos.astype(jnp.int32), zpad)
        h, w = hp, wp
    tiles = _tiles_for(w, otile, halo)

    an_n = arm_neg.astype(jnp.int32)
    ap_n = arm_pos.astype(jnp.int32)
    odt = out_dtype if out_dtype is not None else (
        jnp.int32 if digits >= 3 else jnp.int16)

    arm_spec = pl.BlockSpec((rows, w), lambda y: (y, 0),
                            memory_space=pltpu.VMEM)
    vol_spec = pl.BlockSpec((rows, w, d), lambda y: (y, 0, 0),
                            memory_space=pltpu.VMEM)
    if out_t:
        out_spec = pl.BlockSpec((w, rows, d), lambda y: (0, y, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (w, h, d), BF16 if out_digits else odt)
    else:
        out_spec = pl.BlockSpec((rows, w, d), lambda y: (y, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (h, w, d), BF16 if out_digits else odt)
    scratch = pltpu.VMEM((rows, w + 2 * halo, d), BF16)
    nouts = 2 if out_digits else 1

    out = pl.pallas_call(
        functools.partial(_vv_kernel, s2=s2, s3=s3, tiles=tiles, rows=rows,
                          halo=halo, digits=digits, out_t=out_t,
                          in_digits=in_digits, out_digits=out_digits),
        grid=(h // rows,),
        in_specs=[arm_spec, arm_spec] + [vol_spec] * len(vols),
        out_specs=[out_spec] * nouts if out_digits else out_spec,
        out_shape=[out_shape] * nouts if out_digits else out_shape,
        scratch_shapes=[scratch] * digits,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(an_n, ap_n, *vols)
    outs = list(out) if out_digits else [out]
    if (h, w) != (h0, w0):
        outs = [o[:w0, :h0] if out_t else o[:h0, :w0] for o in outs]
    return tuple(outs) if out_digits else outs[0]


def band_span_sum_h(vol: jnp.ndarray, arm_neg: jnp.ndarray,
                    arm_pos: jnp.ndarray, inclusive: bool = False,
                    nsplit: int = 2, max_arm: int = _HALO,
                    interpret: bool = False) -> jnp.ndarray:
    """Windowed sum along axis 1 of a (H, W, D) volume.

    out[y, x, d] = sum_{j in win(y,x)} vol[y, j, d], win = [x - arm_neg,
    x + arm_pos) (half-open; `inclusive` closes the right end, IRV-style).
    arm_* are (H, W) integer arrays bounded by `max_arm` <= 64 (the
    kernel contracts a usd-adaptive window around each tile); windows
    must not cross the image border (cross-arm construction guarantees
    it).
    nsplit: bf16 terms for the volume (1 = exact for small-integer
    volumes, 2 = ~1e-5 relative, 3 = ~f32).
    """
    return _band_pass_h(vol, arm_neg, arm_pos, inclusive=inclusive,
                        mode="float", terms=nsplit,
                        halo=_halo_for(max_arm), interpret=interpret)


def band_span_sum_v(vol: jnp.ndarray, arm_neg: jnp.ndarray,
                    arm_pos: jnp.ndarray, inclusive: bool = False,
                    nsplit: int = 2, max_arm: int = _HALO,
                    interpret: bool = False) -> jnp.ndarray:
    """Windowed sum along axis 0 of a (H, W, D) volume: the H kernel on a
    (W, H, D) transpose (the reference's own trick, d_ca_cross.cu:255-270;
    XLA transposes are bandwidth-bound, unlike gathers)."""
    vt = jnp.swapaxes(vol, 0, 1)
    out = band_span_sum_h(vt, arm_neg.T, arm_pos.T, inclusive=inclusive,
                          nsplit=nsplit, max_arm=max_arm,
                          interpret=interpret)
    return jnp.swapaxes(out, 0, 1)


def quantize_cost(cost: jnp.ndarray,
                  qscale: float = QSCALE) -> jnp.ndarray:
    """cost (f32, in [0, 2]) -> round(cost * qscale) integers: bf16 for
    qscale <= 127 (values <= 254, bf16-exact), int16 above (the
    band_qscale fidelity dial).  The quantized band engine's single
    lossy step."""
    q = jnp.rint(cost.astype(F32) * F32(qscale))
    return q.astype(BF16) if qscale <= 127.5 else q.astype(jnp.int16)


def _qmax(qscale: float) -> int:
    """Largest quantized cost value (cost <= 2.0)."""
    return int(round(2.0 * qscale))


def agg_rescale_shifts(max_arm: int, digits: int = 2,
                       qscale: float = QSCALE):
    """Power-of-2 rescale shifts (s1, s2, s3: applied after passes 1, 2
    and 3) for the quantized aggregation.

    digits=2 (exact path): the smallest shifts that keep every pass's
    input below 2^15 (int16-storable, two bf16-exact base-256 digits) and
    every accumulation below 2^24 (f32-exact); s1 = 0.  digits=1 (fast
    path): inputs stay below 2^8 (ONE bf16-exact digit -> one MXU dot per
    pass), which costs ~4 bits of aggregate precision per rescale --
    WTA flips only at near-ties (measured on the bud/fish fixtures,
    BASELINE.md).  digits=3 (high-fidelity dial, r5): inputs bounded by
    (2^24-1)/wmax so every accumulation stays f32-exact with THREE
    base-256 digits -- the rescales keep ~17-18 bits per pass instead of
    15, at 3 MXU dots per pass.  The r5 qscale sweep showed the bad-pixel
    residual is FLAT in qscale (the shifts grow with it), so the
    per-pass bound -- i.e. digits -- is the real fidelity lever.
    Smaller arms need smaller shifts -> finer values.
    """
    import math
    wmax = 2 * max_arm + 1
    if digits >= 3:
        bound = float((1 << 24) - 1) / wmax
    else:
        bound = 32767.0 if digits == 2 else 255.0
    v = _qmax(qscale)
    shifts = []
    for _ in range(3):                       # after passes 1, 2, 3
        raw = v * wmax
        s = max(0, math.ceil(math.log2(raw / bound)))
        shifts.append(s)
        v = math.floor(raw * 2.0 ** -s + 0.5)
    if digits == 2 and qscale <= QSCALE:
        assert shifts[0] == 0
    return tuple(shifts)


def band_aggregate_q(cost_q: jnp.ndarray, arms: jnp.ndarray, max_arm: int,
                     zero_disp: int | None = None,
                     interpret: bool = False, rows: int = _ROWS,
                     otile: int = _LANE,
                     digits: int = 2,
                     final_out_t: bool = False,
                     qscale: float = QSCALE,
                     digit_pair: bool = False,
                     inter_dtype=None,
                     lossy_wta: bool = False) -> jnp.ndarray:
    """Four-pass cross aggregation (live order H,V,V,H, d_ca_cross.cu:
    255-271) on a quantized (H, W, D) volume of integers <= 254 (see
    quantize_cost), with exact integer arithmetic throughout; `max_arm`
    (= usd <= 64) bounds the windows (usd-adaptive halo) and fixes the
    rescale shifts.

    digits=2 (default): base-256 bf16 digit pairs, values < 2^15 -- the
    exact path.  digits=1: stronger rescales keep every value < 2^8 so
    each of passes 2-4 is ONE bf16 dot (half the MXU work) at ~4 bits of
    aggregate precision per rescale (cfg.band_digits selects this;
    WTA-flip fidelity measured on bud/fish in BASELINE.md).

    With zero_disp set, WTA (first-min argmin, d_dc_wta.cu:24-34) is fused
    into pass 4 and the return is the (H, W) f32 disparity map; otherwise
    the final (H, W, D) aggregated volume (exact integers at scale
    QSCALE / 2^(s1+s2+s3) of the reference's unit) is returned.  Either
    way the result is bit-identical under any row chunking or sharding.

    lossy_wta (requires zero_disp; cfg.band_lossy_wta): pass 4 feeds the
    WTA argmin through ONE bf16 dot of the whole int volume (8 mantissa
    bits) instead of `digits` exact digit dots -- the aggregate is only
    an argmin input there, so the rounding can flip WTA only at near-ties
    (measured 0.0003/0.0004 of bud pixels, fish identical; BASELINE.md
    r5).  Deterministic and row-local, so chunking/sharding still
    reproduce bit-identically; only exactness vs the f32-scaled golden
    is relaxed.
    """
    from stereo_to_multiview_tpu.ops.cross import UP, DOWN, LEFT, RIGHT
    s1, s2, s3 = agg_rescale_shifts(max_arm, digits, qscale)
    halo = _halo_for(max_arm)
    # pass-1 digit dots: quantized costs <= 254 are one bf16 digit; the
    # band_qscale dial's larger values split into base-256 pairs (exact)
    p1_terms = 1 if _qmax(qscale) <= 255 else 2
    # intermediate volumes are int16: pass-1 output <= 254*129 = 32766 and
    # the rescales keep passes 2/3 below 2^15 -- half the HBM bytes of f32.
    # Orientation rides the transposed in-kernel stores: pass 1 emits
    # (W, H, D), the fused V-passes read it directly and emit (H, W, D)
    # for pass 4 -- zero full-volume XLA relayouts (round 2 paid two
    # swapaxes + three pads per aggregation, ~8 GB of HBM copies/frame).
    # inter-pass store dtype: int16 holds the digits<=2 bounds; the
    # digits=3 fidelity dial's ~18-bit values ride int32
    if inter_dtype is None:
        inter_dtype = jnp.int32 if digits >= 3 else jnp.int16
    i16 = inter_dtype
    # transposed in-kernel stores need full 128-lane tiles on D (Mosaic
    # has no narrow-lane middle-index store); smaller D falls back to
    # XLA swapaxes between passes (those volumes are 128/D x smaller)
    out_t = cost_q.shape[-1] % 128 == 0
    # pre-split bf16 digit-pair inter-pass volumes: each pass's window
    # loads feed the MXU with ZERO convert/split ops.  MEASURED SLOWER
    # on v5e (r5 agg_probe: VV 6.5 -> ~7.2, pass1 3.9 -> 5.9 net of
    # harness overhead): the kernels sit near their DMA budget, and the
    # 2x HBM of two bf16 planes vs one int16 costs more than the split
    # ops save.  The path stays available (digit_pair=True) as the
    # documented-rejected lever; results are bit-identical either way.
    pair = digit_pair and digits == 2 and out_t
    kw = dict(rows=rows, otile=otile, halo=halo, interpret=interpret)
    at = _band_pass_h(cost_q, arms[LEFT], arms[RIGHT], mode="int",
                      terms=p1_terms, rescale=s1, out_dtype=i16,
                      out_t=out_t, out_digits=pair, **kw)
    if not out_t:
        at = jnp.swapaxes(at, 0, 1)
    a = _band_pass_vv(at, arms[UP].T, arms[DOWN].T, s2=s2, s3=s3,
                      rows=rows, otile=otile, halo=halo, digits=digits,
                      out_t=out_t, out_digits=pair, out_dtype=i16,
                      interpret=interpret)
    if not out_t:
        a = jnp.swapaxes(a, 0, 1)
    if zero_disp is None:
        # final_out_t: emit the aggregated volume (W, H, D) via the same
        # transposed in-kernel stores the inter-pass chain uses (the
        # fused HSLO kernel's native orientation); falls back to an XLA
        # swap when D is not 128-aligned
        if final_out_t and out_t:
            # int32 output: the rescale shifts bound each pass's INPUT
            # below 2^15, but pass-4's OUTPUT is input * window (up to
            # ~1.4M at usd=34 -- measured 284k on the fish fixture, so
            # int16 would wrap); int32 keeps the volume exact and half
            # the size of f32
            return _band_pass_h(a, arms[LEFT], arms[RIGHT], mode="int",
                                terms=digits, out_t=True,
                                out_dtype=jnp.int32, **kw)
        vol = _band_pass_h(a, arms[LEFT], arms[RIGHT], mode="int",
                           terms=digits,
                           out_dtype=jnp.int32 if final_out_t
                           else jnp.float32, **kw)
        return jnp.swapaxes(vol, 0, 1) if final_out_t else vol
    if lossy_wta:
        # one bf16 cast of the int volume (mode float, 1 term): the dot
        # rounds to 8 mantissa bits, which only matters at WTA near-ties
        return _band_pass_h(a, arms[LEFT], arms[RIGHT], mode="float",
                            terms=1, wta=True, zero_disp=zero_disp, **kw)
    return _band_pass_h(a, arms[LEFT], arms[RIGHT], mode="int",
                        terms=digits, wta=True, zero_disp=zero_disp, **kw)


def cross_aggregate_band(cost_hwd: jnp.ndarray, arms: jnp.ndarray,
                         nsplit: int = 2, interpret: bool = False,
                         max_arm: int = _HALO) -> jnp.ndarray:
    """Quantized four-pass cross aggregation of an (H, W, D) f32 cost
    volume: quantize_cost then band_aggregate_q.  Returns the final
    aggregated volume (exact integers; argmin-compatible with the
    reference's f32 aggregate up to the initial 1/127 quantization and
    the rescale rounding).

    `nsplit` is deprecated: the quantized-integer path replaced the f32
    bf16-split aggregation in round 2, so the output is exact integers at
    scale QSCALE / 2^(s2+s3) rather than ~f32 reference units.  Passing a
    non-default value warns (it used to select bf16 accuracy)."""
    if nsplit != 2:
        import warnings
        warnings.warn(
            "cross_aggregate_band(nsplit=...) is deprecated and ignored: "
            "the aggregation is exact quantized-integer (see band.py "
            "module docstring); output scale is QSCALE / 2^(s2+s3)",
            DeprecationWarning, stacklevel=2)
    return band_aggregate_q(quantize_cost(cost_hwd), arms, max_arm,
                            interpret=interpret)


def cross_aggregate_band_lr(cost_l, cost_r, arms_l, arms_r,
                            nsplit: int = 2, interpret: bool = False):
    """Aggregate both eyes in one four-pass sequence by stacking the
    volumes along H -- halves the kernel-call count (same FLOPs, less
    per-call/grid fixed cost).  Arms stop at their own image border by
    construction, so no window ever crosses the eye boundary."""
    h = cost_l.shape[0]
    cost = jnp.concatenate([cost_l, cost_r], axis=0)
    arms = jnp.concatenate([arms_l, arms_r], axis=1)
    a = cross_aggregate_band(cost, arms, nsplit=nsplit, interpret=interpret)
    return a[:h], a[h:]


def dr_irv_band_lr(disp_l, outl_l, disp_r, outl_r, arms_l, arms_r,
                   thresh_s, thresh_h, num_disp, zero_disp, usd, iterations,
                   interpret: bool = False):
    """dr_irv_band on both eyes stacked along H (see
    cross_aggregate_band_lr for why stacking is sound)."""
    h = disp_l.shape[0]
    disp = jnp.concatenate([disp_l, disp_r], axis=0)
    outl = jnp.concatenate([outl_l, outl_r], axis=0)
    arms = jnp.concatenate([arms_l, arms_r], axis=1)
    d, o = dr_irv_band(disp, outl, arms, thresh_s, thresh_h, num_disp,
                       zero_disp, usd, iterations, interpret)
    return (d[:h], o[:h]), (d[h:], o[h:])


# ---------------------------------------------------------------------------
# Disparity-major aggregation: the whole 4-pass sequence in the cost
# kernel's native (2D, H, W) layout (both eyes stacked on the leading /
# sublane axis).
#
# The lane-major path pays two (D, H, W) <-> (H, W, D) relayouts (~15 ms
# each for a 1080p volume -- the largest single cost in the round-2 core)
# plus a 1 GB eye concat.  Disparity-major, every pass is still a banded
# matmul -- dot((2D, win), (win, otile)) with D riding the sublanes and
# the window axis on the lanes -- so the only layout churn left is one
# batched minor-dim swap (D, H, W) <-> (D, W, H) before and after the
# fused V-passes, and WTA becomes a sublane argmin.  Per-eye band
# matrices select the [0:D) / [D:2D) sublane halves.
#
# Numerics are the unchanged quantized-integer scheme, so results are
# bit-identical to band_aggregate_q composed with the layout moves.
# ---------------------------------------------------------------------------


def _dm_tiles(w: int, otile: int):
    wp = -(-w // _LANE) * _LANE
    tiles, a0 = [], 0
    while a0 < wp:
        tiles.append((a0, min(otile, wp - a0)))
        a0 += otile
    return wp, tuple(tiles)


def _dm_ioffs(tiles, halo: int = _HALO):
    """(win, width) window-offset iotas per distinct tile width (window
    position i at lane a0 + i - halo, output at lane a0 + o)."""
    out = {}
    for _, width in tiles:
        if width not in out:
            i = jax.lax.broadcasted_iota(
                jnp.int32, (width + 2 * halo, width), 0)
            o = jax.lax.broadcasted_iota(
                jnp.int32, (width + 2 * halo, width), 1)
            out[width] = i - halo - o
    return out


def _dm_digits(x):
    """(S, win) int16 -> exact base-256 bf16 digit pair."""
    xf = x.astype(F32)
    hi = jnp.floor(xf * F32(1.0 / 256.0))
    lo = xf - hi * F32(256.0)
    return lo.astype(BF16), hi.astype(BF16)


def _dm_pack_arms(an_l, ap_l, an_r, ap_r):
    """Pack the four arm planes (values <= 64) into one i32 plane: byte e*2
    holds eye e's negative reach, byte e*2+1 its positive reach.  One VMEM
    input block instead of four (the pass-4 kernel was 120 KB over the
    16 MB scoped-vmem budget at 1080p with separate planes)."""
    i32 = jnp.int32
    return (an_l.astype(i32) | (ap_l.astype(i32) << 8)
            | (an_r.astype(i32) << 16) | (ap_r.astype(i32) << 24))


def _dm_unpack_arms(arms_ref, r, a0, width, e):
    """(1, width) negative/positive reach for eye e from the packed plane."""
    p = arms_ref[r:r + 1, a0:a0 + width]
    an = jax.lax.shift_right_logical(p, 16 * e) & 0x7F
    ap = jax.lax.shift_right_logical(p, 16 * e + 8) & 0x7F
    return an, ap


def _pass1_dm_kernel(arms_ref, vol_ref, out_ref, *,
                     num_disp: int, tiles: tuple, rows: int):
    """Pass 1 (H span sum) disparity-major: vol (2D, rows, WP + 128) bf16
    quantized costs, packed arms (rows, WP) i32, out (2D, rows, WP) i16."""
    ioffs = _dm_ioffs(tiles)
    for a0, width in tiles:
        ioff = ioffs[width]
        for r in range(rows):
            x = vol_ref[:, r, a0:a0 + width + 2 * _HALO]   # (2D, win)
            for e in range(2):
                an, ap = _dm_unpack_arms(arms_ref, r, a0, width, e)
                band = _band01(ioff, an, ap, False)
                xe = x[e * num_disp:(e + 1) * num_disp]
                if xe.dtype == jnp.uint8:
                    xe = xe.astype(jnp.int32)
                xe = xe.astype(BF16)
                y = jnp.dot(xe, band, preferred_element_type=F32)
                out_ref[e * num_disp:(e + 1) * num_disp, r,
                        a0:a0 + width] = y.astype(out_ref.dtype)


def _vv_dm_kernel(arms_ref, vol_ref, out_ref, lo_ref, hi_ref, *,
                  num_disp: int, s2: int, s3: int, tiles: tuple,
                  rows: int):
    """Fused V passes 2+3 disparity-major: vol (2D, rows, HP + 128) i16
    (transposed: lanes = per-eye image rows), packed U/D arms transposed
    (rows, HP) i32, digit scratches (2D, rows, HP + 256) bf16.

    The scratch gives image lane c the position 128 + c so every store
    lands 128-aligned (Mosaic miscompiles lane stores at offset 64);
    pass 3 then reads aligned 2*128-halo windows whose extra positions
    carry zero band rows."""
    ioffs2 = _dm_ioffs(tiles)                    # pass-2 vol windows
    ioffs3 = _dm_ioffs(tiles, halo=2 * _HALO)    # pass-3 scratch windows
    d2 = lo_ref.shape[0]
    hp2 = out_ref.shape[2]
    z = jnp.zeros((d2, rows, 2 * _HALO), BF16)
    for ref in (lo_ref, hi_ref):
        ref[:, :, :2 * _HALO] = z
        ref[:, :, hp2 + 2 * _HALO:] = z

    for a0, width in tiles:              # pass 2 -> scratch digits
        ioff = ioffs2[width]
        for r in range(rows):
            x = vol_ref[:, r, a0:a0 + width + 2 * _HALO]
            lo, hi = _dm_digits(x)
            for e in range(2):
                an, ap = _dm_unpack_arms(arms_ref, r, a0, width, e)
                band = _band01(ioff, an, ap, False)
                sl = slice(e * num_disp, (e + 1) * num_disp)
                y = (jnp.dot(lo[sl], band, preferred_element_type=F32)
                     + jnp.dot(hi[sl], band,
                               preferred_element_type=F32) * F32(256.0))
                y = jnp.floor(y * F32(2.0 ** -s2) + F32(0.5))
                yh = jnp.floor(y * F32(1.0 / 256.0))
                yl = y - yh * F32(256.0)
                lo_ref[sl, r, 2 * _HALO + a0:2 * _HALO + a0 + width] = \
                    yl.astype(BF16)
                hi_ref[sl, r, 2 * _HALO + a0:2 * _HALO + a0 + width] = \
                    yh.astype(BF16)

    for a0, width in tiles:              # pass 3 <- scratch digits
        ioff = ioffs3[width]
        for r in range(rows):
            lo = lo_ref[:, r, a0:a0 + width + 4 * _HALO]
            hi = hi_ref[:, r, a0:a0 + width + 4 * _HALO]
            for e in range(2):
                an, ap = _dm_unpack_arms(arms_ref, r, a0, width, e)
                band = _band01(ioff, an, ap, False)
                sl = slice(e * num_disp, (e + 1) * num_disp)
                y = (jnp.dot(lo[sl], band, preferred_element_type=F32)
                     + jnp.dot(hi[sl], band,
                               preferred_element_type=F32) * F32(256.0))
                y = jnp.floor(y * F32(2.0 ** -s3) + F32(0.5))
                out_ref[sl, r, a0:a0 + width] = y.astype(out_ref.dtype)


def _pass4_dm_kernel(arms_ref, vol_ref, outl_ref, outr_ref, *,
                     num_disp: int, zero_disp: int, tiles: tuple,
                     rows: int):
    """Pass 4 + fused WTA disparity-major: vol (2D, rows, WP + 128) i16,
    outputs (rows, WP) f32 disparities per eye.  First-min argmin over
    the D sublanes (d_dc_wta.cu:24-34 tie rule)."""
    ioffs = _dm_ioffs(tiles)
    big = jnp.int32(num_disp)
    for a0, width in tiles:
        ioff = ioffs[width]
        for r in range(rows):
            x = vol_ref[:, r, a0:a0 + width + 2 * _HALO]
            lo, hi = _dm_digits(x)
            for e, out_ref in enumerate((outl_ref, outr_ref)):
                sl = slice(e * num_disp, (e + 1) * num_disp)
                an, ap = _dm_unpack_arms(arms_ref, r, a0, width, e)
                band = _band01(ioff, an, ap, False)
                y = (jnp.dot(lo[sl], band, preferred_element_type=F32)
                     + jnp.dot(hi[sl], band,
                               preferred_element_type=F32) * F32(256.0))
                minv = jnp.min(y, axis=0, keepdims=True)   # (1, width)
                d_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (num_disp, width), 0)
                am = jnp.min(jnp.where(y == minv, d_iota, big), axis=0)
                out_ref[r, a0:a0 + width] = (
                    am - zero_disp).astype(jnp.float32)


def _dm_specs(d2: int, rows: int, wp: int):
    arm_spec = pl.BlockSpec((rows, wp), lambda y: (y, 0),
                            memory_space=pltpu.VMEM)
    vol_spec = pl.BlockSpec((d2, rows, wp + 2 * _HALO),
                            lambda y: (0, y, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((d2, rows, wp), lambda y: (0, y, 0),
                            memory_space=pltpu.VMEM)
    return [arm_spec, vol_spec], out_spec, arm_spec


def _dm_pad(vol, arms_list, rows, wp, w):
    """Zero-pad volume lanes by the window halo (padded lanes are never
    selected by any band -- arms stop at the image border -- but must
    exist and be finite); pack + pad the four arm planes to one i32 plane
    on the padded grid."""
    d2, h, _ = vol.shape
    hp = -(-h // rows) * rows
    vol = jnp.pad(vol, ((0, 0), (0, hp - h), (_HALO, _HALO + wp - w)))
    arms = jnp.pad(_dm_pack_arms(*arms_list),
                   ((0, hp - h), (0, wp - w)))
    return vol, arms, hp


@functools.partial(jax.jit, static_argnames=(
    "num_disp", "zero_disp", "max_arm", "rows", "otile", "interpret"))
def band_aggregate_q_dm(cost2, arms_l, arms_r, *, num_disp: int,
                        zero_disp: int, max_arm: int, rows: int = _ROWS,
                        otile: int = _LANE, interpret: bool = False):
    """Four-pass quantized cross aggregation + fused WTA, entirely in the
    cost kernel's (2D, H, W) disparity-major layout (left eye on sublanes
    [0, D), right on [D, 2D)).  Returns (disp_l, disp_r) (H, W) f32,
    bit-identical to the lane-major band_aggregate_q path (same integer
    arithmetic; layout only).  Aggregation order H,V,V,H per
    d_ca_cross.cu:255-271."""
    from stereo_to_multiview_tpu.ops.cross import UP, DOWN, LEFT, RIGHT
    if max_arm > _HALO:
        raise ValueError("band aggregation requires max_arm (usd) <= 64")
    _, s2, s3 = agg_rescale_shifts(max_arm)
    d2, h, w = cost2.shape
    cparams = pltpu.CompilerParams(dimension_semantics=("parallel",),
                                   vmem_limit_bytes=_VMEM_LIMIT)

    # pass 1: H span sum on (2D, H, W)
    wp, tiles = _dm_tiles(w, otile)
    vol, arms, hp = _dm_pad(
        cost2, (arms_l[LEFT], arms_l[RIGHT], arms_r[LEFT], arms_r[RIGHT]),
        rows, wp, w)
    in_specs, out_spec, _ = _dm_specs(d2, rows, wp)
    s1 = pl.pallas_call(
        functools.partial(_pass1_dm_kernel, num_disp=num_disp,
                          tiles=tiles, rows=rows),
        grid=(hp // rows,),
        in_specs=in_specs, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((d2, hp, wp), jnp.int16),
        compiler_params=cparams, interpret=interpret,
    )(arms, vol)[:, :h, :w]

    # fused passes 2+3: V span sums on the (2D, W, H) minor-swap
    hp2, tiles2 = _dm_tiles(h, otile)
    volt, armst, wpr = _dm_pad(
        jnp.swapaxes(s1, 1, 2),
        (arms_l[UP].T, arms_l[DOWN].T, arms_r[UP].T, arms_r[DOWN].T),
        rows, hp2, h)
    in_specs2, out_spec2, _ = _dm_specs(d2, rows, hp2)
    scratch = pltpu.VMEM((d2, rows, hp2 + 4 * _HALO), BF16)
    vv = pl.pallas_call(
        functools.partial(_vv_dm_kernel, num_disp=num_disp, s2=s2, s3=s3,
                          tiles=tiles2, rows=rows),
        grid=(wpr // rows,),
        in_specs=in_specs2, out_specs=out_spec2,
        out_shape=jax.ShapeDtypeStruct((d2, wpr, hp2), jnp.int16),
        scratch_shapes=[scratch, scratch],
        compiler_params=cparams, interpret=interpret,
    )(armst, volt)[:, :w, :h]

    # pass 4 + WTA back on (2D, H, W)
    vol4, arms4, hp4 = _dm_pad(
        jnp.swapaxes(vv, 1, 2),
        (arms_l[LEFT], arms_l[RIGHT], arms_r[LEFT], arms_r[RIGHT]),
        rows, wp, w)
    in_specs4, _, arm_spec4 = _dm_specs(d2, rows, wp)
    dspec = pl.BlockSpec((rows, wp), lambda y: (y, 0),
                         memory_space=pltpu.VMEM)
    disp_l, disp_r = pl.pallas_call(
        functools.partial(_pass4_dm_kernel, num_disp=num_disp,
                          zero_disp=zero_disp, tiles=tiles, rows=rows),
        grid=(hp4 // rows,),
        in_specs=in_specs4, out_specs=(dspec, dspec),
        out_shape=(jax.ShapeDtypeStruct((hp4, wp), jnp.float32),
                   jax.ShapeDtypeStruct((hp4, wp), jnp.float32)),
        compiler_params=cparams, interpret=interpret,
    )(arms4, vol4)
    return disp_l[:h, :w], disp_r[:h, :w]


def band_stereo_core_dm(img_l, img_r, arms_l, arms_r, cfg,
                        interpret: bool = False):
    """Disparity-major stereo core: stacked-eyes cost init
    (ci_adcensus_kern_stacked, native (2D, H, W) output) + the four-pass
    quantized aggregation with fused WTA (band_aggregate_q_dm), streamed
    over row chunks of cfg.band_row_chunk output rows.  No (H, W, D)
    relayout, shear, or eye concat ever happens; results are bit-identical
    to band_stereo_core_chunked (same integer arithmetic, layout only).

    Returns (disp_l, disp_r) float32.
    """
    from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern_stacked

    h = img_l.shape[0]
    usd = cfg.usd
    if usd > 64:
        raise ValueError("band engine requires usd <= 64 (256-wide kernel "
                         "windows); use engine='xla' for larger arms")
    chunk = cfg.band_row_chunk or h
    halo = 2 * usd
    ext, bounds = _chunk_bounds(h, chunk, halo)

    parts_l, parts_r = [], []
    for start, lo in bounds:
        i0, i1 = max(0, start - 3), min(h, start + ext + 3)
        c_lo = start - i0                  # cost rows inside the img slice
        cost2 = ci_adcensus_kern_stacked(
            img_l[i0:i1], img_r[i0:i1], cfg.ad_coeff, cfg.census_coeff,
            cfg.num_disp, cfg.zero_disp, quant=True, interpret=interpret)
        cost2 = cost2[:, c_lo:c_lo + ext]
        sl = slice(start, start + ext)
        dl, dr = band_aggregate_q_dm(
            cost2, arms_l[:, sl], arms_r[:, sl], num_disp=cfg.num_disp,
            zero_disp=cfg.zero_disp, max_arm=usd, interpret=interpret)
        n_valid = min(chunk, h - (start + lo))
        v = slice(lo, lo + n_valid)
        parts_l.append(dl[v])
        parts_r.append(dr[v])
    if len(parts_l) == 1:
        return parts_l[0], parts_r[0]
    return (jnp.concatenate(parts_l, axis=0),
            jnp.concatenate(parts_r, axis=0))


# ---------------------------------------------------------------------------
# Row-chunked stereo core: HBM-bounded processing of the (H, W, D) volume.
#
# At 1080p / D=128 a cost volume is ~1 GB per eye and the aggregate
# sequence keeps 2-3 of them live -- enough to exhaust (or thrash) device
# memory.  The whole stereo core is per-d independent and its vertical
# reach is bounded (2*usd for the two V passes, usd per IRV round), so the
# frame is processed in row chunks with recomputed halos -- the same halo
# arithmetic parallel.halo uses across chips, applied serially on one chip.
# The full-resolution cost volume never exists in HBM.  Because the
# quantized aggregation is exact integer arithmetic, the chunked result is
# bit-identical to the whole-frame result.
# ---------------------------------------------------------------------------


def _chunk_bounds(h: int, chunk: int, halo: int):
    """Uniform-size extended slices [(start, lo_off)] covering [0, h) in
    `chunk`-row steps: ext row range [start, start + chunk + 2*halo) with
    start clamped to the image, lo_off = where the chunk's first valid row
    sits inside the ext slice.  Uniform sizes keep one compiled kernel
    shape for every chunk; ext is rounded to the 8-row grain so the
    aggregation kernels take their zero-copy (unpadded) path."""
    ext = min(h, -(-(chunk + 2 * halo) // 8) * 8)
    out = []
    for c0 in range(0, h, chunk):
        start = min(max(0, c0 - halo), h - ext)
        out.append((start, c0 - start))
    return ext, out


def band_stereo_core_chunked(img_l, img_r, arms_l, arms_r, cfg,
                             interpret: bool = False):
    """Cost init + 4-pass quantized aggregation + fused WTA for both eyes,
    streamed over row chunks of cfg.band_row_chunk output rows.  Each
    chunk's halo (2*usd for the V passes, +3 rows of image for the census
    window) is recomputed from the real neighboring rows; the integer
    aggregation makes the result bit-identical to the whole-frame run.

    cfg.use_hslo inserts the horizontal scanline DP (ops.hslo.dc_hslo_hwd,
    the band layout's native orientation) between aggregation and WTA,
    with penalties scaled into the quantized aggregate's cost units
    (agg_cost_scale); rows are DP-independent, so chunking stays exact.

    Returns (disp_l, disp_r) float32.
    """
    from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern_xm

    h = img_l.shape[0]
    usd = cfg.usd
    if usd > 64:
        raise ValueError("band engine requires usd <= 64 (256-wide kernel "
                         "windows); use engine='xla' for larger arms")
    chunk = cfg.band_row_chunk or h
    halo = 2 * usd
    ext, bounds = _chunk_bounds(h, chunk, halo)
    # aggregate at a 16-row grain (covers every pass's block-row grain,
    # so the kernels never fall back to a pad copy): the cost kernel
    # hands out the extra edge-clamped rows for free, and zero-padded
    # arms keep them out of every window
    ext16 = -(-ext // 16) * 16
    digits = getattr(cfg, "band_digits", 2)
    qsc = getattr(cfg, "band_qscale", QSCALE)
    lossy = getattr(cfg, "band_lossy_wta", False)

    if cfg.use_hslo:
        from stereo_to_multiview_tpu.ops.hslokern import dc_hslo_wta_kern
        from stereo_to_multiview_tpu.ops.mux import mux_average
        kappa = agg_cost_scale(usd, digits, qsc)
        gray_l = mux_average(img_l)
        gray_r = mux_average(img_r)

    disp_parts_l, disp_parts_r = [], []
    for start, lo in bounds:
        # image slice with +-3 census margin (clamped at true borders)
        i0, i1 = max(0, start - 3), min(h, start + ext + 3)
        sl_img = slice(i0, i1)
        c_lo = start - i0                  # cost rows inside the img slice
        cost_l, cost_r = ci_adcensus_kern_xm(
            img_l[sl_img], img_r[sl_img], cfg.ad_coeff, cfg.census_coeff,
            cfg.num_disp, cfg.zero_disp, quant=True, qscale=qsc,
            out_rows=c_lo + ext16, interpret=interpret)

        # per-eye aggregation: no 2x-volume eye concat (a full HBM copy);
        # the exact integer arithmetic makes per-eye == stacked anyway
        sl = slice(start, start + ext)
        n_valid = min(chunk, h - (start + lo))
        v = slice(lo, lo + n_valid)
        zrows = ((0, ext16 - ext),)
        if cfg.use_hslo:
            grow = lambda g: jnp.pad(g[sl], (*zrows, (0, 0)), mode="edge")
            gl_c, gr_c = grow(gray_l), grow(gray_r)
        for cost, arms, sign, parts in (
                (cost_l, arms_l, +1, disp_parts_l),
                (cost_r, arms_r, -1, disp_parts_r)):
            arms16 = jnp.pad(arms[:, sl], ((0, 0), *zrows, (0, 0)))
            if cfg.use_hslo:
                vol = band_aggregate_q(
                    cost[c_lo:c_lo + ext16], arms16, usd,
                    digits=digits, interpret=interpret,
                    final_out_t=True, qscale=qsc)
                ga, gb = (gl_c, gr_c) if sign > 0 else (gr_c, gl_c)
                disp = dc_hslo_wta_kern(
                    vol, ga, gb, cfg.num_disp, cfg.zero_disp,
                    cfg.hslo_T, cfg.hslo_H1 * kappa,
                    cfg.hslo_H2 * kappa, sign=sign,
                    interpret=interpret)
            else:
                disp = band_aggregate_q(
                    cost[c_lo:c_lo + ext16], arms16, usd,
                    zero_disp=cfg.zero_disp,
                    digits=digits, qscale=qsc,
                    lossy_wta=lossy,
                    interpret=interpret)
            parts.append(disp[v])
    if len(disp_parts_l) == 1:
        return disp_parts_l[0], disp_parts_r[0]
    return (jnp.concatenate(disp_parts_l, axis=0),
            jnp.concatenate(disp_parts_r, axis=0))


def dr_irv_band_chunked(disp_l, outl_l, disp_r, outl_r, arms_l, arms_r,
                        cfg, interpret: bool = False):
    """IRV with each synchronous round streamed over row chunks (vertical
    vote reach = usd), using the fused Pallas round kernel
    (ops.irvkern.irv_round_kern -- bit-identical to ops.irv.dr_irv).
    Both eyes stack along H (arms stop at their own image border, so no
    vote window crosses the eye seam for kept rows); every round reads
    the full previous-round disparity/outlier state.

    Rounds run under a lax.while_loop with early termination: IRV accepts
    only convert outliers to reliable pixels, so a round that changes no
    label reaches the fixpoint and every further round is the identity --
    skipping them is exact.  (The reference always runs the fixed count,
    d_io.cu:147; outcome identical.)
    """
    from stereo_to_multiview_tpu.ops.irvkern import irv_round_kern
    h = disp_l.shape[0]
    usd = cfg.usd
    chunk = getattr(cfg, "irv_row_chunk", 0) or h
    ext, bounds = _chunk_bounds(h, chunk, usd)

    def one_round(dl, ol, dr_, orr, nd_l, nd_r):
        parts = []
        for start, lo in bounds:
            sl = slice(start, start + ext)
            disp = jnp.concatenate([dl[sl], dr_[sl]], axis=0)
            outl = jnp.concatenate([ol[sl], orr[sl]], axis=0)
            arms = jnp.concatenate([arms_l[:, sl], arms_r[:, sl]], axis=1)
            nmask = jnp.concatenate([nd_l[sl], nd_r[sl]], axis=0)
            nd, no = irv_round_kern(disp, outl, arms, cfg.irv_thresh_s,
                                    cfg.irv_thresh_h, cfg.num_disp,
                                    cfg.zero_disp, usd, interpret,
                                    need=nmask)
            n_valid = min(chunk, h - (start + lo))
            v = slice(lo, lo + n_valid)
            vr = slice(ext + lo, ext + lo + n_valid)
            parts.append((nd[v], no[v], nd[vr], no[vr]))
        if len(parts) == 1:
            return parts[0]
        return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                     for i in range(4))

    def _dilate_cheb(mask):
        """Block-granular Chebyshev-usd dilation of a change mask (an
        over-approximation: extra flagged pixels only cost re-votes that
        reproduce their previous outcome)."""
        g = 8
        r = -(-usd // g) + 1
        hp2 = -(-mask.shape[0] // g) * g
        wp2 = -(-mask.shape[1] // g) * g
        m = jnp.pad(mask, ((0, hp2 - mask.shape[0]),
                           (0, wp2 - mask.shape[1])))
        blk = m.reshape(hp2 // g, g, wp2 // g, g).any(axis=(1, 3))
        for axis in (0, 1):
            d = blk
            # a shift of blocks-1 already reaches the whole extent;
            # larger radii would make slice_in_dim raise
            for k in range(1, min(r, blk.shape[axis] - 1) + 1):
                lo_p = [(0, 0), (0, 0)]
                hi_p = [(0, 0), (0, 0)]
                lo_p[axis] = (0, k)
                hi_p[axis] = (k, 0)
                d = d | jnp.pad(
                    jax.lax.slice_in_dim(blk, k, blk.shape[axis], axis=axis),
                    lo_p) | jnp.pad(
                    jax.lax.slice_in_dim(blk, 0, blk.shape[axis] - k,
                                         axis=axis), hi_p)
            blk = d
        full = jnp.repeat(jnp.repeat(blk, g, axis=0), g, axis=1)
        return full[:mask.shape[0], :mask.shape[1]]

    def cond(state):
        it, changed = state[4], state[5]
        return jnp.logical_and(it < cfg.irv_iterations, changed)

    def body(state):
        dl, ol, dr_, orr, it, _, nd_l, nd_r = state
        ndl, nol, ndr, norr = one_round(dl, ol, dr_, orr, nd_l, nd_r)
        ch_l = nol != ol
        ch_r = norr != orr
        changed = jnp.logical_or(jnp.any(ch_l), jnp.any(ch_r))
        # next round's frontier: a vote outcome can change only within
        # cross reach (Chebyshev usd) of a pixel that changed this round
        return (ndl, nol, ndr, norr, it + 1, changed,
                _dilate_cheb(ch_l), _dilate_cheb(ch_r))

    all_true = jnp.ones(disp_l.shape, jnp.bool_)
    state = (disp_l, outl_l, disp_r, outl_r, jnp.int32(0),
             jnp.bool_(True), all_true, all_true)
    dl, ol, dr_, orr = jax.lax.while_loop(cond, body, state)[:4]
    return (dl, ol), (dr_, orr)


def dr_irv_band(disp: jnp.ndarray, outliers: jnp.ndarray, arms: jnp.ndarray,
                thresh_s: int, thresh_h: float, num_disp: int,
                zero_disp: int, usd: int, iterations: int,
                interpret: bool = False):
    """Iterative region voting (d_dr_irv.cu) with the histogram's separable
    row/column span sums on the MXU.  One-hot volumes and band matrices are
    exactly representable in bf16 and counts stay < 2^24, so the MXU passes
    are *exact* -- bit-identical to ops.irv.dr_irv.

    Vote rule reproduced exactly (dr_irv_kernel_3:36): accept iff
    reliable > thresh_s and (max_d + zero_disp)/reliable > thresh_h, with
    the reference's quirk of dividing the winning *disparity*.
    """
    from stereo_to_multiview_tpu.ops.cross import UP, DOWN, LEFT, RIGHT
    if usd > _HALO:
        raise ValueError("dr_irv_band requires usd <= 64 (256-wide kernel "
                         "windows); use ops.irv.dr_irv for larger arms")
    up = jnp.minimum(arms[UP], usd)   # pre-kernel clamps U to sm padding
    down = arms[DOWN]
    left = arms[LEFT]
    right = arms[RIGHT]
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, num_disp), 2)

    def one_iter(_, state):
        disp, outliers = state
        reliable = (outliers == 0)
        dint = disp.astype(jnp.int32)          # trunc toward zero
        onehot = (reliable[:, :, None]
                  & (dint[:, :, None] + zero_disp == bins)).astype(F32)
        row = band_span_sum_h(onehot, left, right, inclusive=True,
                              nsplit=1, max_arm=usd, interpret=interpret)
        hist = band_span_sum_v(row, up, down, inclusive=True,
                               nsplit=1, max_arm=usd, interpret=interpret)
        total = jnp.sum(hist, axis=2).astype(jnp.int32)  # = sum of all bins

        max_bin = hist.max(axis=2)
        winner = jnp.argmax(hist, axis=2).astype(jnp.int32)  # first max
        max_d = jnp.where(max_bin > 0, winner - zero_disp, dint)

        ratio = ((max_d + zero_disp).astype(F32)
                 / jnp.maximum(total, 1).astype(F32))
        accept = ((outliers != 0)
                  & (total > thresh_s)
                  & (ratio > F32(thresh_h)))
        new_disp = jnp.where(accept, max_d.astype(F32), disp)
        new_out = jnp.where(accept, jnp.uint8(0), outliers)
        return new_disp, new_out

    return jax.lax.fori_loop(0, iterations, one_iter, (disp, outliers))


def agg_cost_scale(max_arm: int, digits: int = 2,
                   qscale: float = QSCALE) -> float:
    """Cost-unit scale of the quantized aggregate: band_aggregate_q's
    output ~= reference f32 aggregate * qscale / 2^(s1+s2+s3).  Additive
    terms applied to the aggregated volume (e.g. HSLO penalties) multiply
    by this factor to keep their reference strength."""
    s1, s2, s3 = agg_rescale_shifts(max_arm, digits, qscale)
    return qscale / float(2 ** (s1 + s2 + s3))
