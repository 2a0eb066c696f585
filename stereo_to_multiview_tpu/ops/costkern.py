"""Pallas TPU kernel for AD-census cost initialization, both eyes.

The XLA formulation (128 shifted pad+slice planes concatenated into a
volume) defeats fusion and measured ~30x off roofline at 1080p.  This
kernel streams (8-row x 128-column) tiles: row-resident padded image /
census planes are sliced per disparity with *static* lane rolls, the
per-d (8, 128x) cost rows accumulate in a VMEM scratch, and eight
128x128 transposes emit the (x, d) tile layout the banded-MXU
aggregation kernel consumes.  Output matches ops.cost.ci_adcensus_hwd up
to exp rounding (the AD/census/Hamming arithmetic is integer-exact).

Reference semantics: d_ci_ad.cu:73-159, d_ci_census.cu:197-254,
d_ci_adcensus.cu:10-36 -- clamp-to-edge reads (pre-baked into the
128-column edge padding), cost_l(x, d) pairs L(x) with R(x + d - zd),
cost_r pairs R(x) with L(x - (d - zd)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_to_multiview_tpu.ops.fastmath import exp_neg, cost_flip_count

F32 = jnp.float32
_LANE = 128
_ROWS = 16
_PAD = 128      # edge padding columns on each side of every plane
_QSCALE = 127.0  # quantized-cost scale (ops.band.QSCALE)


def _popcount(x: jnp.ndarray) -> jnp.ndarray:
    """Hardware popcount (verified to lower through Mosaic on the current
    toolchain; round 1 needed a 12-op SWAR fallback)."""
    return jax.lax.population_count(x)


def _window(chunks, lo: int):
    """128-lane window starting at static offset `lo` within the 384-lane
    span of three consecutive chunks (each (8, 128))."""
    k = lo // _LANE
    r = lo % _LANE
    a, b = chunks[k], chunks[min(k + 1, 2)]
    if r == 0:
        return a
    # left-shift by r == circular roll right by 128 - r on both operands
    rolled_a = pltpu.roll(a, _LANE - r, axis=1)
    rolled_b = pltpu.roll(b, _LANE - r, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANE), 1)
    return jnp.where(lane < _LANE - r, rolled_a, rolled_b)


def _cost_kernel(*refs, num_disp: int, zero_disp: int,
                 inv_ad: float, inv_cen: float, quant: bool,
                 fast_exp: bool = False,
                 eyes: str = "lr", tile: int | None = None):
    """One (16-row, 128-column) step.  Plane refs are (16, W + 256) i32,
    row-block resident; out refs are (D, 16, 128) -- disparity-major, so
    each per-d cost row stores with a leading index (the round-1 design's
    32 in-kernel (128, 128) transposes per step dominated the kernel; the
    (H, W, D) relayout now happens once in XLA, bandwidth-bound).

    eyes selects which cost volumes this instance emits ("lr", "l", "r");
    the out refs follow the inputs in that order.  `tile` pins the column
    tile statically (border-strip calls with a 1-wide grid) instead of
    reading pl.program_id(1)."""
    lb, lg, lr, rb, rg, rr, clw0, clw1, crw0, crw1 = refs[:10]
    outs = refs[10:]
    if tile is None:
        s = pl.program_id(1)
        base = pl.multiple_of(s * _LANE, _LANE)
    else:
        base = tile * _LANE

    def chunks(ref):
        return [ref[:, pl.ds(base + k * _LANE, _LANE)] for k in range(3)]

    l_ch = [chunks(r_) for r_ in (lb, lg, lr)]     # left image channels
    r_ch = [chunks(r_) for r_ in (rb, rg, rr)]
    cl_ch = [chunks(r_) for r_ in (clw0, clw1)]    # left census words
    cr_ch = [chunks(r_) for r_ in (crw0, crw1)]

    # own-eye center values, (8, 128) lane-x
    l_own = [c[1] for c in l_ch]
    r_own = [c[1] for c in r_ch]
    cl_own = [c[1] for c in cl_ch]
    cr_own = [c[1] for c in cr_ch]

    third = F32(0.33333333333)

    def emit(own, own_cen, other_ch, other_cen_ch, off, out, idx):
        ad = jnp.zeros((_ROWS, _LANE), jnp.int32)
        for c in range(3):
            ad = ad + jnp.abs(own[c] - _window(other_ch[c], off))
        ham = (_popcount(own_cen[0] ^ _window(other_cen_ch[0], off))
               + _popcount(own_cen[1] ^ _window(other_cen_ch[1], off)))
        if fast_exp:
            # polynomial exp: engaged only when cost_flip_count proved it
            # bit-equal to the f32-exp quantizer on the whole domain
            cost = ((F32(1.0) - exp_neg((ad.astype(F32) * third) * inv_ad))
                    + (F32(1.0) - exp_neg(ham.astype(F32) * inv_cen)))
        else:
            cost = ((F32(1.0) - jnp.exp(-(ad.astype(F32) * third) * inv_ad))
                    + (F32(1.0) - jnp.exp(-ham.astype(F32) * inv_cen)))
        if quant:
            cost = jnp.rint(cost * F32(_QSCALE))
            # Mosaic has no direct f32 -> u8 cast; hop through i32
            out[idx] = cost.astype(jnp.int32).astype(out.dtype)
        else:
            out[idx] = cost.astype(out.dtype)

    for d in range(num_disp):
        if "l" in eyes:
            # left eye: other-eye (R) window at x + (d - zero_disp);
            # padded-plane lane offset = 128 + (d - zero_disp)
            emit(l_own, cl_own, r_ch, cr_ch, _PAD + d - zero_disp,
                 outs[0], d)
        if "r" in eyes:
            # right eye: other-eye (L) window at x - (d - zero_disp);
            # "stacked" mode puts it at leading index D + d of the single
            # (2D, rows, 128) output block
            emit(r_own, cr_own, l_ch, cl_ch, _PAD - (d - zero_disp),
                 outs[-1], num_disp + d if eyes == "lr_stacked" else d)


def _resolve_fast_exp(quant: bool, fast_exp: bool, ad_coeff: float,
                      census_coeff: float) -> bool:
    """Engage the polynomial exp only when the quantized outputs are
    provably identical to the f32-exp definition over the kernel's whole
    discrete (AD, Hamming) input domain (trace-time exhaustive check;
    ~37k pairs).  Non-quantized outputs always use jnp.exp (f32 parity
    with ops.cost).

    Default OFF: the v5e VPU has hardware-accelerated transcendentals
    (measured: jnp.exp 28.1 ms vs polynomial 30.0 ms vs no-exp 27.1 ms
    for the 1080p/D=128 cost kernel) -- the polynomial only pays on
    hardware without a fast exp pipe; the flag and the exactness proof
    are kept for that case."""
    return (quant and fast_exp
            and cost_flip_count(1.0 / ad_coeff, 1.0 / census_coeff) == 0)


def _shear_kernel(in_ref, out_ref, *, num_disp: int, zero_disp: int):
    """out[d, :, x] = in[d, :, 64 + x - (d - zd)] -- one static lane roll
    plus an aligned slice per d-plane (no wraparound: the +-64 pad bounds
    every read)."""
    wpp = in_ref.shape[-1]
    for d in range(num_disp):
        s = d - zero_disp
        # roll in f32: Mosaic's rotate only handles 32-bit element types
        rolled = pltpu.roll(in_ref[d].astype(F32),
                            (s - _LANE // 2) % wpp, axis=1)
        out_ref[d] = rolled[:, :out_ref.shape[-1]].astype(out_ref.dtype)


def _shear_right(out_l: jnp.ndarray, zero_disp: int,
                 interpret: bool) -> jnp.ndarray:
    """(D, HP, WP) left cost volume -> right volume interior via the per-d
    shear (see ci_adcensus_kern; border strips are overwritten after)."""
    num_disp, hp, wp = out_l.shape
    half = _LANE // 2
    padded = jnp.pad(out_l, ((0, 0), (0, 0), (half, half)))
    rows = 8
    return pl.pallas_call(
        functools.partial(_shear_kernel, num_disp=num_disp,
                          zero_disp=zero_disp),
        grid=(hp // rows,),
        in_specs=[pl.BlockSpec((num_disp, rows, wp + _LANE),
                               lambda y: (0, y, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((num_disp, rows, wp), lambda y: (0, y, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_disp, hp, wp), out_l.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(padded)


def _cost_planes(img_l, img_r, h, w, hp, wp):
    """Padded i32 image/census planes in the kernel's argument order:
    l b/g/r, r b/g/r, cl w0/w1, cr w0/w1."""
    from stereo_to_multiview_tpu.ops.cost import census_transform_9x7
    from stereo_to_multiview_tpu.ops.mux import mux_average

    cen_l = census_transform_9x7(mux_average(img_l))
    cen_r = census_transform_9x7(mux_average(img_r))

    def planes(img, cen):
        ps = [img[:, :, c].astype(jnp.int32) for c in range(3)]
        ps += [cen[:, :, k].astype(jnp.int32) for k in range(2)]
        out = []
        for p in ps:
            p = jnp.pad(p, ((0, hp - h), (0, 0)), mode="edge")
            p = jnp.pad(p, ((0, 0), (_PAD, _PAD + wp - w)), mode="edge")
            out.append(p)
        return out

    pls = planes(img_l, cen_l) + planes(img_r, cen_r)
    return [pls[0], pls[1], pls[2], pls[5], pls[6], pls[7],
            pls[3], pls[4], pls[8], pls[9]]


@functools.partial(jax.jit, static_argnames=("num_disp", "zero_disp",
                                             "ad_coeff", "census_coeff",
                                             "quant", "fast_exp",
                                             "interpret"))
def ci_adcensus_kern_stacked(img_l: jnp.ndarray, img_r: jnp.ndarray,
                             ad_coeff: float, census_coeff: float,
                             num_disp: int, zero_disp: int,
                             quant: bool = True, fast_exp: bool = False,
                             interpret: bool = False) -> jnp.ndarray:
    """(H, W, 3) u8 pair -> ONE (2D, H, W) disparity-major cost volume
    (left eye on leading indices [0, D), right on [D, 2D)) -- the native
    layout of band_aggregate_q_dm, with no relayout, shear, or eye concat
    (both eyes are computed in full; the shift-extraction variant measured
    slower on this TPU: the f32 lane roll costs more than the saved
    arithmetic).  Costs are quantized (quant=True) by default.

    Reference semantics: d_ci_ad.cu:73-159, d_ci_census.cu:197-254,
    d_ci_adcensus.cu:10-36.
    """
    if num_disp > 128 or zero_disp > 128:
        raise ValueError("ci_adcensus_kern supports num_disp/zero_disp "
                         "<= 128")
    h, w = img_l.shape[:2]
    hp = -(-h // _ROWS) * _ROWS
    wp = -(-w // _LANE) * _LANE
    args = _cost_planes(img_l, img_r, h, w, hp, wp)

    grid = (hp // _ROWS, wp // _LANE)
    plane_spec = pl.BlockSpec((_ROWS, w + 2 * _PAD + (wp - w)),
                              lambda y, s: (y, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2 * num_disp, _ROWS, _LANE),
                            lambda y, s: (0, y, s),
                            memory_space=pltpu.VMEM)
    out_dt = jnp.uint8 if quant else jnp.float32
    kern = functools.partial(_cost_kernel, num_disp=num_disp,
                             zero_disp=zero_disp,
                             inv_ad=float(1.0 / ad_coeff),
                             inv_cen=float(1.0 / census_coeff),
                             quant=quant, eyes="lr_stacked",
                             fast_exp=_resolve_fast_exp(
                                 quant, fast_exp, ad_coeff, census_coeff))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[plane_spec] * 10,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2 * num_disp, hp, wp), out_dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*args)
    return out[:, :h, :w]


# ---------------------------------------------------------------------------
# x-major cost kernel (round 3).
#
# The row-major kernel above reads the other eye's window at x + (d - zd)
# with a lane roll + select per (d, plane): ~15 small ops per disparity on
# (16, 128) operands -- measured 6x off the VPU elem-op floor at 1080p
# (issue-bound on per-instruction overhead).  Transposing every plane to
# (W, H) puts the disparity window on the SUBLANE axis, where arbitrary
# static offsets are free: one slice per (d, plane), and all arithmetic
# runs on (128, 128) operands (8x the elements per instruction).
# ---------------------------------------------------------------------------

_XT = 128    # x sublanes per grid step (window = 3 consecutive blocks)
_YL = 128    # image rows per grid step (lane axis)


def _cost_kernel_xm(*refs, num_disp: int, zero_disp: int, sign: int,
                    inv_ad: float, inv_cen: float, quant: bool,
                    fast_exp: bool = False, ablate_exp: bool = False,
                    qscale: float = _QSCALE):
    """One (128-x, 128-row) step for ONE eye.  refs: own b/g/r + census
    w0/w1 center blocks (5 x (XT, YL) i32), then the other eye's 5 planes
    as 3 consecutive x-blocks each (15 refs); out (D, XT, YL).
    sign=+1: left eye (reads other at x + (d - zd)); -1: right.
    ablate_exp replaces the two exps with a linear combine -- WRONG
    values, measurement-only (isolates the transcendental cost)."""
    own = [r_[:] for r_ in refs[:5]]
    oth = [jnp.concatenate([refs[5 + 3 * p][:], refs[6 + 3 * p][:],
                            refs[7 + 3 * p][:]], axis=0)
           for p in range(5)]                       # 5 x (3*XT, YL)
    out_ref = refs[20]
    third = F32(0.33333333333)
    for d in range(num_disp):
        off = _XT + sign * (d - zero_disp)
        ad = (jnp.abs(own[0] - oth[0][off:off + _XT])
              + jnp.abs(own[1] - oth[1][off:off + _XT])
              + jnp.abs(own[2] - oth[2][off:off + _XT]))
        ham = (_popcount(own[3] ^ oth[3][off:off + _XT])
               + _popcount(own[4] ^ oth[4][off:off + _XT]))
        if ablate_exp:
            cost = ((ad.astype(F32) * third) * inv_ad
                    + ham.astype(F32) * inv_cen)
        elif fast_exp:
            cost = ((F32(1.0) - exp_neg((ad.astype(F32) * third) * inv_ad))
                    + (F32(1.0) - exp_neg(ham.astype(F32) * inv_cen)))
        else:
            cost = ((F32(1.0) - jnp.exp(-(ad.astype(F32) * third) * inv_ad))
                    + (F32(1.0) - jnp.exp(-ham.astype(F32) * inv_cen)))
        if quant:
            cost = jnp.rint(cost * F32(qscale))
            out_ref[d] = cost.astype(jnp.int32).astype(out_ref.dtype)
        else:
            out_ref[d] = cost.astype(out_ref.dtype)


def _cost_planes_xm(img_l, img_r, h, w, hp, wp):
    """Transposed (W + 2*_XT, HP) i32 planes, own-eye order l then r:
    b, g, r, census w0, w1 per eye.  Same clamp-to-edge padding as
    _cost_planes, on swapped axes."""
    from stereo_to_multiview_tpu.ops.cost import census_transform_9x7
    from stereo_to_multiview_tpu.ops.mux import mux_average

    cen_l = census_transform_9x7(mux_average(img_l))
    cen_r = census_transform_9x7(mux_average(img_r))

    def planes(img, cen):
        ps = [img[:, :, c].astype(jnp.int32) for c in range(3)]
        ps += [cen[:, :, k].astype(jnp.int32) for k in range(2)]
        out = []
        for p in ps:
            p = p.T                                      # (W, H)
            p = jnp.pad(p, ((0, 0), (0, hp - h)), mode="edge")
            p = jnp.pad(p, ((_XT, _XT + wp - w), (0, 0)), mode="edge")
            out.append(p)
        return out

    return planes(img_l, cen_l) + planes(img_r, cen_r)


def _shear_kernel_xm(r0, r1, r2, out_ref, *, num_disp: int,
                     zero_disp: int):
    """out_r(d, x, y) = P(d, x - (d - zd), y) in ONE strided roll: the
    per-d shift rides the hardware rotate's stride over the major (d)
    axis (shift_d = (d - zd) mod 3*_XT, wraparound confined to the
    discarded halo blocks since |d - zd| <= _XT).  Replaces the per-d
    sublane-slice-and-concat form, which built 2 slices per disparity
    (measured 7.5 ms at 1080p vs ~3 for the roll)."""
    cat = jnp.concatenate([r0[:], r1[:], r2[:]], axis=1)  # (D, 3XT, YL)
    # the hardware rotate is 32-bit only (and in-kernel bitcasts cannot
    # change bitwidths): narrow dtypes ride the roll at 32 bits
    if cat.dtype.itemsize != 4:
        cat = cat.astype(jnp.int32 if cat.dtype == jnp.uint8 else F32)
    rolled = pltpu.roll(cat, (3 * _XT - zero_disp) % (3 * _XT), 1,
                        stride=1, stride_axis=0)
    out_ref[...] = rolled[:, _XT:2 * _XT, :].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_disp", "zero_disp",
                                             "ad_coeff", "census_coeff",
                                             "quant", "out_rows",
                                             "shear", "fast_exp",
                                             "ablate_exp", "qscale",
                                             "interpret"))
def ci_adcensus_kern_xm(img_l: jnp.ndarray, img_r: jnp.ndarray,
                        ad_coeff: float, census_coeff: float,
                        num_disp: int, zero_disp: int, quant: bool = True,
                        out_rows: int | None = None, shear: bool = True,
                        fast_exp: bool = False, ablate_exp: bool = False,
                        qscale: float = _QSCALE,
                        interpret: bool = False):
    """(H, W, 3) u8 pair -> ((H, W, D), (H, W, D)) cost volumes via the
    x-major kernel -- bit-identical to ci_adcensus_kern (same integer
    AD/census arithmetic, same f32 exp combine, layout only).

    shear=True (default): ONE pair volume P(x', k) = cost(L(x'),
    R(x' + k)) is computed over the extended range x' in [-128, wp+128)
    and both eyes are extracted from it -- cost_l(x, d) = P(x, d - zd)
    is a slice and cost_r(x, d) = P(x - (d - zd), d - zd) is a per-d
    sublane shift (d_ci_ad.cu:133-144 symmetry).  The extension makes
    the border clamp exact for both eyes: at x' outside the image, L
    reads clamp to the edge column exactly as the right-eye kernel's
    L(clamp(x - k)) would, and R reads stay in-image wherever an
    in-image output consumes them -- so the result is bit-identical to
    the two-eye path while doing ~53% of its arithmetic (grid widens by
    2 blocks; the shear is bandwidth-only).

    out_rows > H returns that many rows (<= the kernel's 128-padded
    height); the extra rows hold edge-clamped-image costs -- the
    aggregation kernels consume 16-aligned heights (int16 sublane
    tiling) and this hands them out for free instead of a pad copy.

    Requires max(zero_disp, num_disp - zero_disp) <= 128 (one x-block of
    window reach each side); shear additionally requires <= 64 (the
    extended volume keeps one block of margin per side)."""
    if num_disp > 128 or zero_disp > 128:
        raise ValueError("ci_adcensus_kern supports num_disp/zero_disp "
                         "<= 128")
    h, w = img_l.shape[:2]
    hp = -(-h // _YL) * _YL
    wp = -(-w // _XT) * _XT
    if out_rows is not None:
        if out_rows > hp:
            raise ValueError("out_rows exceeds the kernel's padded height")
        h = out_rows
    args = _cost_planes_xm(img_l, img_r, img_l.shape[0], w, hp, wp)
    # the fast-exp zero-flip proof is established at qscale 127 only
    fast_exp = (qscale == _QSCALE
                and _resolve_fast_exp(quant, fast_exp, ad_coeff,
                                      census_coeff))

    own_spec = pl.BlockSpec((_XT, _YL), lambda x, y: (x + 1, y),
                            memory_space=pltpu.VMEM)
    oth_specs = [pl.BlockSpec((_XT, _YL), lambda x, y, d=d: (x + d, y),
                              memory_space=pltpu.VMEM)
                 for d in range(3)]
    # band_qscale dial: quantized values above 255 need int16 volumes
    out_dt = ((jnp.uint8 if round(2 * qscale) <= 255 else jnp.int16)
              if quant else jnp.float32)
    shear = shear and max(zero_disp, num_disp - zero_disp) <= _XT // 2

    if shear:
        # pair volume P over x' in [-_XT, wp + _XT): the left-eye kernel
        # with the grid shifted one block left and widened by two.  Own
        # planes already carry _XT edge pad (index x instead of x + 1);
        # other-eye planes get one extra block of edge pad per side.
        own = args[:5]
        oth = [jnp.pad(p, ((_XT, _XT), (0, 0)), mode="edge")
               for p in args[5:]]
        own_spec0 = pl.BlockSpec((_XT, _YL), lambda x, y: (x, y),
                                 memory_space=pltpu.VMEM)
        in_refs = own + [p for p in oth for _ in range(3)]
        in_specs = [own_spec0] * 5 + [oth_specs[d] for _ in range(5)
                                      for d in range(3)]
        wpe = wp + 2 * _XT
        pair = pl.pallas_call(
            functools.partial(_cost_kernel_xm, num_disp=num_disp,
                              zero_disp=zero_disp, sign=1,
                              inv_ad=float(1.0 / ad_coeff),
                              inv_cen=float(1.0 / census_coeff),
                              quant=quant, fast_exp=fast_exp,
                              ablate_exp=ablate_exp, qscale=qscale),
            grid=(wpe // _XT, hp // _YL),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((num_disp, _XT, _YL),
                                   lambda x, y: (0, x, y),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_disp, wpe, hp), out_dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(*in_refs)
        vol_r = pl.pallas_call(
            functools.partial(_shear_kernel_xm, num_disp=num_disp,
                              zero_disp=zero_disp),
            grid=(wp // _XT, hp // _YL),
            in_specs=[pl.BlockSpec((num_disp, _XT, _YL),
                                   lambda x, y, d=d: (0, x + d, y),
                                   memory_space=pltpu.VMEM)
                      for d in range(3)],
            out_specs=pl.BlockSpec((num_disp, _XT, _YL),
                                   lambda x, y: (0, x, y),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_disp, wp, hp), out_dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )(pair, pair, pair)
        # (D, W, H) -> (H, W, D): one bandwidth-bound XLA relayout each
        out_l = jnp.transpose(pair[:, _XT:_XT + wp], (2, 1, 0))[:h, :w]
        out_r = jnp.transpose(vol_r, (2, 1, 0))[:h, :w]
        return out_l, out_r

    grid = (wp // _XT, hp // _YL)
    out_spec = pl.BlockSpec((num_disp, _XT, _YL), lambda x, y: (0, x, y),
                            memory_space=pltpu.VMEM)
    outs = []
    for eye, sign in (("l", 1), ("r", -1)):
        own = args[:5] if eye == "l" else args[5:]
        oth = args[5:] if eye == "l" else args[:5]
        in_refs = own + [p for p in oth for _ in range(3)]
        in_specs = [own_spec] * 5 + [oth_specs[d] for _ in range(5)
                                     for d in range(3)]
        vol = pl.pallas_call(
            functools.partial(_cost_kernel_xm, num_disp=num_disp,
                              zero_disp=zero_disp, sign=sign,
                              inv_ad=float(1.0 / ad_coeff),
                              inv_cen=float(1.0 / census_coeff),
                              quant=quant, fast_exp=fast_exp,
                              ablate_exp=ablate_exp, qscale=qscale),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((num_disp, wp, hp), out_dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(*in_refs)
        # (D, W, H) -> (H, W, D): one bandwidth-bound XLA relayout
        outs.append(jnp.transpose(vol, (2, 1, 0))[:h, :w])
    return outs[0], outs[1]


@functools.partial(jax.jit, static_argnames=("num_disp", "zero_disp",
                                             "ad_coeff", "census_coeff",
                                             "quant", "fast_exp",
                                             "interpret", "shift_extract"))
def ci_adcensus_kern(img_l: jnp.ndarray, img_r: jnp.ndarray,
                     ad_coeff: float, census_coeff: float,
                     num_disp: int, zero_disp: int, quant: bool = False,
                     fast_exp: bool = False, interpret: bool = False,
                     shift_extract: bool = False):
    """(H, W, 3) u8 pair -> ((H, W, D), (H, W, D)) cost volumes.

    With quant=False, f32 costs matching ops.cost.ci_adcensus_hwd up to
    exp rounding.  With quant=True, round(cost * 127) as bf16-exact
    integers in [0, 254] -- the quantized band engine's cost volume
    (ops.band.QSCALE; halves the HBM traffic of the volume).

    Requires num_disp <= 128 and zero_disp <= 128 (one neighbor chunk of
    reach on each side).
    """
    if num_disp > 128 or zero_disp > 128:
        raise ValueError("ci_adcensus_kern supports num_disp/zero_disp "
                         "<= 128")
    h, w = img_l.shape[:2]
    hp = -(-h // _ROWS) * _ROWS
    wp = -(-w // _LANE) * _LANE
    args = _cost_planes(img_l, img_r, h, w, hp, wp)

    grid = (hp // _ROWS, wp // _LANE)
    plane_spec = pl.BlockSpec((_ROWS, w + 2 * _PAD + (wp - w)),
                              lambda y, s: (y, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((num_disp, _ROWS, _LANE),
                            lambda y, s: (0, y, s),
                            memory_space=pltpu.VMEM)

    out_dt = jnp.uint8 if quant else jnp.float32
    kern = functools.partial(_cost_kernel, num_disp=num_disp,
                             zero_disp=zero_disp,
                             inv_ad=float(1.0 / ad_coeff),
                             inv_cen=float(1.0 / census_coeff), quant=quant,
                             fast_exp=_resolve_fast_exp(
                                 quant, fast_exp, ad_coeff, census_coeff))

    # cost_r(x, d) = cost_l(x - (d - zd), d) wherever x - (d - zd) lands
    # inside the image (same |L - R| pair, same census XOR; the exp
    # arithmetic is identical) -- so the main kernel computes the LEFT eye
    # only (halving its window/popcount/exp work) and the right volume is
    # assembled from per-d shifted slices of the left one, with the <=
    # 64-column border strips (where x - (d - zd) would clamp) recomputed
    # exactly by 128-column-tile kernel calls.  d_ci_ad.cu:133-144 is the
    # symmetry being exploited.  OFF by default: on this TPU the f32 lane
    # roll in the shear costs more than the halved arithmetic saves
    # (measured 21.1 -> 34.75 ms at 1080p/D=128); kept as an opt-in for
    # hardware where rotates are cheap.
    shift_extract = (shift_extract and w >= 3 * _LANE
                     and max(zero_disp, num_disp - zero_disp) <= _LANE // 2)

    if not shift_extract:
        out_l, out_r = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[plane_spec] * 10,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((num_disp, hp, wp), out_dt),
                       jax.ShapeDtypeStruct((num_disp, hp, wp), out_dt)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(*args)
        return (jnp.moveaxis(out_l, 0, 2)[:h, :w],
                jnp.moveaxis(out_r, 0, 2)[:h, :w])

    out_l = pl.pallas_call(
        functools.partial(kern, eyes="l"),
        grid=grid,
        in_specs=[plane_spec] * 10,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((num_disp, hp, wp), out_dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*args)

    # right eye via per-d shifted slices of the left volume.  This shear
    # runs as a tiny Pallas kernel: per-d XLA slices would carry a
    # degenerate leading dim whose layout pads 128x (observed 5 MB -> 645
    # MB HLO temps at 4K).  In-kernel the slices are plain 2D lane
    # windows at static offsets.
    half = _LANE // 2
    out_r = _shear_right(out_l, zero_disp, interpret)

    # exact border strips: leftmost tile plus the tile(s) covering
    # [w - 64, w) (where the shifted read would leave the image)
    border = sorted({0, *range((w - half) // _LANE, (w - 1) // _LANE + 1)})
    strip_spec = pl.BlockSpec((num_disp, _ROWS, _LANE),
                              lambda y: (0, y, 0),
                              memory_space=pltpu.VMEM)
    plane_spec1 = pl.BlockSpec((_ROWS, w + 2 * _PAD + (wp - w)),
                               lambda y: (y, 0),
                               memory_space=pltpu.VMEM)
    for t in border:
        strip = pl.pallas_call(
            functools.partial(kern, eyes="r", tile=t),
            grid=(hp // _ROWS,),
            in_specs=[plane_spec1] * 10,
            out_specs=strip_spec,
            out_shape=jax.ShapeDtypeStruct((num_disp, hp, _LANE), out_dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(*args)
        out_r = jax.lax.dynamic_update_slice(
            out_r, strip, (0, 0, t * _LANE))

    # one bandwidth-bound XLA relayout to the (H, W, D) layout the
    # banded-MXU aggregation consumes
    return (jnp.moveaxis(out_l, 0, 2)[:h, :w],
            jnp.moveaxis(out_r, 0, 2)[:h, :w])

