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
vectors (2 compares per entry, VPU) and is *exact* in bfloat16, so:

  * integer-valued volumes (IRV one-hot histograms) run at full bf16 MXU
    throughput with exact f32 accumulation (counts < 2^24);
  * float volumes (aggregated costs) use a 2- or 3-term bf16 split of the
    input (hi = bf16(x), mid = bf16(x - hi), ...) for ~f32 accuracy at
    2-3x the bf16 cost -- far above the VPU alternative.

Reference semantics: d_ca_cross_sum.cu:243-293 (half-open spans, arm_pos
excludes the anchor when 0) and d_dr_irv.cu:134-220 (inclusive spans).
Vertical passes run this same kernel on a (W, H, D)-transposed volume --
the reference uses the identical transpose trick (d_ca_cross.cu:255-270).

The kernel assumes windows never extend past the image (guaranteed: cross
arms stop at the border by construction, d_ca_cross.cu:41-69), so
out-of-range band columns have A == 0 and no padding is ever read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF16 = jnp.bfloat16

_LANE = 128  # output tile (sublanes of A) and window chunk size


_ROWS = 16  # image rows per grid step (amortizes per-step grid overhead;
            # 3 chunks x (16,128,128) f32 double-buffered + out stays
            # within VMEM at D=128)


def _band_kernel(an_ref, ap_ref, vm1_ref, v0_ref, vp1_ref, out_ref,
                 *, inclusive: bool, nsplit: int):
    """One (128-column segment, 8-row block) step.

    an/ap: (8, 128) i32 arm blocks in natural (H, W) layout.
    vm1/v0/vp1: (8, 128, D) f32 volume chunks at segments s-1, s, s+1
    (edge segments clamp; their band coefficients are zero).
    out: (8, 128, D) f32.

    The arm block is transposed once per step (a single small relayout)
    so each row's arm vector is sublane-oriented; the band matrix is then
    built directly in canonical (o, i) orientation over the full 384-wide
    window, and each bf16 split runs as ONE (128, 384) x (384, D) MXU dot
    -- three small dependent dots per row pipeline far worse than one
    wide one.
    """
    # windows reach at most +-usd <= 64 around the 128-wide output tile,
    # so the contraction only needs the 256 columns [x0-64, x0+192) of
    # the 384-wide chunk span -- a 2-pass MXU contraction instead of 3
    o = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 2 * _LANE), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 2 * _LANE), 1)
    r = i - (_LANE // 2) - o              # offset of window pos i from o

    an_t = an_ref[:].T                    # (128, _ROWS), one relayout
    ap_t = ap_ref[:].T

    for row in range(_ROWS):
        an = an_t[:, row:row + 1]         # (128, 1) sublane-oriented
        ap = ap_t[:, row:row + 1]
        if inclusive:
            band = (r >= -an) & (r <= ap)
        else:
            band = (r >= -an) & (r < ap)
        a = band.astype(BF16)             # exact 0/1, (o, 256)
        x = jnp.concatenate([vm1_ref[row], v0_ref[row], vp1_ref[row]],
                            axis=0)[_LANE // 2:_LANE // 2 + 2 * _LANE]
        part = x.astype(BF16)             # (256 i, D) f32 window
        y = jnp.dot(a, part, preferred_element_type=F32)
        rem = x
        for _ in range(nsplit - 1):
            rem = rem - part.astype(F32)
            part = rem.astype(BF16)
            y = y + jnp.dot(a, part, preferred_element_type=F32)
        out_ref[row] = y


@functools.partial(jax.jit, static_argnames=("inclusive", "nsplit",
                                             "interpret"))
def band_span_sum_h(vol: jnp.ndarray, arm_neg: jnp.ndarray,
                    arm_pos: jnp.ndarray, inclusive: bool = False,
                    nsplit: int = 2, interpret: bool = False) -> jnp.ndarray:
    """Windowed sum along axis 1 of a (H, W, D) volume.

    out[y, x, d] = sum_{j in win(y,x)} vol[y, j, d], win = [x - arm_neg,
    x + arm_pos) (half-open; `inclusive` closes the right end, IRV-style).
    arm_* are (H, W) integer arrays bounded by 64 (the kernel contracts a
    256-wide window around each 128-column tile); windows must not cross
    the image border (cross-arm construction guarantees it).
    nsplit: bf16 terms for the volume (1 = exact for small-integer
    volumes, 2 = ~1e-5 relative, 3 = ~f32).
    """
    h, w, d = vol.shape
    wp = -(-w // _LANE) * _LANE
    if wp != w:
        vol = jnp.pad(vol, ((0, 0), (0, wp - w), (0, 0)))
        zpad = ((0, 0), (0, wp - w))
        arm_neg = jnp.pad(arm_neg, zpad)
        arm_pos = jnp.pad(arm_pos, zpad)
    n_seg = wp // _LANE

    # arms stay in natural (H, W) layout; H padded to the row-block size
    hp = -(-h // _ROWS) * _ROWS
    an_n = arm_neg.astype(jnp.int32)
    ap_n = arm_pos.astype(jnp.int32)
    if hp != h:
        rpad = ((0, hp - h), (0, 0))
        an_n = jnp.pad(an_n, rpad)
        ap_n = jnp.pad(ap_n, rpad)
        vol = jnp.pad(vol, ((0, hp - h), (0, 0), (0, 0)))

    grid = (n_seg, hp // _ROWS)   # row blocks innermost: vol blocks stream
    arm_spec = pl.BlockSpec((_ROWS, _LANE), lambda s, y: (y, s),
                            memory_space=pltpu.VMEM)

    def vol_at(delta):
        def idx(s, y):
            sc = jnp.clip(s + delta, 0, n_seg - 1)
            return (y, sc, 0)
        return pl.BlockSpec((_ROWS, _LANE, d), idx, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_band_kernel, inclusive=inclusive, nsplit=nsplit),
        grid=grid,
        in_specs=[arm_spec, arm_spec, vol_at(-1), vol_at(0), vol_at(+1)],
        out_specs=pl.BlockSpec((_ROWS, _LANE, d), lambda s, y: (y, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(an_n, ap_n, vol, vol, vol)
    return out[:h, :w]


def band_span_sum_v(vol: jnp.ndarray, arm_neg: jnp.ndarray,
                    arm_pos: jnp.ndarray, inclusive: bool = False,
                    nsplit: int = 2, interpret: bool = False) -> jnp.ndarray:
    """Windowed sum along axis 0 of a (H, W, D) volume: the H kernel on a
    (W, H, D) transpose (the reference's own trick, d_ca_cross.cu:255-270;
    XLA transposes are bandwidth-bound, unlike gathers)."""
    vt = jnp.swapaxes(vol, 0, 1)
    out = band_span_sum_h(vt, arm_neg.T, arm_pos.T, inclusive=inclusive,
                          nsplit=nsplit, interpret=interpret)
    return jnp.swapaxes(out, 0, 1)


def cross_aggregate_band(cost_hwd: jnp.ndarray, arms: jnp.ndarray,
                         nsplit: int = 2,
                         interpret: bool = False) -> jnp.ndarray:
    """Four-pass cross aggregation (live order H,V,V,H, d_ca_cross.cu:
    255-271) on a (H, W, D) volume via the banded-MXU kernel.  Matches
    ops.cross.cross_aggregate up to the bf16-split tolerance.

    Both eyes can be stacked along H into one call (see
    cross_aggregate_band_lr): arms stop at their own image border by
    construction, so no window ever crosses the eye boundary.
    """
    from stereo_to_multiview_tpu.ops.cross import UP, DOWN, LEFT, RIGHT
    a = band_span_sum_h(cost_hwd, arms[LEFT], arms[RIGHT],
                        nsplit=nsplit, interpret=interpret)
    a = band_span_sum_v(a, arms[UP], arms[DOWN],
                        nsplit=nsplit, interpret=interpret)
    a = band_span_sum_v(a, arms[UP], arms[DOWN],
                        nsplit=nsplit, interpret=interpret)
    a = band_span_sum_h(a, arms[LEFT], arms[RIGHT],
                        nsplit=nsplit, interpret=interpret)
    return a


def cross_aggregate_band_lr(cost_l, cost_r, arms_l, arms_r,
                            nsplit: int = 2, interpret: bool = False):
    """Aggregate both eyes in one four-pass sequence by stacking the
    volumes along H -- halves the kernel-call count (same FLOPs, less
    per-call/grid fixed cost)."""
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
# Row-chunked stereo core: HBM-bounded processing of the (H, W, D) volume.
#
# At 1080p / D=128 a cost volume is ~1 GB per eye and the aggregate
# sequence keeps 2-3 of them live -- enough to exhaust (or thrash) device
# memory.  The whole stereo core is per-d independent and its vertical
# reach is bounded (2*usd for the two V passes, usd per IRV round), so the
# frame is processed in row chunks with recomputed halos -- the same halo
# arithmetic parallel.halo uses across chips, applied serially on one chip.
# The full-resolution cost volume never exists in HBM.
# ---------------------------------------------------------------------------


def _chunk_bounds(h: int, chunk: int, halo: int):
    """Uniform-size extended slices [(start, lo_off)] covering [0, h) in
    `chunk`-row steps: ext row range [start, start + chunk + 2*halo) with
    start clamped to the image, lo_off = where the chunk's first valid row
    sits inside the ext slice.  Uniform sizes keep one compiled kernel
    shape for every chunk."""
    ext = min(h, chunk + 2 * halo)
    out = []
    for c0 in range(0, h, chunk):
        start = min(max(0, c0 - halo), h - ext)
        out.append((start, c0 - start))
    return ext, out


def band_stereo_core_chunked(img_l, img_r, arms_l, arms_r, cfg,
                             interpret: bool = False):
    """Cost init + 4-pass aggregation + WTA for both eyes, streamed over
    row chunks of cfg.band_row_chunk output rows.  Exact: each chunk's
    halo (2*usd for the V passes, +3 rows of image for the census window)
    is recomputed from the real neighboring rows.

    Returns (disp_l, disp_r) float32.
    """
    from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern

    h = img_l.shape[0]
    usd = cfg.usd
    if usd > 64:
        raise ValueError("band engine requires usd <= 64 (256-wide kernel "
                         "windows); use engine='xla' for larger arms")
    chunk = cfg.band_row_chunk or h
    halo = 2 * usd
    ext, bounds = _chunk_bounds(h, chunk, halo)

    disp_parts_l, disp_parts_r = [], []
    for start, lo in bounds:
        # image slice with +-3 census margin (clamped at true borders)
        i0, i1 = max(0, start - 3), min(h, start + ext + 3)
        sl_img = slice(i0, i1)
        c_lo = start - i0                  # cost rows inside the img slice
        cost_l, cost_r = ci_adcensus_kern(
            img_l[sl_img], img_r[sl_img], cfg.ad_coeff, cfg.census_coeff,
            cfg.num_disp, cfg.zero_disp, interpret=interpret)
        cost_l = cost_l[c_lo:c_lo + ext]
        cost_r = cost_r[c_lo:c_lo + ext]

        sl = slice(start, start + ext)
        a_l, a_r = cross_aggregate_band_lr(
            cost_l, cost_r, arms_l[:, sl], arms_r[:, sl],
            cfg.band_nsplit, interpret)
        n_valid = min(chunk, h - (start + lo))
        v = slice(lo, lo + n_valid)
        disp_parts_l.append(
            (jnp.argmin(a_l[v], axis=2) - cfg.zero_disp).astype(F32))
        disp_parts_r.append(
            (jnp.argmin(a_r[v], axis=2) - cfg.zero_disp).astype(F32))
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
    the full previous-round disparity/outlier state."""
    from stereo_to_multiview_tpu.ops.irvkern import irv_round_kern
    h = disp_l.shape[0]
    usd = cfg.usd
    chunk = cfg.band_row_chunk or h
    ext, bounds = _chunk_bounds(h, chunk, usd)

    def one_round(state):
        dl, ol, dr_, orr = state
        parts = []
        for start, lo in bounds:
            sl = slice(start, start + ext)
            disp = jnp.concatenate([dl[sl], dr_[sl]], axis=0)
            outl = jnp.concatenate([ol[sl], orr[sl]], axis=0)
            arms = jnp.concatenate([arms_l[:, sl], arms_r[:, sl]], axis=1)
            nd, no = irv_round_kern(disp, outl, arms, cfg.irv_thresh_s,
                                    cfg.irv_thresh_h, cfg.num_disp,
                                    cfg.zero_disp, usd, interpret)
            n_valid = min(chunk, h - (start + lo))
            v = slice(lo, lo + n_valid)
            vr = slice(ext + lo, ext + lo + n_valid)
            parts.append((nd[v], no[v], nd[vr], no[vr]))
        if len(parts) == 1:
            return parts[0]
        return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                     for i in range(4))

    state = (disp_l, outl_l, disp_r, outl_r)
    for _ in range(cfg.irv_iterations):
        state = one_round(state)
    dl, ol, dr_, orr = state
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
                              nsplit=1, interpret=interpret)
        hist = band_span_sum_v(row, up, down, inclusive=True,
                               nsplit=1, interpret=interpret)
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
