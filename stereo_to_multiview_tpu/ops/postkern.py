"""Pallas TPU kernels for the post-refinement stages.

The XLA select-shift formulations of the bilateral filter ((2r+1)^2
shifted planes, ~33 ms at 1080p both eyes) stop fusing at these chain
lengths and materialize intermediates.  This kernel streams row blocks:
the disparity map is edge-padded once in XLA, three consecutive row
blocks are resident in VMEM, and every (dy, dx) tap is a static sublane
slice + a lane-roll window -- one fused VPU pass per tap, no HBM
intermediates.

Semantics match ops.filters.filter_bilateral (d_filter_bilateral.cu:
222-304 with the LUT replaced by direct exp on the truncated index);
values agree with the XLA path to f32 tolerance (the kernel iterates
dx-outer to share lane rolls, so the f32 accumulation order differs).
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
_VMEM_LIMIT = 96 * 1024 * 1024


def _window(chunks, lo: int, rows: int):
    """128-lane window at static offset `lo` within three consecutive
    (rows, 128) chunks (cf. ops.costkern._window)."""
    k = lo // _LANE
    r = lo % _LANE
    a, b = chunks[k], chunks[min(k + 1, 2)]
    if r == 0:
        return a
    rolled_a = pltpu.roll(a, _LANE - r, axis=1)
    rolled_b = pltpu.roll(b, _LANE - r, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANE), 1)
    return jnp.where(lane < _LANE - r, rolled_a, rolled_b)


def _bilat_kernel(b0, b1, b2, out_ref, *, radius: int, sk, inv_2var: float,
                  lut_scale: float, n_tiles: int):
    """One _ROWS-row step.  b0/b1/b2: consecutive (ROWS, WP + 256) row
    blocks of the edge-padded map; the output rows are b1's rows.

    Loop order dx-outer: the lane-roll window is built ONCE per dx on
    the full 3-block row span and every dy is then a free sublane slice
    -- (2r+1) rolls per tile instead of (2r+1)^2."""
    full = jnp.concatenate([b0[:], b1[:], b2[:]], axis=0)  # (3R, WP+256)

    for t in range(n_tiles):
        base = _PAD + t * _LANE
        center = full[_ROWS:2 * _ROWS, base:base + _LANE]
        num = jnp.zeros((_ROWS, _LANE), F32)
        den = jnp.zeros((_ROWS, _LANE), F32)
        chunks = [full[:, base - _LANE + k * _LANE:base + k * _LANE]
                  for k in range(3)]
        for dx in range(-radius, radius + 1):
            w = _window(chunks, _LANE + dx, 3 * _ROWS)
            for dy in range(-radius, radius + 1):
                s = w[_ROWS + dy:2 * _ROWS + dy]
                t_i = jnp.floor(jnp.abs(center - s))
                rw = jnp.exp(-(t_i * t_i) * F32(inv_2var)) * F32(lut_scale)
                wgt = F32(sk[dy + radius, dx + radius]) * rw
                num = num + wgt * s
                den = den + wgt
        out_ref[:, t * _LANE:(t + 1) * _LANE] = num / den


_ARMROWS = 64   # rows per grid step in the arms kernel (>= usd reach)


def _arms_kernel(row0_ref, b0, b1, b2, up_ref, dn_ref, *, usd: int,
                 lsd: int, ucd: float, lcd: float, g_h: int, rows: int):
    """UP and DOWN arm lengths for one `rows`-row block.

    b0/b1/b2: consecutive (3, rows, WP) channel-plane row blocks of the
    row-padded image (vertical reach usd <= rows); every sample at y -+ k
    is a static sublane slice -- no rolls, no gathers.  The LEFT/RIGHT
    arms are this same kernel on the (W, H) transpose.

    Reference semantics (d_ca_cross.cu:41-69, quirk included): the arm
    value is written before the color test, so arm = sum_k [in_bounds(k)
    and no color failure at any j < k]; tiers (k <= lsd vs beyond) per
    dc_ca_cross's two-threshold rule.

    The walk is evaluated as arm = min(A, B): A = number of k whose
    color tests all passed before them (alive is monotone), B = the
    in-bounds reach clamp(border_dist, 0, usd) -- exactly the quirky
    sum above, with the per-k bounds test hoisted out of the loop.

    Round-3 formulation: the anchor-vs-walked compare is SYMMETRIC
    (maxdiff(row j, row j+k) serves DOWN at anchor j and UP at anchor
    j+k), so one per-k plane F_k over rows [R-usd, 2R) feeds both
    directions as sublane slices -- halving the color arithmetic.  The
    alive/count chain is replaced by a running prefix-max of
    g_k = compare_k - threshold_k (monotone failure <=> G_k > 0), so
    arm = 1 + sum_{k<usd} [G_k <= 0]: one bf16 max + one compare + one
    add per (k, direction), and the last iteration's compare vanishes
    (its failure is never observable -- the reference writes the arm
    before testing, d_ca_cross.cu:41-69).  All values are integers
    <= 255 with integer thresholds, exact in bf16; the compares/counts
    stay f32 (this Mosaic has no bf16 vector compares).
    """
    y = pl.program_id(0)
    full = jnp.concatenate([b0[:], b1[:], b2[:]], axis=1)  # (3, 3R, WP)
    wp = full.shape[2]
    # lane-tiled inner loop: full-width carried values ((rows, WP) ~ 128
    # vregs each, ~10 live) spill catastrophically; 256-lane tiles keep
    # the working set register-resident
    tw = 2 * _LANE if wp % (2 * _LANE) == 0 else _LANE
    for x0 in range(0, wp, tw):
        blk = full[:, :, x0:x0 + tw].astype(jnp.bfloat16)  # (3, 3R, tw)
        # ndm[j] = max_c |row j - row j+1|: the k<=lsd "previous pixel"
        # diff for every (r, k, dy) is one sublane slice of this plane
        d01 = jnp.abs(blk[:, :-1] - blk[:, 1:])
        ndm = jnp.maximum(jnp.maximum(d01[0], d01[1]), d01[2])
        base = blk[:, rows - usd:2 * rows]           # (3, R + usd, tw)
        g_y = (jax.lax.broadcasted_iota(jnp.int32, (rows, tw), 0)
               + y * rows + row0_ref[0])
        count_up = jnp.ones((rows, tw), F32)
        count_dn = jnp.ones((rows, tw), F32)
        g_up = g_dn = None
        for k in range(1, usd):
            walked = blk[:, rows - usd + k:2 * rows + k]
            fk = jnp.maximum(
                jnp.maximum(jnp.abs(base[0] - walked[0]),
                            jnp.abs(base[1] - walked[1])),
                jnp.abs(base[2] - walked[2]))        # (R + usd, tw)
            if k <= lsd:
                t = jnp.bfloat16(lcd)
                gd = jnp.maximum(fk[usd:],
                                 ndm[rows + k - 1:2 * rows + k - 1]) - t
                gu = jnp.maximum(fk[usd - k:2 * usd - k + rows][:rows],
                                 ndm[rows - k:2 * rows - k]) - t
            else:
                gf = fk - jnp.bfloat16(ucd)
                gd = gf[usd:]
                gu = gf[usd - k:usd - k + rows]
            g_dn = gd if g_dn is None else jnp.maximum(g_dn, gd)
            g_up = gu if g_up is None else jnp.maximum(g_up, gu)
            count_dn = count_dn + (g_dn.astype(F32) <= F32(0.0))
            count_up = count_up + (g_up.astype(F32) <= F32(0.0))
        for dy, out_ref, count in ((-1, up_ref, count_up),
                                   (1, dn_ref, count_dn)):
            bound = jnp.clip(g_y if dy < 0 else g_h - 1 - g_y, 0, usd)
            out_ref[:, x0:x0 + tw] = jnp.minimum(
                count.astype(jnp.int32), bound)


@functools.partial(jax.jit, static_argnames=("ucd", "lcd", "usd", "lsd",
                                             "g_h", "rows", "interpret"))
def _arms_vertical(planes: jnp.ndarray, ucd: float, lcd: float, usd: int,
                   lsd: int, row0=0, g_h: int | None = None,
                   rows: int | None = None, interpret: bool = False):
    """(3, H, W) i32 channel planes -> (up, dn) (H, W) i32 arm lengths.
    row0 (traced ok) / g_h: global row coordinates for halo-extended row
    shards (see ops.cross._arm_length).  rows: walk-axis rows per grid
    step (must be >= usd: the y+-1 neighbor blocks carry the reach)."""
    _, h, w = planes.shape
    if g_h is None:
        g_h = h
    r = rows if rows is not None else max(8, -(-usd // 8) * 8)
    if r < usd:
        raise ValueError("arms row block must cover usd")
    hp = -(-h // r) * r
    wp = -(-w // _LANE) * _LANE
    p = jnp.pad(planes, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")
    p = jnp.pad(p, ((0, 0), (r, r), (0, 0)))   # block-aligned row halo
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)

    spec = lambda d: pl.BlockSpec((3, r, wp),
                                  lambda y, f, d=d: (0, y + d, 0),
                                  memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((r, wp), lambda y, f: (y, 0),
                         memory_space=pltpu.VMEM)
    up, dn = pl.pallas_call(
        functools.partial(_arms_kernel, usd=usd, lsd=lsd, ucd=float(ucd),
                          lcd=float(lcd), g_h=g_h, rows=r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(hp // r,),
            in_specs=[spec(0), spec(1), spec(2)],
            out_specs=(ospec, ospec)),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.int32),) * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(row0_arr, p, p, p)
    return up[:h, :w], dn[:h, :w]


def cross_arms_kern(img: jnp.ndarray, ucd: float, lcd: float, usd: int,
                    lsd: int, row_offset=None, global_h: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """(4, H, W) int32 cross arms (UP, DOWN, LEFT, RIGHT) via two Pallas
    passes: vertical arms on the natural layout, horizontal arms as
    vertical arms on the (W, H) transpose -- every sample is a static
    sublane slice.  Identical values to ops.cross.cross_arms, including
    the halo-shard row_offset/global_h contract."""
    if usd > _ARMROWS:
        raise ValueError(f"cross_arms_kern supports usd <= {_ARMROWS}")
    planes = jnp.moveaxis(img.astype(jnp.int32), 2, 0)       # (3, H, W)
    row0 = 0 if row_offset is None else row_offset
    up, dn = _arms_vertical(planes, ucd, lcd, usd, lsd, row0=row0,
                            g_h=global_h, interpret=interpret)
    pt = jnp.swapaxes(planes, 1, 2)                          # (3, W, H)
    left_t, right_t = _arms_vertical(pt, ucd, lcd, usd, lsd,
                                     interpret=interpret)
    return jnp.stack([up, dn, left_t.T, right_t.T])


def cross_arms_kern_lr(img_l: jnp.ndarray, img_r: jnp.ndarray, ucd: float,
                       lcd: float, usd: int, lsd: int, row_offset=None,
                       global_h: int | None = None,
                       interpret: bool = False):
    """Both eyes' cross arms in two Pallas calls instead of four: the
    eyes are stacked along the LANE axis of each orientation (the walk
    axis is H for U/D and W for L/R, so the stack never crosses a walk;
    both eyes share the same border bounds).  Returns (arms_l, arms_r),
    each identical to cross_arms_kern."""
    if usd > _ARMROWS:
        raise ValueError(f"cross_arms_kern supports usd <= {_ARMROWS}")
    pl_l = jnp.moveaxis(img_l.astype(jnp.int32), 2, 0)    # (3, H, W)
    pl_r = jnp.moveaxis(img_r.astype(jnp.int32), 2, 0)
    h, w = img_l.shape[:2]
    row0 = 0 if row_offset is None else row_offset

    both_v = jnp.concatenate([pl_l, pl_r], axis=2)        # (3, H, 2W)
    up, dn = _arms_vertical(both_v, ucd, lcd, usd, lsd, row0=row0,
                            g_h=global_h, interpret=interpret)
    both_h = jnp.concatenate([jnp.swapaxes(pl_l, 1, 2),
                              jnp.swapaxes(pl_r, 1, 2)], axis=2)
    lt, rt = _arms_vertical(both_h, ucd, lcd, usd, lsd,
                            interpret=interpret)          # (W, 2H)
    arms_l = jnp.stack([up[:, :w], dn[:, :w],
                        lt[:, :h].T, rt[:, :h].T])
    arms_r = jnp.stack([up[:, w:], dn[:, w:],
                        lt[:, h:].T, rt[:, h:].T])
    return arms_l, arms_r


_DCCXT = 128    # xm dcc: x sublanes per grid step (window = 3 blocks)
_DCCYL = 128    # xm dcc: image rows per grid step (lane axis)


def _dcc_kernel_xm(dl0, dl1, dl2, dr0, dr1, dr2, out_l_ref, out_r_ref,
                   s_dl, s_dr, s_fl, s_fr, *, w: int, thresh: float,
                   with_labels: bool, d_min: int, d_max: int):
    """Cross-check labels (d_dr_dcc.cu:35-82) / occlusion hits
    (d_dibr_occl.cu:114-128) for both eyes, x-major: disparity planes
    transposed to (W, H) so every d-offset window is a SUBLANE slice of
    three consecutive 128-x blocks, held in VMEM scratch for dynamic
    slicing.

    Data-adaptive value loop: exactly one integer d matches each pixel's
    truncated disparity, and only d values PRESENT in this block's
    windows can match anything -- so the loop runs over [block min,
    block max] (clamped to the static [d_min, d_max] search range) as a
    dynamic-bound fori_loop.  On real content the per-block disparity
    range is a small fraction of the full search range; on adversarial
    input it degrades to the static loop.  Exact in all cases.

    The consistency compare stays on float disparities
    (d_dr_dcc.cu:57-82); all masks run at 32 bits (no packed 16-bit
    vector compares on this VPU).
    """
    x0 = pl.program_id(0)
    xt = _DCCXT
    full = jnp.concatenate([dl0[:], dl1[:], dl2[:]], axis=0)  # (3XT, YL)
    full_r = jnp.concatenate([dr0[:], dr1[:], dr2[:]], axis=0)
    tl = jnp.trunc(full)                              # toward zero
    tr = jnp.trunc(full_r)

    # full-width iota: Mosaic cannot lane-replicate an (N, 1) i1 mask
    i_abs = (jax.lax.broadcasted_iota(jnp.int32, (3 * xt, _DCCYL), 0)
             - xt + x0 * xt).astype(F32)
    invalid = (i_abs < F32(0.0)) | (i_abs >= F32(w))
    big = F32(16384.0)
    # sentinel: out-of-image writers never match any d
    s_dl[...] = jnp.where(invalid, big, tl)
    s_dr[...] = jnp.where(invalid, big, tr)
    if with_labels:
        s_fl[...] = full
        s_fr[...] = full_r
    dl_c = tl[xt:2 * xt]
    dr_c = tr[xt:2 * xt]

    d_lo = jnp.maximum(
        jnp.minimum(jnp.min(tl), jnp.min(tr)).astype(jnp.int32),
        jnp.int32(d_min))
    d_hi = jnp.minimum(
        jnp.maximum(jnp.max(tl), jnp.max(tr)).astype(jnp.int32),
        jnp.int32(d_max))

    zero = jnp.zeros((xt, _DCCYL), F32)
    init = (zero, zero, zero, zero) if with_labels else (zero, zero)

    def body(d, carry):
        df = d.astype(F32)
        lo = xt + d                                  # window row of x+d
        hi = xt - d                                  # window row of x-d
        hit_l = jnp.maximum(carry[0],
                            (s_dr[pl.ds(lo, xt), :] == df).astype(F32))
        hit_r = jnp.maximum(carry[1],
                            (s_dl[pl.ds(hi, xt), :] == df).astype(F32))
        if not with_labels:
            return (hit_l, hit_r)
        # consistency reads d_r[x+dl(x)] / d_l[x-dr(x)]; the edge pad IS
        # the clamp on the read side
        ref_l = jnp.where(dl_c == df, s_fr[pl.ds(lo, xt), :], carry[2])
        ref_r = jnp.where(dr_c == df, s_fl[pl.ds(hi, xt), :], carry[3])
        return (hit_l, hit_r, ref_l, ref_r)

    res = jax.lax.fori_loop(d_lo, d_hi + 1, body, init)
    hit_l = res[0].astype(jnp.int32)
    hit_r = res[1].astype(jnp.int32)

    if not with_labels:
        out_l_ref[...] = hit_l
        out_r_ref[...] = hit_r
        return

    # mm ? (hit ? 1 : 2) : 0  ==  mm * (2 - hit), arithmetic (no
    # scalar-splat selects -- Mosaic relayout limitation)
    mm_l = (jnp.abs(full[xt:2 * xt] - res[2]) > F32(thresh)) \
        .astype(jnp.int32)
    mm_r = (jnp.abs(full_r[xt:2 * xt] - res[3]) > F32(thresh)) \
        .astype(jnp.int32)
    out_l_ref[...] = mm_l * (2 - hit_l)
    out_r_ref[...] = mm_r * (2 - hit_r)


@functools.partial(jax.jit, static_argnames=("thresh", "with_labels",
                                             "num_disp", "zero_disp",
                                             "transposed", "interpret"))
def dcc_occl_kern(disp_l: jnp.ndarray, disp_r: jnp.ndarray,
                  thresh: float = 1.0, with_labels: bool = True,
                  num_disp: int | None = None,
                  zero_disp: int | None = None,
                  transposed: bool = False,
                  interpret: bool = False):
    """with_labels=True: dr_dcc outlier labels (uint8 0/1/2) for both
    eyes.  False: dibr_occl visibility hits (uint8 0/1).
    num_disp/zero_disp bound the disparity reach (<= 128 columns); a
    tighter bound shrinks the value loop.  Runs x-major (_dcc_kernel_xm):
    every d-offset window is a static sublane slice.  transposed=True
    returns the kernel's native (W, H) orientation (the transposed
    synthesis chain consumes it directly, skipping two full-plane XLA
    relayouts)."""
    h, w = disp_l.shape
    xt, yl = _DCCXT, _DCCYL
    if num_disp is None or zero_disp is None:
        dvals = tuple(range(-_PAD, _PAD + 1))
    else:
        if max(zero_disp, num_disp - zero_disp) > _PAD:
            raise ValueError("disparity reach exceeds 128 columns")
        dvals = tuple(range(-zero_disp, num_disp - zero_disp))
    wp = -(-w // xt) * xt
    hp = -(-h // yl) * yl

    def prep(d):
        dt = d.astype(F32).T                          # (W, H)
        dt = jnp.pad(dt, ((0, wp - w), (0, hp - h)), mode="edge")
        # x reach: one full block each side, edge values = read clamp
        return jnp.pad(dt, ((xt, xt), (0, 0)), mode="edge")

    spec = lambda d: pl.BlockSpec((xt, yl), lambda x, y, d=d: (x + d, y),
                                  memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((xt, yl), lambda x, y: (x, y),
                         memory_space=pltpu.VMEM)
    pl_l, pl_r = prep(disp_l), prep(disp_r)
    scratch = pltpu.VMEM((3 * xt, yl), jnp.float32)
    out_l, out_r = pl.pallas_call(
        functools.partial(_dcc_kernel_xm, w=w, thresh=float(thresh),
                          with_labels=with_labels, d_min=dvals[0],
                          d_max=dvals[-1]),
        grid=(wp // xt, hp // yl),
        in_specs=[spec(0), spec(1), spec(2)] * 2,
        out_specs=(ospec, ospec),
        out_shape=(jax.ShapeDtypeStruct((wp, hp), jnp.int32),) * 2,
        scratch_shapes=[scratch] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(pl_l, pl_l, pl_l, pl_r, pl_r, pl_r)
    if not transposed:
        out_l = out_l.T[:h, :w]
        out_r = out_r.T[:h, :w]
    else:
        out_l = out_l[:w, :h]
        out_r = out_r[:w, :h]

    # Border-clamp patch: the reference clamps scatter targets into the
    # image (d_dr_dcc.cu:57-82), so writers with x + d < 0 (or > w-1)
    # land on column 0 (w-1).  The kernel's value loop only catches
    # exact matches; OR in the clamped writers here (tiny slices).
    reach = _PAD if num_disp is None or zero_disp is None else max(
        zero_disp, num_disp - zero_disp)
    k = min(reach + 1, w)
    dl_i = disp_l.astype(jnp.int32)
    dr_i = disp_r.astype(jnp.int32)
    x_lo = jnp.arange(k, dtype=jnp.int32)[None, :]
    x_hi = jnp.arange(w - k, w, dtype=jnp.int32)[None, :]
    c_r0 = jnp.any(x_lo + dl_i[:, :k] < 0, axis=1)
    c_l0 = jnp.any(x_lo - dr_i[:, :k] < 0, axis=1)
    c_rw = jnp.any(x_hi + dl_i[:, w - k:] > w - 1, axis=1)
    c_lw = jnp.any(x_hi - dr_i[:, w - k:] > w - 1, axis=1)

    def edges(x):
        """(first, last) image-x lines of the label plane."""
        return (x[:, 0], x[:, w - 1]) if not transposed else (x[0], x[w - 1])

    def set_edges(x, e0, ew):
        if not transposed:
            return x.at[:, 0].set(e0).at[:, w - 1].set(ew)
        return x.at[0].set(e0).at[w - 1].set(ew)

    if with_labels:
        def patch(lab, c0, cw):
            e0, ew = edges(lab)
            return set_edges(lab, jnp.where(c0 & (e0 == 2), 1, e0),
                             jnp.where(cw & (ew == 2), 1, ew))
    else:
        def patch(hit, c0, cw):
            e0, ew = edges(hit)
            return set_edges(hit, jnp.maximum(e0, c0.astype(jnp.int32)),
                             jnp.maximum(ew, cw.astype(jnp.int32)))
    out_l = patch(out_l, c_l0, c_lw)
    out_r = patch(out_r, c_r0, c_rw)
    return out_l.astype(jnp.uint8), out_r.astype(jnp.uint8)


def _bleed_kernel(b0, b1, b2, out_ref, *, thresh: float, n_tiles: int):
    """Radius-1 bleed + occl_to_mask for one 8-row step.  b0/b1/b2:
    consecutive (ROWS, WP + 256) row blocks of the mirror-padded 0/1
    map; output f32 mask rows (b1's rows)."""
    full = jnp.concatenate([b0[:], b1[:], b2[:]], axis=0)  # (3R, WP+256)
    for t in range(n_tiles):
        base = _PAD + t * _LANE
        cnt = jnp.zeros((_ROWS, _LANE), jnp.float32)
        for dy in (-1, 0, 1):
            shifted = full[_ROWS + dy:2 * _ROWS + dy]
            chunks = [shifted[:, base - _LANE + k * _LANE:
                              base + k * _LANE] for k in range(3)]
            for dx in (-1, 0, 1):
                cnt = cnt + _window(chunks, _LANE + dx, _ROWS)
        ctr = full[_ROWS:2 * _ROWS, base:base + _LANE]
        out_ref[:, t * _LANE:(t + 1) * _LANE] = jnp.where(
            cnt > F32(thresh), F32(1.0), ctr)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def filter_bleed_mask_kern(occl_l: jnp.ndarray, occl_r: jnp.ndarray,
                           radius: int = 1, interpret: bool = False):
    """filter_bleed + dibr_occl_to_mask for both eyes in one Pallas call:
    f32 masks where >30% of the 3x3 neighborhood is set, else the input
    value (d_filter.cu:105-139 + d_dibr_occl.cu:17-31).

    Only radius 1 (both live paths, d_io.cu:167-168) -- at r=1 the
    reference's quirky edge rule (negative coords mirror, past-the-end
    maps to n-1-off) is exactly mirror padding, pre-baked here in XLA so
    the kernel is a pure 3x3 sum-threshold.  Bit-exact vs the XLA pair
    (integer counts; same threshold compare)."""
    if radius != 1:
        raise ValueError("filter_bleed_mask_kern supports radius 1 (the "
                         "live-path value); use ops.filter_bleed otherwise")
    h, w = occl_l.shape
    hp = -(-h // _ROWS) * _ROWS
    thresh = float((2 * radius + 1) ** 2 - 1) * 0.30

    # ONE kernel call for both eyes: each eye is mirror-padded on its own
    # (its radius-1 windows end at its own mirror column) and the two
    # blocks sit side by side -- no window can cross the seam, so the
    # result is bit-identical to two per-eye calls at half the launches
    # and grid steps.  Right eye's outputs start at column w + 2 (past
    # L's right mirror and R's left mirror).
    def mirror(x):
        x = x.astype(F32)
        x = jnp.concatenate([x[1:2], x, x[h - 2:h - 1]], axis=0)
        return jnp.concatenate([x[:, 1:2], x, x[:, w - 2:w - 1]], axis=1)

    off_r = w + 2                      # right eye's first output column
    wp = -(-(off_r + w) // _LANE) * _LANE
    a = jnp.concatenate([mirror(occl_l), mirror(occl_r)], axis=1)
    a = jnp.pad(a, ((_ROWS - 1, _ROWS - 1 + hp - h),
                    (_PAD - 1, _PAD + wp - (2 * w + 3))))

    spec = lambda d: pl.BlockSpec((_ROWS, wp + 2 * _PAD),
                                  lambda y, d=d: (y + d, 0),
                                  memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((_ROWS, wp), lambda y: (y, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bleed_kernel, thresh=thresh,
                          n_tiles=wp // _LANE),
        grid=(hp // _ROWS,),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(a, a, a)
    return out[:h, :w], out[:h, off_r:off_r + w]


@functools.partial(jax.jit, static_argnames=("radius", "sigma_color",
                                             "sigma_spatial", "num_disp",
                                             "interpret"))
def filter_bilateral_kern_lr(disp_l: jnp.ndarray, disp_r: jnp.ndarray,
                             radius: int, sigma_color: float,
                             sigma_spatial: float, num_disp: int,
                             interpret: bool = False):
    """Both eyes' bilateral filters in ONE kernel: the maps are stacked
    along W with a 2*radius edge-replicated spacer, so every tap of a
    left-eye pixel near the seam reads the left eye's replicated border
    (and vice versa) -- bit-identical to two per-eye calls for
    radius <= 8 (VERDICT r2 item 2: one call instead of two)."""
    if radius > 8:
        raise ValueError("filter_bilateral_kern_lr supports radius <= 8")
    h, w = disp_l.shape
    pad = 8
    seam = jnp.concatenate(
        [jnp.repeat(disp_l[:, w - 1:w], pad, axis=1),
         jnp.repeat(disp_r[:, 0:1], pad, axis=1)], axis=1)
    both = jnp.concatenate([disp_l, seam, disp_r], axis=1)
    out = filter_bilateral_kern(both, radius, sigma_color, sigma_spatial,
                                num_disp, interpret)
    return out[:, :w], out[:, w + 2 * pad:]


@functools.partial(jax.jit, static_argnames=("radius", "sigma_color",
                                             "sigma_spatial", "num_disp",
                                             "interpret"))
def filter_bilateral_kern(img: jnp.ndarray, radius: int, sigma_color: float,
                          sigma_spatial: float, num_disp: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Pallas bilateral filter of an (H, W) f32 disparity map; same
    contract as ops.filters.filter_bilateral."""
    from stereo_to_multiview_tpu.ops.filters import gaussian_kernel_2d
    del num_disp  # like the XLA path: only the LUT length depended on it
    if radius > _ROWS:
        raise ValueError(f"filter_bilateral_kern supports radius <= "
                         f"{_ROWS} (one row block of vertical reach)")
    sk = gaussian_kernel_2d(radius, sigma_spatial)
    var = float(np.float32(sigma_color)) ** 2
    lut_scale = 1.0 / float(np.sqrt(2 * np.pi * var))
    inv_2var = 1.0 / (2.0 * var)

    h, w = img.shape
    hp = -(-h // _ROWS) * _ROWS
    wp = -(-w // _LANE) * _LANE
    a = img.astype(F32)
    # edge padding: radius reach both axes, block-aligned (rows padded by
    # a full block so the y-1/y+1 blocks never clamp; the first/last
    # padded rows replicate the true border rows)
    a = jnp.pad(a, ((0, hp - h), (0, wp - w)), mode="edge")
    a = jnp.pad(a, ((_ROWS, _ROWS), (_PAD, _PAD)), mode="edge")

    spec = lambda d: pl.BlockSpec((_ROWS, wp + 2 * _PAD),
                                  lambda y, d=d: (y + d, 0),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bilat_kernel, radius=radius, sk=sk,
                          inv_2var=inv_2var, lut_scale=lut_scale,
                          n_tiles=wp // _LANE),
        grid=(hp // _ROWS,),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((_ROWS, wp), lambda y: (y, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(a, a, a)
    return out[:h, :w]
