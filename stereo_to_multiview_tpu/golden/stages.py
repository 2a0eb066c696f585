"""NumPy golden reference for every pipeline stage. See package docstring.

Conventions: images are (H, W, 3) uint8 BGR; grayscale (H, W) uint8; census
codes (H, W) uint64 (48 active bits); cost volumes (D, H, W) float32 with the
disparity hypothesis leading; arms (4, H, W) int32 ordered UP, DOWN, LEFT,
RIGHT (d_ca_cross.cu:9-15); masks (H, W) float32.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32

UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3

__all__ = [
    "UP", "DOWN", "LEFT", "RIGHT",
    "demux_sbs", "demux_rgb", "mux_average", "mux_merge_ab",
    "census_transform_9x7", "ci_ad", "ci_census", "ci_adcensus_combine",
    "ci_adcensus", "cross_arms", "cross_aggregate", "cross_aggregate_q",
    "dc_wta", "dc_hslo", "dr_dcc",
    "dr_irv", "filter_bilateral", "filter_gaussian_lift", "filter_bleed",
    "filter_median", "dibr_occl", "dibr_occl_to_mask", "dibr_backward_warp",
    "dibr_dbm", "dibr_forward_warp", "op_invertnormf", "mux_multiview",
    "tx_scale_bilinear", "tx_scale_nearest", "tx_disp_scale",
    "bilinear_interp_u8", "bilinear_interp_f32",
    "gaussian_kernel_2d", "gaussian_lut_1d",
]


# ---------------------------------------------------------------------------
# demux / mux commons
# ---------------------------------------------------------------------------

def demux_sbs(sbs: np.ndarray):
    """Split side-by-side frame into (left, right). d_demux_common.cu:8-33."""
    w = sbs.shape[1] // 2
    return sbs[:, :w].copy(), sbs[:, w:2 * w].copy()


def demux_rgb(img: np.ndarray):
    """Split interleaved BGR into (r, g, b) planes. d_demux_common.cu:35-48."""
    return img[:, :, 2].copy(), img[:, :, 1].copy(), img[:, :, 0].copy()


def mux_average(img: np.ndarray) -> np.ndarray:
    """BGR -> gray with uniform 1/3 weights and truncating uint8 store.
    d_mux_common.cu:7-21."""
    c = F32(0.3333333333333)
    acc = img[:, :, 0].astype(F32) * c
    acc = acc + img[:, :, 1].astype(F32) * c
    acc = acc + img[:, :, 2].astype(F32) * c
    return acc.astype(np.uint8)  # float->uchar truncates


def mux_merge_ab(img_b: np.ndarray, img_a: np.ndarray, mask_a: np.ndarray):
    """out = (uchar)((1-m)*B) + (uchar)(m*A) per channel -- each term is
    truncated to uint8 *before* the add (d_mux_common.cu:43-45)."""
    m = mask_a.astype(F32)[:, :, None]
    term_a = (m * img_a.astype(F32)).astype(np.uint8)
    term_b = ((F32(1.0) - m) * img_b.astype(F32)).astype(np.uint8)
    return term_b + term_a


# ---------------------------------------------------------------------------
# cost initialization
# ---------------------------------------------------------------------------

def census_transform_9x7(gray: np.ndarray) -> np.ndarray:
    """48-bit census code of a grayscale image over a 9(w)x7(h) window.

    Bit set iff neighbor < center; neighbors on the anchor row (y==0) or
    anchor column (x==0) are excluded; clamp-to-edge sampling; bits packed
    raster-order, shift-then-set. d_ci_census.cu:18-50.
    """
    h, w = gray.shape
    g = gray.astype(np.int32)
    code = np.zeros((h, w), np.uint64)
    ys = np.arange(h)
    xs = np.arange(w)
    for dy in range(-3, 4):
        cy = np.clip(ys + dy, 0, h - 1)
        for dx in range(-4, 5):
            if dx == 0 or dy == 0:
                continue
            cx = np.clip(xs + dx, 0, w - 1)
            bit = (g[cy][:, cx] < g).astype(np.uint64)
            code = (code << np.uint64(1)) + bit
    return code


def _clip_x(idx: np.ndarray, w: int) -> np.ndarray:
    return np.clip(idx, 0, w - 1)


def ci_ad(img_l: np.ndarray, img_r: np.ndarray, num_disp: int, zero_disp: int):
    """Absolute-difference cost volumes (cost_l, cost_r), each (D, H, W) f32.

    cost_l[d, y, x] = mean_c |L[y,x,c] - R[y, clamp(x + (d - zd)), c]| / 3
    (times the f32 constant 0.33333333333), cost_r mirrored.
    d_ci_ad.cu:73-159 (ci_ad_kernel_5).
    """
    h, w, _ = img_l.shape
    li = img_l.astype(np.int32)
    ri = img_r.astype(np.int32)
    third = F32(0.33333333333)
    xs = np.arange(w)
    cost_l = np.empty((num_disp, h, w), F32)
    cost_r = np.empty((num_disp, h, w), F32)
    for d in range(num_disp):
        off = d - zero_disp
        r_sh = ri[:, _clip_x(xs + off, w)]
        l_sh = li[:, _clip_x(xs - off, w)]
        sl = np.abs(li - r_sh).astype(F32).sum(axis=2)
        sr = np.abs(ri - l_sh).astype(F32).sum(axis=2)
        cost_l[d] = sl * third
        cost_r[d] = sr * third
    return cost_l, cost_r


def _hamdist64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(x.shape, np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def ci_census(census_l: np.ndarray, census_r: np.ndarray,
              num_disp: int, zero_disp: int):
    """Hamming-distance cost volumes from census codes.
    d_ci_census.cu:197-254 (ci_census_kernel_6)."""
    h, w = census_l.shape
    xs = np.arange(w)
    cost_l = np.empty((num_disp, h, w), F32)
    cost_r = np.empty((num_disp, h, w), F32)
    for d in range(num_disp):
        off = d - zero_disp
        cost_l[d] = _hamdist64(census_l, census_r[:, _clip_x(xs + off, w)])
        cost_r[d] = _hamdist64(census_r, census_l[:, _clip_x(xs - off, w)])
    return cost_l, cost_r


def ci_adcensus_combine(ad_cost, census_cost, ad_coeff, census_coeff):
    """Robust exp combination: (1-e^{-C_ad/l_ad}) + (1-e^{-C_c/l_c}).
    d_ci_adcensus.cu:10-36."""
    inv_ad = F32(1.0 / ad_coeff)
    inv_c = F32(1.0 / census_coeff)
    a = F32(1.0) - np.exp(-ad_cost * inv_ad, dtype=F32)
    c = F32(1.0) - np.exp(-census_cost * inv_c, dtype=F32)
    return (a + c).astype(F32)


def ci_adcensus(img_l, img_r, ad_coeff, census_coeff, num_disp, zero_disp):
    """Full cost-init stage: gray -> census -> AD + hamming -> combine.
    d_ci_adcensus.cu:38-186 (d_ci_adcensus)."""
    ad_l, ad_r = ci_ad(img_l, img_r, num_disp, zero_disp)
    cen_l = census_transform_9x7(mux_average(img_l))
    cen_r = census_transform_9x7(mux_average(img_r))
    cc_l, cc_r = ci_census(cen_l, cen_r, num_disp, zero_disp)
    return (ci_adcensus_combine(ad_l, cc_l, ad_coeff, census_coeff),
            ci_adcensus_combine(ad_r, cc_r, ad_coeff, census_coeff))


# ---------------------------------------------------------------------------
# cross-based aggregation
# ---------------------------------------------------------------------------

def cross_arms(img: np.ndarray, ucd: float, lcd: float, usd: int, lsd: int):
    """Adaptive cross arm lengths (4, H, W) int32, order UP/DOWN/LEFT/RIGHT.

    Loop transcription of ca_cross_construction_kernel (d_ca_cross.cu:17-172).
    Quirk preserved: the arm value is written *before* the color test, so an
    arm ending on a color-test failure at distance k has length k, while an
    arm ending at the image border has length k-1.
    """
    h, w, _ = img.shape
    c = img.astype(np.int32)
    arms = np.zeros((4, h, w), np.int32)
    dirs = {UP: (-1, 0), DOWN: (1, 0), LEFT: (0, -1), RIGHT: (0, 1)}
    for a, (dy, dx) in dirs.items():
        for y in range(h):
            for x in range(w):
                anchor = c[y, x]
                prev = anchor
                for k in range(1, usd + 1):
                    ny, nx = y + dy * k, x + dx * k
                    if not (0 <= ny < h and 0 <= nx < w):
                        break
                    arms[a, y, x] = k
                    cur = c[ny, nx]
                    ac = np.max(np.abs(cur - anchor))
                    cp = np.max(np.abs(cur - prev))
                    if k > lsd:
                        if float(ac) > ucd:
                            break
                    else:
                        if float(ac) > lcd or float(cp) > lcd:
                            break
                    prev = cur
    return arms


def _dir_sum(vol: np.ndarray, arm_neg: np.ndarray, arm_pos: np.ndarray,
             axis: int) -> np.ndarray:
    """sum over the half-open span [i - arm_neg, i + arm_pos) along `axis`
    (per-pixel arms).  Matches ca_cross_hsum_kernel_3 / vhsum_kernel_2
    (d_ca_cross_sum.cu:286-291,:191-194): note the *exclusive* right end --
    a zero positive arm excludes the anchor itself."""
    d, h, w = vol.shape
    v64 = vol.astype(np.float64)
    cs = np.cumsum(v64, axis=axis)
    pad = [(0, 0)] * 3
    pad[axis] = (1, 0)
    cs = np.pad(cs, pad)  # cs[i+1] = sum(v[:i+1]); cs[0] = 0
    n = vol.shape[axis]
    idx = np.arange(h if axis == 1 else w)
    if axis == 1:
        i = idx[None, :, None]
        hi = np.clip(i + arm_pos[None], 0, n)          # exclusive end
        lo = np.clip(i - arm_neg[None], 0, n)
        hi_b = np.broadcast_to(hi, vol.shape)
        lo_b = np.broadcast_to(lo, vol.shape)
        out = (np.take_along_axis(cs, hi_b, axis=1)
               - np.take_along_axis(cs, lo_b, axis=1))
    else:
        i = idx[None, None, :]
        hi = np.clip(i + arm_pos[None], 0, n)
        lo = np.clip(i - arm_neg[None], 0, n)
        hi_b = np.broadcast_to(hi, vol.shape)
        lo_b = np.broadcast_to(lo, vol.shape)
        out = (np.take_along_axis(cs, hi_b, axis=2)
               - np.take_along_axis(cs, lo_b, axis=2))
    return out.astype(F32)


def cross_aggregate(cost: np.ndarray, arms: np.ndarray) -> np.ndarray:
    """Four-pass cross aggregation in the reference's live order H,V,V,H
    (d_ca_cross.cu:255-271 -- hsum, transpose, vhsum, vhsum, transpose,
    hsum; NOT the paper's H,V,H,V).  Each pass re-reads the previous pass's
    output; arm spans are half-open (see _dir_sum)."""
    a = _dir_sum(cost, arms[LEFT], arms[RIGHT], axis=2)
    a = _dir_sum(a, arms[UP], arms[DOWN], axis=1)
    a = _dir_sum(a, arms[UP], arms[DOWN], axis=1)
    a = _dir_sum(a, arms[LEFT], arms[RIGHT], axis=2)
    return a


def cross_aggregate_q(cost: np.ndarray, arms: np.ndarray,
                      max_arm: int, digits: int = 2) -> np.ndarray:
    """Golden for the quantized band-engine aggregation
    (ops.band.band_aggregate_q): cost (D, H, W) f32 is quantized once to
    round(cost*127) integers, the four H,V,V,H half-open span passes run
    in exact integer arithmetic, and the volume is rescaled by
    floor(x * 2^-s + 0.5) after passes 1, 2 and 3 (shifts fixed by
    max_arm and the digit count; s1 = 0 on the exact digits=2 path).
    Same pass structure as cross_aggregate; the TPU kernels must match
    this bit for bit."""
    from stereo_to_multiview_tpu.ops.band import agg_rescale_shifts
    s1, s2, s3 = agg_rescale_shifts(max_arm, digits)
    # quantize in f32 exactly like the kernel (tie behavior included)
    q = np.rint(cost.astype(F32) * F32(127.0)).astype(F32)
    a = _dir_sum(q, arms[LEFT], arms[RIGHT], axis=2)
    if s1:
        a = np.floor(a * 2.0 ** -s1 + 0.5).astype(F32)
    a = _dir_sum(a, arms[UP], arms[DOWN], axis=1)
    a = np.floor(a * 2.0 ** -s2 + 0.5).astype(F32)
    a = _dir_sum(a, arms[UP], arms[DOWN], axis=1)
    a = np.floor(a * 2.0 ** -s3 + 0.5).astype(F32)
    a = _dir_sum(a, arms[LEFT], arms[RIGHT], axis=2)
    return a


# ---------------------------------------------------------------------------
# disparity computation / refinement
# ---------------------------------------------------------------------------

def dc_hslo(cost: np.ndarray, gray_l: np.ndarray, gray_r: np.ndarray,
            num_disp: int, zero_disp: int, T: float, H1: float, H2: float,
            sign: int = +1) -> np.ndarray:
    """Golden for the horizontal scanline optimization (ops.hslo.dc_hslo).

    The reference's d_dc_hslo.cu is an inert stub, but its penalty scheme
    is real (dc_hslo_h_cdiff_kernel, d_dc_hslo.cu:73-93): P1/P2 tiers
    keyed on the color gradients of both images at the matching columns
    (full / one-quarter / one-tenth strength).  This transcribes the DP
    those penalties set up -- the AD-Census SO recurrence along rows,
    both directions, averaged -- in explicit per-column f32 NumPy with the
    exact operation order of the lax.scan, so the jit path must match bit
    for bit.  cost: (D, H, W); sign=+1 left eye, -1 right.
    """
    dd, h, w = cost.shape
    own = (gray_r if sign < 0 else gray_l).astype(F32)
    oth = (gray_l if sign < 0 else gray_r).astype(F32)
    idx = np.arange(w)
    xm1 = np.clip(idx - 1, 0, w - 1)
    d1 = np.abs(own - own[:, xm1])
    d2f = np.abs(oth - oth[:, xm1])
    d2 = np.stack([d2f[:, np.clip(idx + sign * (k - zero_disp), 0, w - 1)]
                   for k in range(num_disp)])
    small1 = d1[None] < np.float32(T)
    small2 = d2 < np.float32(T)
    scale = np.where(small1 & small2, np.float32(1.0),
                     np.where(small1 | small2, np.float32(0.25),
                              np.float32(0.1)))
    p1 = np.float32(H1) * scale
    p2 = np.float32(H2) * scale
    big = np.float32(1e30)

    def scan(reverse):
        out = np.empty_like(cost, dtype=F32)
        cols = range(w - 1, -1, -1) if reverse else range(w)
        prev = None
        for x in cols:
            if prev is None:
                cur = cost[:, :, x].astype(F32)
            else:
                mn = prev.min(axis=0, keepdims=True)
                up = np.concatenate([prev[1:], np.full((1, h), big, F32)])
                dn = np.concatenate([np.full((1, h), big, F32), prev[:-1]])
                best = np.minimum(np.minimum(prev, mn + p2[:, :, x]),
                                  np.minimum(up, dn) + p1[:, :, x])
                cur = (cost[:, :, x] + best) - mn
            out[:, :, x] = cur
            prev = cur
        return out

    return (scan(False) + scan(True)) * np.float32(0.5)


def dc_wta(cost: np.ndarray, zero_disp: int) -> np.ndarray:
    """First-minimum argmin over D; disp = argmin - zero_disp (float).
    d_dc_wta.cu:9-35."""
    return (np.argmin(cost, axis=0) - zero_disp).astype(F32)


def dr_dcc(disp_l: np.ndarray, disp_r: np.ndarray, thresh: float = 1.0):
    """Left-right consistency + disocclusion classification.

    outliers: 0 ok, 1 mismatch, 2 mismatch&disoccluded. d_dr_dcc.cu:18-128.
    """
    h, w = disp_l.shape
    xs = np.arange(w)[None, :]

    def check(d_a, d_b, sign):
        coord = np.clip(xs + sign * d_a.astype(np.int32), 0, w - 1)
        d_ref = np.take_along_axis(d_b, coord, axis=1)
        return (np.abs(d_a - d_ref) > F32(thresh)).astype(np.uint8)

    out_l = check(disp_l, disp_r, +1)
    out_r = check(disp_r, disp_l, -1)

    # forward scatter: pixels never hit remain disoccluded (init 1, hit -> 0)
    dis_l = np.ones((h, w), np.uint8)
    dis_r = np.ones((h, w), np.uint8)
    tgt_r = np.clip(xs + disp_l.astype(np.int32), 0, w - 1)
    tgt_l = np.clip(xs - disp_r.astype(np.int32), 0, w - 1)
    rows = np.arange(h)[:, None]
    dis_r[rows, tgt_r] = 0
    dis_l[rows, tgt_l] = 0

    out_l = np.where((out_l == 1) & (dis_l == 1), 2, out_l).astype(np.uint8)
    out_r = np.where((out_r == 1) & (dis_r == 1), 2, out_r).astype(np.uint8)
    return out_l, out_r


def dr_irv(disp: np.ndarray, outliers: np.ndarray, arms: np.ndarray,
           thresh_s: int, thresh_h: float, num_disp: int, zero_disp: int,
           usd: int, iterations: int):
    """Iterative region voting (d_dr_irv.cu:134-220 pre + :17-43 vote).

    Per iteration, for each outlier pixel p: histogram int(disp[q])+zd over
    reliable q in p's full cross region (vertical arms of p x horizontal
    arms of each covered row, all bounds inclusive); 65 bins; winner is the
    first maximal non-empty bin, else int(disp[p]).  Vote accepted iff
    reliable > thresh_s and (max_d + zero_disp)/reliable > thresh_h (the
    reference divides the *disparity*, not the bin count -- dr_irv_kernel_3:36).
    All updates within an iteration are synchronous.
    """
    h, w = disp.shape
    disp = disp.copy()
    outliers = outliers.copy()
    for _ in range(iterations):
        new_disp = disp.copy()
        new_out = outliers.copy()
        reliable_mask = outliers == 0
        dint = disp.astype(np.int32)
        for y in range(h):
            for x in range(w):
                if outliers[y, x] == 0:
                    continue
                u = min(int(arms[UP, y, x]), usd)
                dn = int(arms[DOWN, y, x])
                max_d = int(disp[y, x])  # trunc toward zero of current value
                hist = np.zeros(65, np.int64)
                total = 0
                for yy in range(y - u, y + dn + 1):
                    l = int(arms[LEFT, yy, x])
                    r = int(arms[RIGHT, yy, x])
                    for xx in range(x - l, x + r + 1):
                        if reliable_mask[yy, xx]:
                            hist[dint[yy, xx] + zero_disp] += 1
                            total += 1
                max_bin = 0
                for i in range(65):
                    if hist[i] > max_bin:
                        max_bin = int(hist[i])
                        max_d = i - zero_disp
                if total > thresh_s and (max_d + zero_disp) / max(total, 1) > thresh_h \
                        and total > 0:
                    new_out[y, x] = 0
                    new_disp[y, x] = F32(max_d)
        disp, outliers = new_disp, new_out
    return disp, outliers


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------

def gaussian_kernel_2d(radius: int, sigma: float) -> np.ndarray:
    """generateGaussianKernel (d_filter_gaussian.cu:244-255)."""
    k = np.empty((2 * radius + 1, 2 * radius + 1), F32)
    var = F32(sigma) ** 2
    for y in range(-radius, radius + 1):
        for x in range(-radius, radius + 1):
            k[y + radius, x + radius] = np.exp(
                -(F32(x) ** 2 + F32(y) ** 2) / (2 * var)) / (2 * np.pi * var)
    return k.astype(F32)


def gaussian_lut_1d(size: int, sigma: float) -> np.ndarray:
    """generateGaussian1D (d_filter_bilateral.cu:35-39)."""
    i = np.arange(size, dtype=F32)
    var = F32(sigma) ** 2
    return (np.exp(-(i ** 2) / (2 * var)) / np.sqrt(2 * np.pi * var)).astype(F32)


def _clamp_win(img: np.ndarray, y: np.ndarray, x: np.ndarray):
    h, w = img.shape
    return img[np.clip(y, 0, h - 1)][:, np.clip(x, 0, w - 1)]


def filter_gaussian_lift(img: np.ndarray, radius: int, sigma: float):
    """'Lifting' Gaussian: out = max(input, blur(input)), clamp-to-edge,
    norm over the full kernel. d_filter_gaussian.cu:9-88."""
    h, w = img.shape
    k = gaussian_kernel_2d(radius, sigma)
    res = np.zeros((h, w), np.float64)
    ys, xs = np.arange(h), np.arange(w)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            res += k[dy + radius, dx + radius] * _clamp_win(img, ys + dy, xs + dx)
    blurred = (res / k.sum()).astype(F32)
    return np.maximum(img.astype(F32), blurred)


def filter_bilateral(img: np.ndarray, radius: int, sigma_color: float,
                     sigma_spatial: float, num_disp: int) -> np.ndarray:
    """Bilateral on the disparity map; range weight from a 1D LUT of length
    num_disp indexed by trunc(|delta|). d_filter_bilateral.cu:222-304,517-568."""
    h, w = img.shape
    sk = gaussian_kernel_2d(radius, sigma_spatial)
    lut = gaussian_lut_1d(num_disp, sigma_color)
    ys, xs = np.arange(h), np.arange(w)
    num = np.zeros((h, w), np.float64)
    den = np.zeros((h, w), np.float64)
    a = img.astype(F32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            s = _clamp_win(img, ys + dy, xs + dx).astype(F32)
            widx = np.abs(a - s).astype(np.int32)  # trunc
            wgt = sk[dy + radius, dx + radius] * lut[widx]
            num += wgt * s
            den += wgt
    return (num / den).astype(F32)


def _bleed_coord(i: np.ndarray, off: int, n: int) -> np.ndarray:
    """filter_bleed edge rule (d_filter.cu:124-127): negative -> mirror;
    past the end -> n-1-off (offset, not coordinate, subtracted)."""
    s = i + off
    s = np.where(s < 0, -s, s)
    s = np.where(i + off > n - 1, n - 1 - off, s)
    return s


def filter_bleed(img: np.ndarray, radius: int) -> np.ndarray:
    """Binary mask dilation: 1 if >30% of the (2r+1)^2 neighborhood is
    non-zero, else passthrough. d_filter.cu:105-139."""
    h, w = img.shape
    ksz = (2 * radius + 1) ** 2
    cnt = np.zeros((h, w), np.int32)
    ys, xs = np.arange(h), np.arange(w)
    for dy in range(-radius, radius + 1):
        sy = _bleed_coord(ys, dy, h)
        for dx in range(-radius, radius + 1):
            sx = _bleed_coord(xs, dx, w)
            cnt += (img[sy][:, sx] > 0).astype(np.int32)
    return np.where(cnt > (ksz - 1) * 0.30, np.uint8(1), img).astype(np.uint8)


def filter_median(img: np.ndarray) -> np.ndarray:
    """3x3 median.  The reference kernel reads out of bounds at borders
    (d_filter.cu:22-27 has no clamping -- UB); we define clamp-to-edge and
    document the divergence.  Interior pixels match exactly."""
    h, w = img.shape
    stack = np.empty((9, h, w), img.dtype)
    ys, xs = np.arange(h), np.arange(w)
    i = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            stack[i] = _clamp_win(img, ys + dy, xs + dx)
            i += 1
    return np.median(stack, axis=0).astype(img.dtype)


# ---------------------------------------------------------------------------
# DIBR
# ---------------------------------------------------------------------------

def dibr_occl(disp_l: np.ndarray, disp_r: np.ndarray):
    """Forward-scatter visibility masks: occl_r[clamp(x + trunc(disp_l))]=1,
    occl_l[clamp(x - trunc(disp_r))]=1.  (The CUDA scatter race is benign:
    every writer writes 1.) d_dibr_occl.cu:114-159."""
    h, w = disp_l.shape
    xs = np.arange(w)[None, :]
    rows = np.arange(h)[:, None]
    occl_l = np.zeros((h, w), np.uint8)
    occl_r = np.zeros((h, w), np.uint8)
    occl_r[rows, np.clip(xs + disp_l.astype(np.int32), 0, w - 1)] = 1
    occl_l[rows, np.clip(xs - disp_r.astype(np.int32), 0, w - 1)] = 1
    return occl_l, occl_r


def dibr_occl_to_mask(occl: np.ndarray) -> np.ndarray:
    """uchar {0,1} -> float {0,1}; values !=1 map to 0. d_dibr_occl.cu:17-31."""
    return (occl == 1).astype(F32)


def bilinear_interp_u8(img: np.ndarray, cx: np.ndarray, cy: np.ndarray):
    """alu_bilinear_interp (d_alu.cu:45-71): floor corners, +1 neighbors
    clamped to the far edge only, truncating uint8 return. Channel-last."""
    h, w = img.shape[:2]
    x0 = np.floor(cx).astype(np.int32)
    y0 = np.floor(cy).astype(np.int32)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = (cx - x0).astype(F32)
    wy = (cy - y0).astype(F32)
    if img.ndim == 3:
        wx = wx[..., None]
        wy = wy[..., None]
    v00 = img[y0, x0].astype(F32)
    v01 = img[y0, x1].astype(F32)
    v10 = img[y1, x0].astype(F32)
    v11 = img[y1, x1].astype(F32)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy  # float; caller truncates


def bilinear_interp_f32(img: np.ndarray, cx: np.ndarray, cy: np.ndarray):
    """alu_bilinear_interp_f (d_alu.cu:17-43)."""
    return bilinear_interp_u8(img.astype(F32), cx, cy)


def dibr_backward_warp(img_in: np.ndarray, mask: np.ndarray, disp: np.ndarray,
                       shift: float) -> np.ndarray:
    """Gather warp: out[x] = trunc_u8(bilinear(in, clamp(x + disp*shift)) *
    mask[x]). d_dibr_bwarp.cu:5-22."""
    h, w, _ = img_in.shape
    xs = np.arange(w, dtype=F32)[None, :]
    sx = np.clip(xs + disp.astype(F32) * F32(shift), F32(0), F32(w - 1))
    sy = np.broadcast_to(np.arange(h, dtype=F32)[:, None], (h, w))
    val = bilinear_interp_u8(img_in, sx, sy)
    # reference truncates the interp to uchar first, then multiplies by mask
    # and truncates again ((unsigned char)((float)interp_u8 * mask))
    val = val.astype(np.uint8).astype(F32) * mask.astype(F32)[:, :, None]
    return val.astype(np.uint8)


def dibr_dbm(img_l, img_r, disp_l, disp_r, mask_l, mask_r, shift,
             feather_radius=10, feather_sigma=15.0):
    """Backward-mapped intermediate view at `shift` in from the right.

    warp L with the *right* eye's disparity/mask at -shift, warp R with the
    left's at 1-shift; blend weight = lifted-Gaussian-feathered (1 - mask_r).
    d_dibr_bwarp.cu:24-70.
    """
    view_from_l = dibr_backward_warp(img_l, mask_r, disp_r, -shift)
    view_from_r = dibr_backward_warp(img_r, mask_l, disp_l, 1.0 - shift)
    m = filter_gaussian_lift(op_invertnormf(mask_r), feather_radius, feather_sigma)
    return mux_merge_ab(view_from_l, view_from_r, m)


def dibr_forward_warp(img_in: np.ndarray, disp: np.ndarray, shift: float):
    """Forward scatter warp out[clamp(x + trunc(disp*shift))] = in[x].

    The CUDA kernel (d_dibr_fwarp.cu:9-25) is racy (last-writer-wins, no
    z-buffer); we define the deterministic rule 'largest source x wins',
    equal to sequential ascending-x writes.  Unhit targets stay 0.
    """
    h, w, c = img_in.shape
    out = np.zeros_like(img_in)
    xs = np.arange(w)[None, :]
    tgt = np.clip(xs + (disp.astype(F32) * F32(shift)).astype(np.int32), 0, w - 1)
    rows = np.arange(h)[:, None]
    out[rows, tgt] = img_in  # ascending x: later (larger) x overwrite
    return out


def op_invertnormf(v: np.ndarray) -> np.ndarray:
    """v -> 1 - v (d_op.cu:7-16)."""
    return (F32(1.0) - v.astype(F32)).astype(F32)


# ---------------------------------------------------------------------------
# multiview mux
# ---------------------------------------------------------------------------

def mux_multiview(views, num_rows_out: int, num_cols_out: int, angle: float):
    """Slanted-lenticular interlace of V views into one output frame.

    views: list/array of V images (H, W, 3), view 0 = right source, view
    V-1 = left source (d_io.cu:182-183).  Per output pixel and color
    subpixel, pick the view via the slant geometry and sample it bilinearly
    at the input-resolution coordinates. d_mux_multiview.cu:38-84,126-153.
    """
    views = np.asarray(views)
    v_cnt, h_in, w_in, _ = views.shape
    y_interval = F32(v_cnt / np.tan(angle * np.pi / 180.0) / 3.0)
    inv_y = F32(1.0) / y_interval

    ty = np.arange(num_rows_out)
    tx = np.arange(num_cols_out)
    y_mod = int(np.floor(y_interval + 0.5))  # C round(): half away, positive
    y_view = (ty % max(y_mod, 1) + F32(1.0)).astype(F32)
    y_view = y_view * F32(v_cnt) * inv_y
    x_view = (tx[None, :] * 3 + y_view.astype(np.int32)[:, None]) % v_cnt
    r_view = x_view  # already non-negative
    g_view = (r_view + 1) % v_cnt
    b_view = (r_view + 2) % v_cnt

    x_samp = np.clip((tx.astype(F32) / F32(num_cols_out)) * F32(w_in),
                     0, F32(w_in - 1))
    y_samp = np.clip((ty.astype(F32) / F32(num_rows_out)) * F32(h_in),
                     0, F32(h_in - 1))
    sx = np.broadcast_to(x_samp[None, :], (num_rows_out, num_cols_out))
    sy = np.broadcast_to(y_samp[:, None], (num_rows_out, num_cols_out))

    out = np.empty((num_rows_out, num_cols_out, 3), np.uint8)
    # sample every view once, then select (golden clarity over speed)
    sampled = np.stack([bilinear_interp_u8(v, sx, sy).astype(np.uint8)
                        for v in views])  # (V, H, W, 3)
    rr, cc = np.meshgrid(np.arange(num_rows_out), np.arange(num_cols_out),
                         indexing="ij")
    out[:, :, 0] = sampled[b_view, rr, cc, 0]
    out[:, :, 1] = sampled[g_view, rr, cc, 1]
    out[:, :, 2] = sampled[r_view, rr, cc, 2]
    return out


# ---------------------------------------------------------------------------
# rescale transforms
# ---------------------------------------------------------------------------

def _samp_coords(n_out: int, n_in: int) -> np.ndarray:
    i = np.arange(n_out, dtype=F32)
    return np.clip(i / F32(n_out) * F32(n_in), F32(0), F32(n_in - 1))


def tx_scale_bilinear(img: np.ndarray, out_rows: int, out_cols: int):
    """Bilinear image resize (d_tx_scale.cu:30-52)."""
    h, w = img.shape[:2]
    sx = _samp_coords(out_cols, w)[None, :]
    sy = _samp_coords(out_rows, h)[:, None]
    sx = np.broadcast_to(sx, (out_rows, out_cols))
    sy = np.broadcast_to(sy, (out_rows, out_cols))
    return bilinear_interp_u8(img, sx, sy).astype(np.uint8)


def tx_scale_nearest(img: np.ndarray, out_rows: int, out_cols: int):
    """Nearest (truncating) resize (d_tx_scale.cu:54-80)."""
    h, w = img.shape[:2]
    sx = _samp_coords(out_cols, w).astype(np.int32)
    sy = _samp_coords(out_rows, h).astype(np.int32)
    return img[sy][:, sx].copy()


def tx_disp_scale(disp: np.ndarray, out_rows: int, out_cols: int,
                  disp_scale: float):
    """Bilinear disparity resize with value scaling (d_tx_scale.cu:8-27)."""
    h, w = disp.shape
    sx = np.broadcast_to(_samp_coords(out_cols, w)[None, :], (out_rows, out_cols))
    sy = np.broadcast_to(_samp_coords(out_rows, h)[:, None], (out_rows, out_cols))
    return (bilinear_interp_f32(disp, sx, sy) * F32(disp_scale)).astype(F32)
