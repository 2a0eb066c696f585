"""Post filters: lifting Gaussian, bilateral (LUT range weights), bleed
dilation, 3x3 median.  Reference: d_filter_gaussian.cu, d_filter_bilateral.cu,
d_filter.cu.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

F32 = jnp.float32


def gaussian_kernel_2d(radius: int, sigma: float) -> np.ndarray:
    """generateGaussianKernel (d_filter_gaussian.cu:244-255); host-side
    constant, baked into the graph."""
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1].astype(np.float32)
    var = np.float32(sigma) ** 2
    return (np.exp(-(x * x + y * y) / (2 * var)) / (2 * np.pi * var)
            ).astype(np.float32)


def gaussian_lut_1d(size: int, sigma: float) -> np.ndarray:
    """generateGaussian1D (d_filter_bilateral.cu:35-39)."""
    i = np.arange(size, dtype=np.float32)
    var = np.float32(sigma) ** 2
    return (np.exp(-(i * i) / (2 * var)) / np.sqrt(2 * np.pi * var)
            ).astype(np.float32)


def _edge_pad(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    return jnp.pad(img, ((radius, radius), (radius, radius)), mode="edge")


def filter_gaussian_lift(img: jnp.ndarray, radius: int, sigma: float):
    """out = max(input, gaussian_blur(input)), clamp-to-edge, normalized by
    the full kernel sum.  Used to feather DIBR blend masks upward only
    (d_filter_gaussian.cu:84-87).

    The 2D kernel exp(-(x^2+y^2)/2s^2) factors exactly, so the blur runs as
    two 1D passes (2*(2r+1) taps instead of (2r+1)^2)."""
    k1 = np.exp(-(np.arange(-radius, radius + 1, dtype=np.float64) ** 2)
                / (2.0 * float(sigma) ** 2))
    k2d_sum = float(gaussian_kernel_2d(radius, sigma).astype(np.float64).sum())
    scale = 1.0 / (2.0 * np.pi * float(sigma) ** 2)

    p = _edge_pad(img.astype(F32), radius)
    h, w = img.shape
    acc_r = jnp.zeros((h + 2 * radius, w), F32)
    for j, kv in enumerate(k1):
        acc_r = acc_r + F32(kv) * p[:, j:j + w]
    acc = jnp.zeros((h, w), F32)
    for i, kv in enumerate(k1):
        acc = acc + F32(kv) * acc_r[i:i + h]
    blurred = acc * F32(scale / k2d_sum)
    return jnp.maximum(img.astype(F32), blurred)


def filter_gaussian_lift_t(img_t: jnp.ndarray, radius: int, sigma: float):
    """filter_gaussian_lift on a TRANSPOSED (W, H) plane, preserving the
    natural-orientation accumulation order bit-exactly: the natural code
    blurs the image's x axis first (axis 1), which is axis 0 here, then
    y (axis 1 here).  filter_gaussian_lift_t(m.T) == filter_gaussian_lift(m).T
    to the last f32 bit -- the transposed synthesis chain depends on it."""
    k1 = np.exp(-(np.arange(-radius, radius + 1, dtype=np.float64) ** 2)
                / (2.0 * float(sigma) ** 2))
    k2d_sum = float(gaussian_kernel_2d(radius, sigma).astype(np.float64).sum())
    scale = 1.0 / (2.0 * np.pi * float(sigma) ** 2)

    p = _edge_pad(img_t.astype(F32), radius)
    w, h = img_t.shape
    acc_r = jnp.zeros((w, h + 2 * radius), F32)
    for j, kv in enumerate(k1):                 # image-x pass (axis 0 here)
        acc_r = acc_r + F32(kv) * p[j:j + w, :]
    acc = jnp.zeros((w, h), F32)
    for i, kv in enumerate(k1):                 # image-y pass (axis 1 here)
        acc = acc + F32(kv) * acc_r[:, i:i + h]
    blurred = acc * F32(scale / k2d_sum)
    return jnp.maximum(img_t.astype(F32), blurred)


def filter_bilateral(img: jnp.ndarray, radius: int, sigma_color: float,
                     sigma_spatial: float, num_disp: int) -> jnp.ndarray:
    """Edge-preserving smoothing of the float disparity map.

    Spatial weight from a precomputed 2D Gaussian; range weight from the
    1D Gaussian evaluated at trunc(|center - sample|)
    (d_filter_bilateral.cu:222-304; the reference reads a LUT built at
    :542-544 -- a data-dependent LUT read is a gather, pathological on
    TPU, so the Gaussian is evaluated directly on the truncated index:
    identical values up to exp rounding).  Clamp-to-edge.
    """
    sk = gaussian_kernel_2d(radius, sigma_spatial)
    var = np.float32(sigma_color) ** 2
    lut_scale = F32(1.0 / float(np.sqrt(2 * np.pi * var)))
    inv_2var = F32(1.0 / (2.0 * float(var)))
    h, w = img.shape
    a = img.astype(F32)
    p = _edge_pad(a, radius)
    num = jnp.zeros((h, w), F32)
    den = jnp.zeros((h, w), F32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            s = p[dy + radius:dy + radius + h, dx + radius:dx + radius + w]
            t = jnp.floor(jnp.abs(a - s))          # == the LUT index
            rw = jnp.exp(-(t * t) * inv_2var) * lut_scale
            wgt = F32(sk[dy + radius, dx + radius]) * rw
            num = num + wgt * s
            den = den + wgt
    return num / den


def _bleed_shift(x: jnp.ndarray, axis: int, off: int) -> jnp.ndarray:
    """x indexed by filter_bleed's quirky edge rule (d_filter.cu:124-127):
    s = i + off, negative coords mirrored (s -> -s), coords past the end
    map to n-1-off (the *offset* is subtracted -- a reference quirk we
    reproduce).  Built from static slices/flips only (no gather HLO)."""
    from stereo_to_multiview_tpu.ops import shiftops
    n = x.shape[axis]
    if off == 0:
        return x
    if off < 0:
        # i in [0, -off): s = -(i + off) = -off, -off-1, ..., 1  (reversed)
        head = shiftops.axis_slice(x, axis, 1, -off)
        head = jnp.flip(head, axis=axis)
        body = shiftops.axis_slice(x, axis, 0, n + off)
        return jnp.concatenate([head, body], axis=axis)
    # off > 0: i in [0, n-off): s = i + off; tail i > n-1-off: s = n-1-off
    body = shiftops.axis_slice(x, axis, off, n - off)
    tail = shiftops.axis_slice(x, axis, n - 1 - off, 1)
    reps = [1] * x.ndim
    reps[axis] = off
    tail = jnp.tile(tail, reps)
    return jnp.concatenate([body, tail], axis=axis)


def filter_bleed(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary-mask dilation: output 1 where more than 30% of the (2r+1)^2
    neighborhood is non-zero, else passthrough (d_filter.cu:105-139)."""
    h, w = img.shape
    ksz = (2 * radius + 1) ** 2
    nz = (img > 0).astype(jnp.int32)
    cnt = jnp.zeros((h, w), jnp.int32)
    for dy in range(-radius, radius + 1):
        row = _bleed_shift(nz, 0, dy)
        for dx in range(-radius, radius + 1):
            cnt = cnt + _bleed_shift(row, 1, dx)
    return jnp.where(cnt.astype(F32) > F32((ksz - 1) * 0.30),
                     jnp.uint8(1), img.astype(jnp.uint8))


def filter_median(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 median with clamp-to-edge.  (The reference kernel reads out of
    bounds at borders -- d_filter.cu:22-27 -- which is UB; interior matches
    exactly, borders are defined here.)"""
    p = _edge_pad(img, 1)
    h, w = img.shape
    stack = jnp.stack([p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    return jnp.median(stack, axis=0).astype(img.dtype)
