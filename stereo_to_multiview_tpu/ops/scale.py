"""Rescale transforms (reference d_tx_scale.cu), used by the low-resolution
disparity pipeline (adcensus_stm_2, d_io.cu:240-508) and the multiview
interlace's output-resolution resampling.

TPU-native design: a resize has *static* sampling coordinates, so it is a
pair of small dense matmuls (one per axis) with bilinear interpolation
weights baked into host-side NumPy matrices -- this runs on the MXU instead
of emitting a gather HLO (pathologically slow on TPU; see ops.shiftops).
The two-stage x-then-y application reproduces the reference's
alu_bilinear_interp association (top/bot x-lerps, then the y-lerp):
all but two weights per output row/column are exact zeros, so each stage
performs the same two-term lerp the reference does.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

F32 = jnp.float32


def _samp_np(n_out: int, n_in: int) -> np.ndarray:
    """Reference sampling coords in f32: clamp(i / n_out * n_in, 0, n_in-1)
    (d_tx_scale.cu:41-44 compute in float)."""
    i = np.arange(n_out, dtype=np.float32)
    return np.clip(i / np.float32(n_out) * np.float32(n_in),
                   np.float32(0.0), np.float32(n_in - 1))


def _linear_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_in, n_out) f32 matrix of bilinear weights: column i holds 1-wx at
    x0=floor(s_i) and wx at x1=min(x0+1, n_in-1)."""
    s = _samp_np(n_out, n_in)
    x0 = np.floor(s).astype(np.int64)
    x1 = np.minimum(x0 + 1, n_in - 1)
    wx = (s - x0.astype(np.float32)).astype(np.float32)
    m = np.zeros((n_in, n_out), np.float32)
    cols = np.arange(n_out)
    np.add.at(m, (x0, cols), np.float32(1.0) - wx)
    np.add.at(m, (x1, cols), wx)
    return m


def _nearest_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_in, n_out) one-hot matrix selecting trunc(s_i) (d_tx_scale.cu:54-80
    truncates the float coordinate)."""
    s = _samp_np(n_out, n_in).astype(np.int64)
    m = np.zeros((n_in, n_out), np.float32)
    m[s, np.arange(n_out)] = np.float32(1.0)
    return m


def _apply_resize(img_f32: jnp.ndarray, my: np.ndarray, mx: np.ndarray):
    """x-interp then y-interp via MXU matmuls; img (H, W) or (H, W, C)."""
    hp = jax.lax.Precision.HIGHEST
    squeeze = img_f32.ndim == 2
    a = img_f32[..., None] if squeeze else img_f32
    a = jnp.einsum("hwc,wW->hWc", a, jnp.asarray(mx), precision=hp)
    a = jnp.einsum("hWc,hH->HWc", a, jnp.asarray(my), precision=hp)
    return a[..., 0] if squeeze else a


def resize_bilinear_f32(img: jnp.ndarray, out_rows: int, out_cols: int):
    """Float bilinear resize with reference sampling/association; identity
    short-circuit when shapes match (sampling coords are then integral)."""
    h, w = img.shape[:2]
    a = img.astype(F32)
    if (h, w) == (out_rows, out_cols):
        return a
    return _apply_resize(a, _linear_matrix(out_rows, h),
                         _linear_matrix(out_cols, w))


def tx_scale_bilinear(img: jnp.ndarray, out_rows: int, out_cols: int):
    """Bilinear image resize (d_tx_scale.cu:30-52), truncating u8 output."""
    return resize_bilinear_f32(img, out_rows, out_cols).astype(jnp.uint8)


def tx_scale_nearest(img: jnp.ndarray, out_rows: int, out_cols: int):
    """Nearest (truncating) resize (d_tx_scale.cu:54-80)."""
    h, w = img.shape[:2]
    if (h, w) == (out_rows, out_cols):
        return img
    out = _apply_resize(img.astype(F32), _nearest_matrix(out_rows, h),
                        _nearest_matrix(out_cols, w))
    return out.astype(img.dtype)


def tx_disp_scale(disp: jnp.ndarray, out_rows: int, out_cols: int,
                  disp_scale: float):
    """Bilinear disparity resize with value scaling by disp_scale
    (d_tx_scale.cu:8-27)."""
    return (resize_bilinear_f32(disp, out_rows, out_cols)
            * F32(disp_scale)).astype(F32)
