"""Rescale transforms (reference d_tx_scale.cu), used by the low-resolution
disparity pipeline (adcensus_stm_2, d_io.cu:240-508)."""

from __future__ import annotations

import jax.numpy as jnp

from stereo_to_multiview_tpu.ops.mux import _bilinear_u8

F32 = jnp.float32


def _samp(n_out: int, n_in: int) -> jnp.ndarray:
    i = jnp.arange(n_out, dtype=F32)
    return jnp.clip(i / F32(n_out) * F32(n_in), F32(0.0), F32(n_in - 1))


def tx_scale_bilinear(img: jnp.ndarray, out_rows: int, out_cols: int):
    """Bilinear image resize (d_tx_scale.cu:30-52), truncating u8 output."""
    h, w = img.shape[:2]
    sx = jnp.broadcast_to(_samp(out_cols, w)[None, :], (out_rows, out_cols))
    sy = jnp.broadcast_to(_samp(out_rows, h)[:, None], (out_rows, out_cols))
    return _bilinear_u8(img, sx, sy).astype(jnp.uint8)


def tx_scale_nearest(img: jnp.ndarray, out_rows: int, out_cols: int):
    """Nearest (truncating) resize (d_tx_scale.cu:54-80)."""
    h, w = img.shape[:2]
    sx = _samp(out_cols, w).astype(jnp.int32)
    sy = _samp(out_rows, h).astype(jnp.int32)
    return img[sy][:, sx]


def tx_disp_scale(disp: jnp.ndarray, out_rows: int, out_cols: int,
                  disp_scale: float):
    """Bilinear disparity resize with value scaling by disp_scale
    (d_tx_scale.cu:8-27)."""
    h, w = disp.shape
    sx = jnp.broadcast_to(_samp(out_cols, w)[None, :], (out_rows, out_cols))
    sy = jnp.broadcast_to(_samp(out_rows, h)[:, None], (out_rows, out_cols))
    return (_bilinear_u8(disp.astype(F32), sx, sy) * F32(disp_scale)).astype(F32)
