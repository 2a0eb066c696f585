"""Input demultiplexing (reference d_demux_common.cu)."""

from __future__ import annotations

import jax.numpy as jnp


def demux_sbs(sbs: jnp.ndarray):
    """Split an (H, 2W, 3) side-by-side frame into left/right (H, W, 3).
    Semantics: d_demux_common.cu:8-33 (columns [0, W) -> left)."""
    w = sbs.shape[1] // 2
    return sbs[:, :w], sbs[:, w:2 * w]


def demux_rgb(img: jnp.ndarray):
    """Split (H, W, 3) BGR into (r, g, b) planes. d_demux_common.cu:35-48."""
    return img[:, :, 2], img[:, :, 1], img[:, :, 0]
