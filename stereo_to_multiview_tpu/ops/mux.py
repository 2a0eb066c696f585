"""Channel muxing and the lenticular multiview interlace.

Reference: d_mux_common.cu (average, merge) and d_mux_multiview.cu
(mux_multiview_kernel_2, the live interlace kernel).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

F32 = jnp.float32


def mux_average(img: jnp.ndarray) -> jnp.ndarray:
    """BGR -> grayscale with uniform 1/3 weights and truncating uint8 store.
    d_mux_common.cu:7-21."""
    c = F32(0.3333333333333)
    acc = img[:, :, 0].astype(F32) * c
    acc = acc + img[:, :, 1].astype(F32) * c
    acc = acc + img[:, :, 2].astype(F32) * c
    return acc.astype(jnp.uint8)  # f32 -> u8 truncates toward zero


def mux_merge_ab(img_b: jnp.ndarray, img_a: jnp.ndarray,
                 mask_a: jnp.ndarray) -> jnp.ndarray:
    """Masked blend with the reference's observable double-truncation:
    out = (u8)((1-m)*B) + (u8)(m*A) per channel (d_mux_common.cu:43-45)."""
    m = mask_a.astype(F32)[:, :, None]
    term_a = (m * img_a.astype(F32)).astype(jnp.uint8)
    term_b = ((F32(1.0) - m) * img_b.astype(F32)).astype(jnp.uint8)
    return term_b + term_a


def _bilinear_u8(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray):
    """alu-style bilinear gather on channel-last uint8 (d_alu.cu:45-71):
    floor corners, +1 neighbors clamped to the far edge, float result."""
    h, w = img.shape[:2]
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (sx - x0.astype(F32))
    wy = (sy - y0.astype(F32))
    if img.ndim == 3:
        wx = wx[..., None]
        wy = wy[..., None]
    v00 = img[y0, x0].astype(F32)
    v01 = img[y0, x1].astype(F32)
    v10 = img[y1, x0].astype(F32)
    v11 = img[y1, x1].astype(F32)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def mux_multiview(views: jnp.ndarray, num_rows_out: int, num_cols_out: int,
                  angle: float) -> jnp.ndarray:
    """Slanted-lenticular interlace of (V, H, W, 3) views into
    (H_out, W_out, 3).  View 0 = right source, view V-1 = left source
    (d_io.cu:182-183).

    Geometry (d_mux_multiview.cu:38-84, :146): y_interval = V/tan(angle)/3;
    each output color subpixel selects a view by
    (3*tx + trunc((ty % round(y_i) + 1) * V / y_i)) mod V, offset +1 for G
    and +2 for B, and samples it bilinearly at input-resolution coords.
    """
    import numpy as np
    v_cnt, h_in, w_in = views.shape[:3]
    # geometry is static config math -- keep it in host NumPy f32 scalars
    y_interval = np.float32(v_cnt / math.tan(angle * math.pi / 180.0) / 3.0)
    inv_y = np.float32(1.0) / y_interval
    y_mod = max(int(math.floor(float(y_interval) + 0.5)), 1)  # C round()

    # Per-subpixel view indices are *static* (pure geometry, no data
    # dependence) -- host NumPy.
    ty = np.arange(num_rows_out)
    return _mux_interlace(views, num_rows_out, num_cols_out, y_mod,
                          inv_y, ty)


def mux_multiview_t(views_t: jnp.ndarray, angle: float) -> jnp.ndarray:
    """Transposed-domain interlace for identity output resolution (the
    fused band synthesis chain's layout): views_t (V, W, H, 3) uint8 ->
    interlaced (W, H, 3) uint8, value-identical to
    swapaxes(mux_multiview(swapaxes(views_t, 1, 2), H, W, angle), 0, 1).
    The view-id pattern is pure static geometry (d_mux_multiview.cu:
    38-84, :146) evaluated transposed; the select chain is elementwise,
    so no resampling path is needed (identity resolution only)."""
    import numpy as np
    v_cnt, w_in, h_in = views_t.shape[:3]
    y_interval = np.float32(v_cnt / math.tan(angle * math.pi / 180.0) / 3.0)
    inv_y = np.float32(1.0) / y_interval
    y_mod = max(int(math.floor(float(y_interval) + 0.5)), 1)  # C round()
    ty = np.arange(h_in)
    y_view = ((ty % y_mod).astype(np.float32) + np.float32(1.0)) \
        * np.float32(v_cnt) * inv_y
    tx = jnp.arange(w_in)
    x_view = (tx[:, None] * 3
              + jnp.asarray(y_view.astype(np.int32))[None, :]) % v_cnt
    view_id = jnp.stack([(x_view + 2) % v_cnt, (x_view + 1) % v_cnt,
                         x_view], axis=-1)            # (W, H, 3)
    out = jnp.zeros((w_in, h_in, 3), jnp.uint8)
    for v in range(v_cnt):
        out = jnp.where(view_id == v, views_t[v], out)
    return out


def mux_multiview_rows(views: jnp.ndarray, angle: float,
                       row_offset) -> jnp.ndarray:
    """Row-shard variant of mux_multiview for the halo-sharded pipeline:
    output resolution == input resolution (the interlace is then row-local)
    and the lenticular row phase uses the *global* row index
    row_offset + y (traced; see parallel.halo)."""
    v_cnt, h_in, w_in = views.shape[:3]
    y_interval = np.float32(v_cnt / math.tan(angle * math.pi / 180.0) / 3.0)
    inv_y = np.float32(1.0) / y_interval
    y_mod = max(int(math.floor(float(y_interval) + 0.5)), 1)  # C round()
    ty = jnp.arange(h_in) + row_offset
    return _mux_interlace(views, h_in, w_in, y_mod, inv_y, ty)


def mux_view_pattern(v_cnt: int, num_rows_out: int, num_cols_out: int,
                     angle: float, ty) -> jnp.ndarray:
    """(H_out, W_out, 3) int32 view id per BGR color subpixel: R at +0,
    G at +1, B at +2 (channel order is BGR, so channel 0 gets +2).
    `ty` is the output row index vector (NumPy for the static case,
    traced global rows in the sharded paths).
    Geometry: d_mux_multiview.cu:38-84, :146."""
    y_interval = np.float32(v_cnt / math.tan(angle * math.pi / 180.0) / 3.0)
    inv_y = np.float32(1.0) / y_interval
    y_mod = max(int(math.floor(float(y_interval) + 0.5)), 1)  # C round()
    tx = jnp.arange(num_cols_out)
    y_view = ((ty % y_mod).astype(jnp.float32) + np.float32(1.0)) \
        * np.float32(v_cnt) * inv_y
    x_view = (tx[None, :] * 3 + y_view.astype(jnp.int32)[:, None]) % v_cnt
    return jnp.stack([(x_view + 2) % v_cnt, (x_view + 1) % v_cnt, x_view],
                     axis=-1)


def _resample_mats(n_out: int, n_in: int):
    """One-hot select matrices + lerp weights for the interlace resample.
    The bilinear lerp is applied ELEMENTWISE over two one-hot matmul
    selects (not as a single 2-nonzero-weight matmul): one-hot dots are
    exact under any matmul blocking/FMA strategy, so the row-sharded
    interlace (parallel.halo slices these same matrices) matches the
    unsharded one bit-for-bit -- and the op order is exactly the
    reference's alu_bilinear_interp association (d_alu.cu:45-71)."""
    from stereo_to_multiview_tpu.ops.scale import _samp_np
    s = _samp_np(n_out, n_in)
    i0 = np.floor(s).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w = (s - i0.astype(np.float32)).astype(np.float32)
    cols = np.arange(n_out)
    m0 = np.zeros((n_in, n_out), np.float32)
    m1 = np.zeros((n_in, n_out), np.float32)
    m0[i0, cols] = np.float32(1.0)
    m1[i1, cols] = np.float32(1.0)
    return m0, m1, w


def resample_views_f32(views_f32, my0, my1, wy, mx0, mx1, wx):
    """(V, H, W, 3) f32 -> (V, H_out, W_out, 3) f32 bilinear resample:
    x-lerps then the y-lerp, each as two one-hot selects + an elementwise
    lerp (see _resample_mats).  Weight vectors wx (W_out,) / wy (H_out,)
    are f32."""
    import jax
    hp = jax.lax.Precision.HIGHEST
    one = np.float32(1.0)
    wx = jnp.asarray(wx)[None, None, :, None]
    wy = jnp.asarray(wy)[None, :, None, None]
    a0 = jnp.einsum("vhwc,wW->vhWc", views_f32, jnp.asarray(mx0),
                    precision=hp)
    a1 = jnp.einsum("vhwc,wW->vhWc", views_f32, jnp.asarray(mx1),
                    precision=hp)
    ax = a0 * (one - wx) + a1 * wx
    b0 = jnp.einsum("vhWc,hH->vHWc", ax, jnp.asarray(my0), precision=hp)
    b1 = jnp.einsum("vhWc,hH->vHWc", ax, jnp.asarray(my1), precision=hp)
    return b0 * (one - wy) + b1 * wy


def _mux_interlace(views, num_rows_out, num_cols_out, y_mod, inv_y, ty):
    """Shared interlace body; `ty` is the output row index vector (a NumPy
    array normally -- the view pattern folds to compile-time constants --
    or a traced global index in the halo-sharded path)."""
    import numpy as np
    v_cnt, h_in, w_in = views.shape[:3]
    tx = jnp.arange(num_cols_out)
    y_view = ((ty % y_mod).astype(jnp.float32) + np.float32(1.0)) \
        * np.float32(v_cnt) * inv_y
    x_view = (tx[None, :] * 3 + y_view.astype(jnp.int32)[:, None]) % v_cnt
    # (H_out, W_out, 3) view id per BGR color subpixel: R at +0, G at +1,
    # B at +2 (channel order is BGR, so channel 0 gets +2)
    view_id = jnp.stack([(x_view + 2) % v_cnt, (x_view + 1) % v_cnt, x_view],
                        axis=-1)

    # Resample every view to the output resolution (MXU matmul resize; u8
    # truncation matches fast_bilinear_interp's cast), then combine with a
    # one-hot select -- no gather HLO anywhere.  When output res == input
    # res (every BASELINE config, incl. 4K -> 16 views), the bilinear
    # resample is the identity (weights collapse to (1, 0); u8 values are
    # f32-exact), so the V full-frame resizes are skipped outright --
    # the interlace is then a pure V-way select.  Non-identity
    # resolutions resample all V views in two batched one-hot einsum
    # pairs + elementwise lerps (V x 3 riding the batch dims, not 2V
    # chained ops); the remaining V-factor vs the reference's
    # one-gather-per-subpixel (d_mux_multiview.cu:57-82) is the price of
    # a gather-free formulation and applies to no BASELINE config.
    #
    # A sparse "resample only the selected subpixels" factorization was
    # analyzed and is blocked for matmul resampling: the selected view
    # varies with the output ROW class (mod round(y_interval)) while the
    # column lattices of a view vary with that same class, so neither
    # contraction order can share work across classes -- column-first
    # needs V full column resamples (the current form), row-first needs
    # y_interval full row resamples.  Restoring O(1)/subpixel requires a
    # per-subpixel 2x2 gather, which TPUs price far above the V-factor
    # matmuls at these sizes.
    identity = (views.shape[1], views.shape[2]) == (num_rows_out,
                                                    num_cols_out)
    if identity:
        sampled_all = views
    else:
        my0, my1, wy = _resample_mats(num_rows_out, h_in)
        mx0, mx1, wx = _resample_mats(num_cols_out, w_in)
        sampled_all = resample_views_f32(
            views.astype(F32), my0, my1, wy, mx0, mx1, wx
        ).astype(jnp.uint8)
    out = jnp.zeros((num_rows_out, num_cols_out, 3), jnp.uint8)
    for v in range(v_cnt):
        out = jnp.where(view_id == v, sampled_all[v], out)
    return out
