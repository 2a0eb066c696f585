"""Cross-based adaptive support: arm construction + 4-pass aggregation.

TPU-native redesign (SURVEY.md section 7):
  * The reference's sequential break-on-threshold arm walk
    (d_ca_cross.cu:41-69) is a first-failure scan over a monotone predicate;
    we evaluate all `usd` offsets at once and reduce with a prefix-AND --
    identical arm lengths, fully vectorized.
  * The reference's O(arm) per-pixel sliding sums with transposes
    (d_ca_cross_sum.cu) become an inclusive prefix sum + two endpoint
    gathers -- O(1) per pixel, no transposes (XLA owns layout), and no
    1024-column block limit.

Arm order: UP, DOWN, LEFT, RIGHT (d_ca_cross.cu:9-15).
"""

from __future__ import annotations

import jax.numpy as jnp

from stereo_to_multiview_tpu.ops import shiftops

F32 = jnp.float32

UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3


def _arm_length(img_i32: jnp.ndarray, dy: int, dx: int,
                ucd: float, lcd: float, usd: int, lsd: int,
                row_offset=None, global_h: int | None = None) -> jnp.ndarray:
    """Arm length (H, W) int32 in direction (dy, dx).

    Reference quirk preserved (d_ca_cross.cu:41-69): the arm value is
    written *before* the color test, so a color failure at distance k
    yields arm k, while running off the image at distance k yields k-1.
    Therefore  arm = sum_k [ in_bounds(k) and no color failure at j < k ].
    (in_bounds is monotone, so the prefix-AND only needs the color tests.)

    row_offset/global_h: when the image is a halo-extended row shard of a
    larger frame (parallel.halo), vertical in-bounds tests use the global
    row coordinate row_offset + y against global_h.
    """
    h, w = img_i32.shape[:2]
    ys = jnp.arange(h)
    if row_offset is not None:
        g_ys = ys + row_offset
        g_h = global_h
    else:
        g_ys = ys
        g_h = h
    xs = jnp.arange(w)
    anchor = img_i32
    axis = 0 if dy else 1
    step = dy if dy else dx

    # Sequential accumulation: arm_k contributes iff offset k is in bounds
    # and no color test failed at any offset j < k.  Running the prefix-AND
    # as a carried scalar mask keeps everything a single fused elementwise
    # chain over (H, W) -- no (usd, H, W) stack / cumprod materialization.
    arm = jnp.zeros((h, w), jnp.int32)
    no_fail_before = jnp.ones((h, w), bool)
    prev = anchor
    for k in range(1, usd + 1):
        cur = shiftops.shift(img_i32, axis, step * k)
        ac = jnp.max(jnp.abs(cur - anchor), axis=-1).astype(F32)
        cp = jnp.max(jnp.abs(cur - prev), axis=-1).astype(F32)
        if k <= lsd:
            fail = (ac > F32(lcd)) | (cp > F32(lcd))
        else:
            fail = ac > F32(ucd)
        if dy:
            in_b = (g_ys + dy * k >= 0) & (g_ys + dy * k <= g_h - 1)
            in_b = in_b[:, None]
        else:
            in_b = (xs + dx * k >= 0) & (xs + dx * k <= w - 1)
            in_b = in_b[None, :]
        arm = arm + jnp.where(in_b & no_fail_before, 1, 0)
        no_fail_before = no_fail_before & ~fail
        prev = cur
    return arm


def cross_arms(img: jnp.ndarray, ucd: float, lcd: float,
               usd: int, lsd: int, row_offset=None,
               global_h: int | None = None) -> jnp.ndarray:
    """(4, H, W) int32 arm lengths for a (H, W, 3) uint8 image.
    row_offset/global_h: see _arm_length (halo-sharded operation)."""
    c = img.astype(jnp.int32)
    return jnp.stack([
        _arm_length(c, -1, 0, ucd, lcd, usd, lsd, row_offset, global_h),
        _arm_length(c, +1, 0, ucd, lcd, usd, lsd, row_offset, global_h),
        _arm_length(c, 0, -1, ucd, lcd, usd, lsd, row_offset, global_h),
        _arm_length(c, 0, +1, ucd, lcd, usd, lsd, row_offset, global_h),
    ])


def _span_sum(vol: jnp.ndarray, arm_neg: jnp.ndarray, arm_pos: jnp.ndarray,
              axis: int, max_arm: int) -> jnp.ndarray:
    """Per-pixel half-open span sum along `axis` of a (D, H, W) volume:
    out[i] = sum vol[i - arm_neg[i] : i + arm_pos[i]].

    Matches the reference's [x - arm_l, x + arm_r) loops
    (d_ca_cross_sum.cu:286-291): an arm_pos of 0 *excludes* the anchor.
    Implementation: exclusive prefix sum + two select-shift endpoint reads
    (O(1)/pixel; arms are bounded by `max_arm` = usd, so each endpoint is a
    short select chain over static slices -- no gather HLO, which is
    pathologically slow on TPU).
    """
    n = vol.shape[axis]
    m = n if max_arm is None else min(int(max_arm), n)
    cs = jnp.cumsum(vol, axis=axis, dtype=F32)
    pad = [(0, 0)] * vol.ndim
    pad[axis] = (1, 0)
    cs = jnp.pad(cs, pad)                     # cs[k] = sum(vol[:k]); len n+1
    hi = shiftops.select_gather(cs, arm_pos[None], axis, 0, m, out_len=n)
    lo = shiftops.select_gather(cs, -arm_neg[None], axis, -m, 0, out_len=n)
    return hi - lo


def cross_aggregate(cost: jnp.ndarray, arms: jnp.ndarray,
                    max_arm: int | None = None) -> jnp.ndarray:
    """Four-pass aggregation in the reference's live order H,V,V,H
    (d_ca_cross.cu:255-271; note NOT the paper's H,V,H,V -- SURVEY.md 3.4).
    Each pass consumes the previous pass's output.  `max_arm` is the static
    arm-length bound (the config's usd); None falls back to the axis
    length (correct but a longer select chain -- always pass usd on hot
    paths)."""
    a = _span_sum(cost, arms[LEFT], arms[RIGHT], axis=2, max_arm=max_arm)
    a = _span_sum(a, arms[UP], arms[DOWN], axis=1, max_arm=max_arm)
    a = _span_sum(a, arms[UP], arms[DOWN], axis=1, max_arm=max_arm)
    a = _span_sum(a, arms[LEFT], arms[RIGHT], axis=2, max_arm=max_arm)
    return a
