"""Cost initialization: census transform, AD cost, Hamming cost, AD-census
combination.  TPU-native data model: dense (D, H, W) float32 cost volumes
(disparity leading -- the natural sharding axis), census codes as TWO uint32
words per pixel (48 active bits; TPU has no native 64-bit integer path, and
two u32 popcounts vectorize cleanly on the VPU).

Reference semantics: d_ci_ad.cu:73-159 (ci_ad_kernel_5),
d_ci_census.cu:18-50 (tx_census_9x7_kernel_3) and :197-254
(ci_census_kernel_6), d_ci_adcensus.cu:10-36,38-186.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereo_to_multiview_tpu.ops import shiftops

F32 = jnp.float32


def census_transform_9x7(gray: jnp.ndarray) -> jnp.ndarray:
    """Census code of (H, W) uint8 grayscale over a 9(w)x7(h) window.

    Returns (H, W, 2) uint32: word 0 packs the 24 comparisons of rows
    y in {-3,-2,-1}, word 1 the rows y in {1,2,3} (x in {-4..4}\\{0} each,
    raster order, shift-then-set).  Bit set iff neighbor < center;
    clamp-to-edge.  Equivalent to the reference uint64 code split as
    (code >> 24, code & 0xFFFFFF).  d_ci_census.cu:18-50.
    """
    h, w = gray.shape
    g = gray.astype(jnp.int32)
    gp = shiftops.edge_pad(shiftops.edge_pad(g, 0, 3, 3), 1, 4, 4)

    words = []
    for rows in ((-3, -2, -1), (1, 2, 3)):
        word = jnp.zeros((h, w), jnp.uint32)
        for dy in rows:
            for dx in (-4, -3, -2, -1, 1, 2, 3, 4):
                nb = gp[3 + dy:3 + dy + h, 4 + dx:4 + dx + w]
                word = (word << 1) + (nb < g).astype(jnp.uint32)
        words.append(word)
    return jnp.stack(words, axis=-1)


def hamming48(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamming distance between (..., 2)-uint32 census codes -> (...) int32.
    Replaces the reference's 64-iteration bit loop (d_alu.cu:7-15) with two
    hardware popcounts."""
    x = a ^ b
    pc = jax.lax.population_count(x)
    return (pc[..., 0] + pc[..., 1]).astype(jnp.int32)


def _shifted(img: jnp.ndarray, num_disp: int, zero_disp: int, sign: int):
    """All clamped horizontal shifts of `img` (H, W, ...) for offsets
    sign*(d - zero_disp), d in [0, D).  Returns (D, H, W, ...).

    The reference's shared-memory tiles load with globally clamped
    coordinates (d_ci_ad.cu:102), so the effective read is clamp-to-edge;
    each disparity plane is a *static* shift, so the whole stack is D
    edge-padded slices -- no gather HLO (pathological on TPU).
    """
    return jnp.stack([
        shiftops.shift(img, 1, sign * (d - zero_disp))
        for d in range(num_disp)
    ])


def ci_ad(img_l: jnp.ndarray, img_r: jnp.ndarray,
          num_disp: int, zero_disp: int):
    """AD cost volumes (cost_l, cost_r), each (D, H, W) f32: per-channel
    absolute difference averaged with the f32 constant 0.33333333333.
    d_ci_ad.cu:131-158."""
    third = F32(0.33333333333)
    li = img_l.astype(jnp.int32)
    ri = img_r.astype(jnp.int32)
    r_sh = _shifted(ri, num_disp, zero_disp, +1)   # (D, H, W, 3)
    l_sh = _shifted(li, num_disp, zero_disp, -1)
    cost_l = jnp.abs(li[None] - r_sh).astype(F32).sum(-1) * third
    cost_r = jnp.abs(ri[None] - l_sh).astype(F32).sum(-1) * third
    return cost_l, cost_r


def ci_census(census_l: jnp.ndarray, census_r: jnp.ndarray,
              num_disp: int, zero_disp: int):
    """Hamming cost volumes from (H, W, 2)-u32 census codes.
    d_ci_census.cu:197-254."""
    r_sh = _shifted(census_r, num_disp, zero_disp, +1)  # (D, H, W, 2)
    l_sh = _shifted(census_l, num_disp, zero_disp, -1)
    cost_l = hamming48(census_l[None], r_sh).astype(F32)
    cost_r = hamming48(census_r[None], l_sh).astype(F32)
    return cost_l, cost_r


def ci_adcensus_combine(ad_cost, census_cost, ad_coeff: float,
                        census_coeff: float, fast_exp: bool = False):
    """C = (1 - e^{-C_ad/lambda_ad}) + (1 - e^{-C_census/lambda_census}).
    d_ci_adcensus.cu:27-34 (the reference's __expf is a fast-math exp; we
    use the exact one -- differences are < 1 ulp-ish and covered by the
    fidelity tolerance).  fast_exp evaluates the same expression with the
    polynomial exp (ops.fastmath.exp_neg) -- the reference twin of the
    Pallas cost kernels' quantized fast path."""
    if fast_exp:
        from stereo_to_multiview_tpu.ops.fastmath import exp_neg
        a = F32(1.0) - exp_neg(ad_cost * F32(1.0 / ad_coeff))
        c = F32(1.0) - exp_neg(census_cost * F32(1.0 / census_coeff))
        return a + c
    a = F32(1.0) - jnp.exp(-ad_cost * F32(1.0 / ad_coeff))
    c = F32(1.0) - jnp.exp(-census_cost * F32(1.0 / census_coeff))
    return a + c


def ci_adcensus(img_l: jnp.ndarray, img_r: jnp.ndarray, ad_coeff: float,
                census_coeff: float, num_disp: int, zero_disp: int,
                fast_exp: bool = False):
    """Fused cost-init stage: gray -> census; AD; hamming; exp-combine.
    One traced graph -- XLA fuses what the reference runs as 6 kernel
    launches with intermediate global-memory volumes (d_ci_adcensus.cu:38-186).
    """
    from stereo_to_multiview_tpu.ops.mux import mux_average

    ad_l, ad_r = ci_ad(img_l, img_r, num_disp, zero_disp)
    cen_l = census_transform_9x7(mux_average(img_l))
    cen_r = census_transform_9x7(mux_average(img_r))
    cc_l, cc_r = ci_census(cen_l, cen_r, num_disp, zero_disp)
    return (ci_adcensus_combine(ad_l, cc_l, ad_coeff, census_coeff, fast_exp),
            ci_adcensus_combine(ad_r, cc_r, ad_coeff, census_coeff, fast_exp))


def ci_adcensus_hwd(img_l: jnp.ndarray, img_r: jnp.ndarray, ad_coeff: float,
                    census_coeff: float, num_disp: int, zero_disp: int,
                    fast_exp: bool = False):
    """Cost init in (H, W, D) layout -- D riding the TPU lane dimension,
    the layout the banded-MXU aggregation kernel consumes.  Identical
    values to ci_adcensus (which is (D, H, W)); built disparity-major
    (contiguous concat) and re-laid-out with one tiled transpose, which
    XLA does far faster than D minor-axis interleaving concats."""
    cost_l, cost_r = ci_adcensus(img_l, img_r, ad_coeff, census_coeff,
                                 num_disp, zero_disp, fast_exp)
    return jnp.moveaxis(cost_l, 0, 2), jnp.moveaxis(cost_r, 0, 2)
