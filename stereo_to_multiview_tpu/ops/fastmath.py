"""Polynomial transcendentals for the hot kernels.

XLA's `exp` lowering costs ~25-35 VPU ops per element (range reduction,
high-degree polynomial, inf/nan select chains).  The cost-init combine
(d_ci_adcensus.cu:27-34 uses `__expf` -- itself a fast-math exp) and the
bilateral range weight only need exp on SMALL bounded domains, where a
degree-5 `2^t` polynomial plus exponent-bit stuffing reaches ~1.7e-7
absolute error in ~14 ops -- measured ~2x faster end to end.

Exactness contract: the quantized cost q = rint(127 * ((1 - e^-a) +
(1 - e^-c))) has a DISCRETE input domain (a from 766 integer AD values,
c from 49 Hamming values), so `cost_flip_count` exhaustively compares
the polynomial against the f32-`exp` definition for a given coefficient
pair at trace time; the cost kernels engage the polynomial only when
the count is zero (the standard coefficient families all are), else
fall back to `jnp.exp` automatically.  NumPy twins of every routine
keep goldens bit-comparable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

F32 = jnp.float32

LOG2E = 1.4426950408889634

# 2^t on [-0.5, 0.5], degree-5 Chebyshev fit: |err| <= 1.8e-7
EXP2_COEF = (1.000000052291761, 0.6931472000679485, 0.2402221165794857,
             0.05550340668100081, 0.00967076787534441,
             0.001339528536407251)


def exp_neg(x: jnp.ndarray) -> jnp.ndarray:
    """e^-x for f32 x >= 0 (valid to x ~ 80, clamped above): 2^-z with
    z = x*log2(e) split as z = n - t, n integer, t in [-0.5, 0.5];
    2^t by polynomial, 2^-n by exponent-bit stuffing."""
    z = jnp.minimum(x * F32(LOG2E), F32(80.0))
    n = jnp.floor(z + F32(0.5))
    t = n - z                                   # in [-0.5, 0.5]
    p = F32(EXP2_COEF[5])
    for c in EXP2_COEF[4::-1]:
        p = p * t + F32(c)
    ni = n.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(jnp.int32(127) - ni, jnp.int32(23)), F32)
    return p * scale


def exp_neg_np(x: np.ndarray) -> np.ndarray:
    """NumPy f32 twin of exp_neg (same op sequence, same rounding modulo
    backend FMA contraction)."""
    f = np.float32
    z = np.minimum(x.astype(f) * f(LOG2E), f(80.0))
    n = np.floor(z + f(0.5)).astype(f)
    t = (n - z).astype(f)
    p = f(EXP2_COEF[5])
    for c in EXP2_COEF[4::-1]:
        p = (p * t + f(c)).astype(f)
    scale = ((127 - n.astype(np.int32)) << 23).view(f)
    return (p * scale).astype(f)


def cost_flip_count(inv_ad: float, inv_cen: float,
                    max_ad: int = 765, max_ham: int = 48) -> int:
    """Number of (AD, Hamming) integer input pairs whose quantized cost
    rint(127*((1-e^-ad/3*inv_ad) + (1-e^-ham*inv_cen))) differs between
    f32 `exp` and the polynomial.  0 => the polynomial is bit-exact over
    the kernel's whole input domain for these coefficients."""
    f = np.float32
    third = f(0.33333333333)
    ad = np.arange(max_ad + 1, dtype=f)
    ham = np.arange(max_ham + 1, dtype=f)
    za = (ad * third).astype(f) * f(inv_ad)
    zc = ham * f(inv_cen)
    ref = np.rint(((f(1.0) - np.exp(za * f(-1.0)).astype(f))[:, None]
                   + (f(1.0) - np.exp(zc * f(-1.0)).astype(f))[None, :])
                  * f(127.0))
    got = np.rint(((f(1.0) - exp_neg_np(za))[:, None]
                   + (f(1.0) - exp_neg_np(zc))[None, :]) * f(127.0))
    return int((ref != got).sum())
