"""Banded-MXU Pallas kernels (ops.band) vs the pure-XLA reference path.

Runs the kernels in interpret mode on CPU at small shapes; the same code
compiles to Mosaic on TPU.  IRV must be bit-exact (integer counts in
bf16-exact range); aggregation matches within the bf16-split tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_to_multiview_tpu import ops
from stereo_to_multiview_tpu.ops.band import (
    band_span_sum_h, band_span_sum_v, cross_aggregate_band, dr_irv_band)
from stereo_to_multiview_tpu.ops.cross import _span_sum
from stereo_to_multiview_tpu.ops.irv import _span_sum_inclusive


def _np(x):
    return np.asarray(x)


@pytest.fixture(scope="module")
def vol_arms(rng):
    h, w, d, usd = 24, 200, 16, 9
    vol = rng.random((h, w, d)).astype(np.float32)
    x = np.arange(w)[None, :].repeat(h, 0)
    y = np.arange(h)[:, None].repeat(w, 1)
    arms = np.stack([
        np.minimum(rng.integers(0, usd + 1, (h, w)), y),          # UP
        np.minimum(rng.integers(0, usd + 1, (h, w)), h - 1 - y),  # DOWN
        np.minimum(rng.integers(0, usd + 1, (h, w)), x),          # LEFT
        np.minimum(rng.integers(0, usd + 1, (h, w)), w - x),      # RIGHT
    ]).astype(np.int32)
    return jnp.asarray(vol), jnp.asarray(arms), usd


def test_band_h_matches_span_sum(vol_arms):
    vol, arms, usd = vol_arms
    ref = _span_sum(jnp.moveaxis(vol, 2, 0), arms[2], arms[3], axis=2,
                    max_arm=usd)
    out = band_span_sum_h(vol, arms[2], arms[3], nsplit=3, interpret=True)
    np.testing.assert_allclose(_np(jnp.moveaxis(ref, 0, 2)), _np(out),
                               atol=5e-5)


def test_band_v_inclusive_matches(vol_arms):
    vol, arms, usd = vol_arms
    # inclusive spans: DOWN arm may reach h-1, keep windows in-bounds
    dn = jnp.minimum(arms[1], vol.shape[0] - 1
                     - jnp.arange(vol.shape[0])[:, None])
    ref = _span_sum_inclusive(jnp.moveaxis(vol, 2, 0), arms[0], dn, axis=1,
                              max_arm=usd)
    out = band_span_sum_v(vol, arms[0], dn, inclusive=True, nsplit=3,
                          interpret=True)
    np.testing.assert_allclose(_np(jnp.moveaxis(ref, 0, 2)), _np(out),
                               atol=5e-5)


def test_band_binary_exact(vol_arms, rng):
    vol, arms, usd = vol_arms
    binary = jnp.asarray(
        (rng.random(vol.shape) < 0.3).astype(np.float32))
    ref = _span_sum_inclusive(jnp.moveaxis(binary, 2, 0), arms[2], arms[3],
                              axis=2, max_arm=usd)
    out = band_span_sum_h(binary, arms[2], arms[3], inclusive=True,
                          nsplit=1, interpret=True)
    np.testing.assert_array_equal(_np(jnp.moveaxis(ref, 0, 2)), _np(out))


def test_cross_aggregate_band_matches_quantized_golden(stereo_pair):
    """The quantized band aggregation is bit-exact against the NumPy
    golden of its integer pipeline."""
    from stereo_to_multiview_tpu.golden import stages as G
    left, _ = stereo_pair
    img = jnp.asarray(left)
    usd, lsd = 9, 4
    arms = ops.cross_arms(img, 6.0, 20.0, usd, lsd)
    cost_dhw, _ = ops.ci_adcensus(img, jnp.asarray(np.roll(left, -2, 1)),
                                  10.0, 30.0, 12, 6)
    ref = G.cross_aggregate_q(_np(cost_dhw), _np(arms), usd)
    out = cross_aggregate_band(jnp.moveaxis(cost_dhw, 0, 2), arms,
                               interpret=True, max_arm=usd)
    np.testing.assert_array_equal(np.moveaxis(ref, 0, 2), _np(out))


def test_band_aggregate_q_single_digit_matches_golden(stereo_pair):
    """The single-digit fast path (band_digits=1: every value rescaled
    below 2^8, one MXU dot per pass) is bit-exact against the NumPy
    golden run with the same shifts, and its fused WTA flips only at
    near-ties vs the exact digits=2 path."""
    from stereo_to_multiview_tpu.golden import stages as G
    from stereo_to_multiview_tpu.ops.band import (band_aggregate_q,
                                                  quantize_cost)
    left, _ = stereo_pair
    img = jnp.asarray(left)
    usd, lsd, zd = 9, 4, 6
    arms = ops.cross_arms(img, 6.0, 20.0, usd, lsd)
    cost_dhw, _ = ops.ci_adcensus(img, jnp.asarray(np.roll(left, -2, 1)),
                                  10.0, 30.0, 12, zd)
    q = quantize_cost(jnp.moveaxis(cost_dhw, 0, 2))
    ref = G.cross_aggregate_q(_np(cost_dhw), _np(arms), usd, digits=1)
    out = band_aggregate_q(q, arms, usd, digits=1, interpret=True)
    np.testing.assert_array_equal(np.moveaxis(ref, 0, 2), _np(out))

    d1 = band_aggregate_q(q, arms, usd, zero_disp=zd, digits=1,
                          interpret=True)
    d2 = band_aggregate_q(q, arms, usd, zero_disp=zd, digits=2,
                          interpret=True)
    assert np.mean(_np(d1) != _np(d2)) < 0.03


def test_quantized_agg_argmin_close_to_f32(stereo_pair):
    """Quantization (1/127 cost units + two bounded rescale roundings)
    flips the WTA argmin only at near-ties -- the disparity maps stay
    close to the exact-f32 aggregation's."""
    left, _ = stereo_pair
    img = jnp.asarray(left)
    usd, lsd = 9, 4
    arms = ops.cross_arms(img, 6.0, 20.0, usd, lsd)
    cost_dhw, _ = ops.ci_adcensus(img, jnp.asarray(np.roll(left, -2, 1)),
                                  10.0, 30.0, 12, 6)
    ref = ops.dc_wta(ops.cross_aggregate(cost_dhw, arms, max_arm=usd), 6)
    out_vol = cross_aggregate_band(jnp.moveaxis(cost_dhw, 0, 2), arms,
                                   interpret=True, max_arm=usd)
    out = (jnp.argmin(out_vol, axis=2) - 6).astype(jnp.float32)
    assert np.mean(_np(ref) != _np(out)) < 0.02


def test_dr_irv_band_bit_exact(stereo_pair, rng):
    left, right = stereo_pair
    img = jnp.asarray(left)
    usd, lsd, nd, zd = 9, 4, 12, 6
    arms = ops.cross_arms(img, 6.0, 20.0, usd, lsd)
    h, w = left.shape[:2]
    disp = jnp.asarray(
        rng.integers(-zd, nd - zd, (h, w)).astype(np.float32))
    outl = jnp.asarray((rng.random((h, w)) < 0.4).astype(np.uint8))

    ref_d, ref_o = ops.dr_irv(disp, outl, arms, 5, 0.4, nd, zd, usd, 3)
    out_d, out_o = dr_irv_band(disp, outl, arms, 5, 0.4, nd, zd, usd, 3,
                               interpret=True)
    np.testing.assert_array_equal(_np(ref_d), _np(out_d))
    np.testing.assert_array_equal(_np(ref_o), _np(out_o))


def test_ci_adcensus_hwd_matches_dhw(stereo_pair):
    from stereo_to_multiview_tpu.ops.cost import ci_adcensus_hwd
    left, right = stereo_pair
    l, r = jnp.asarray(left), jnp.asarray(right)
    a, b = ops.ci_adcensus(l, r, 10.0, 30.0, 12, 6)
    a2, b2 = ci_adcensus_hwd(l, r, 10.0, 30.0, 12, 6)
    np.testing.assert_array_equal(_np(jnp.moveaxis(a, 0, 2)), _np(a2))
    np.testing.assert_array_equal(_np(jnp.moveaxis(b, 0, 2)), _np(b2))


def test_ci_adcensus_kern_shift_extracted_right_eye(rng):
    """Widths >= 384 trigger the cost_r-from-cost_l shift extraction (the
    main kernel emits only the left eye; cost_r(x, d) = cost_l(x-(d-zd), d)
    via per-d slices, with <= 64-column border strips recomputed by pinned-
    tile kernel calls).  Must stay bit-identical to the direct two-eye
    formulation, including at a width that straddles two right-border
    tiles (w = 385) and at the full D=128/zd=64 reach."""
    from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern
    from stereo_to_multiview_tpu.ops.cost import ci_adcensus_hwd
    for h, w, nd, zd in ((16, 448, 24, 12), (8, 385, 128, 64)):
        l = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        r = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        a, b = ci_adcensus_kern(l, r, 10.0, 30.0, nd, zd, quant=True,
                                interpret=True, shift_extract=True)
        ra, rb = ci_adcensus_hwd(l, r, 10.0, 30.0, nd, zd)
        np.testing.assert_array_equal(
            _np(a), _np(jnp.rint(ra * 127).astype(jnp.bfloat16)))
        np.testing.assert_array_equal(
            _np(b), _np(jnp.rint(rb * 127).astype(jnp.bfloat16)))


def test_ci_adcensus_kern_xm_matches_row_major(stereo_pair):
    """x-major cost kernel (sublane disparity windows) vs the row-major
    kernel: bit-identical volumes, quantized and f32."""
    from stereo_to_multiview_tpu.ops.costkern import (ci_adcensus_kern,
                                                      ci_adcensus_kern_xm)
    left, right = stereo_pair
    l, r = jnp.asarray(left), jnp.asarray(right)
    for quant in (True, False):
        ref_l, ref_r = ci_adcensus_kern(l, r, 10.0, 30.0, 12, 6,
                                        quant=quant, interpret=True)
        for shear in (False, True):
            out_l, out_r = ci_adcensus_kern_xm(l, r, 10.0, 30.0, 12, 6,
                                               quant=quant, shear=shear,
                                               interpret=True)
            np.testing.assert_array_equal(_np(ref_l), _np(out_l))
            np.testing.assert_array_equal(_np(ref_r), _np(out_r))
    # asymmetric zero_disp exercises the shear's one-sided border clamp
    for nd, zd in ((16, 0), (16, 12)):
        ref_l, ref_r = ci_adcensus_kern(l, r, 10.0, 30.0, nd, zd,
                                        quant=True, interpret=True)
        out_l, out_r = ci_adcensus_kern_xm(l, r, 10.0, 30.0, nd, zd,
                                           quant=True, shear=True,
                                           interpret=True)
        np.testing.assert_array_equal(_np(ref_l), _np(out_l))
        np.testing.assert_array_equal(_np(ref_r), _np(out_r))


def test_band_qscale_dial(stereo_pair):
    """The band_qscale fidelity dial (VERDICT r4 item 5): at qscale 510
    the int16-volume path must (a) stay bit-exact under row chunking
    (exact integer aggregation at any qscale) and (b) track the f32
    golden aggregation at least as well as the default 127 path on the
    real fixture crop."""
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.ops.band import band_stereo_core_chunked
    left, right = stereo_pair
    h, w = left.shape[:2]
    base = dict(num_rows=h, num_cols=w, num_rows_out=h, num_cols_out=w,
                num_disp=12, zero_disp=6, usd=5, lsd=2, num_views=4)
    l, r = jnp.asarray(left), jnp.asarray(right)
    arms_l = ops.cross_arms(l, 6.0, 20.0, 5, 2)
    arms_r = ops.cross_arms(r, 6.0, 20.0, 5, 2)

    # golden: f32 cost + f32 aggregation + first-min WTA (xla path)
    from stereo_to_multiview_tpu.ops.cost import ci_adcensus_hwd
    cl, cr = ci_adcensus_hwd(l, r, 10.0, 30.0, 12, 6)
    gl = ops.dc_wta(jnp.moveaxis(ops.cross_aggregate(
        jnp.moveaxis(cl, 2, 0), arms_l, max_arm=5), 0, 2)
        .transpose(2, 0, 1), 6)

    outs = {}
    for q in (127.0, 510.0):
        cfg = PipelineConfig(engine="band", band_qscale=q, **base)
        dl, _ = band_stereo_core_chunked(l, r, arms_l, arms_r, cfg,
                                         interpret=True)
        cfg_c = cfg.replace(band_row_chunk=8)
        dl_c, _ = band_stereo_core_chunked(l, r, arms_l, arms_r, cfg_c,
                                           interpret=True)
        np.testing.assert_array_equal(_np(dl), _np(dl_c))
        outs[q] = np.mean(np.abs(_np(dl) - _np(gl)) > 1.0)
    assert outs[510.0] <= outs[127.0]

    # digits=3 (the REAL fidelity lever -- the r5 sweep showed the
    # residual is flat in qscale because the rescale shifts grow with
    # it, while 3 digit planes raise the per-pass precision bound):
    # chunking stays bit-exact and the golden residual must not exceed
    # the best 2-digit run (it measures 0.0006 vs 0.0135 on full bud)
    cfg3 = PipelineConfig(engine="band", band_qscale=510.0,
                          band_digits=3, **base)
    dl3, _ = band_stereo_core_chunked(l, r, arms_l, arms_r, cfg3,
                                      interpret=True)
    dl3_c, _ = band_stereo_core_chunked(
        l, r, arms_l, arms_r, cfg3.replace(band_row_chunk=8),
        interpret=True)
    np.testing.assert_array_equal(_np(dl3), _np(dl3_c))
    assert np.mean(np.abs(_np(dl3) - _np(gl)) > 1.0) <= min(outs.values())


def test_chunked_core_matches_unchunked(stereo_pair):
    """Row-chunked stereo core vs whole-frame: bit-exact.  The quantized
    aggregation is exact integer arithmetic, so the V-pass tile origin
    shift introduced by chunking cannot change any sum or argmin."""
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.ops.band import (
        band_stereo_core_chunked, dr_irv_band_chunked, dr_irv_band_lr)
    left, right = stereo_pair
    h, w = left.shape[:2]
    base = dict(num_rows=h, num_cols=w, num_rows_out=h, num_cols_out=w,
                num_disp=12, zero_disp=6, usd=5, lsd=2, irv_iterations=2,
                irv_thresh_s=5, irv_thresh_h=0.4, num_views=4,
                band_nsplit=3)
    cfg_whole = PipelineConfig(engine="band", band_row_chunk=0, **base)
    cfg_chunk = PipelineConfig(engine="band", band_row_chunk=8,
                               irv_row_chunk=8, **base)
    l, r = jnp.asarray(left), jnp.asarray(right)
    arms_l = ops.cross_arms(l, 6.0, 20.0, 5, 2)
    arms_r = ops.cross_arms(r, 6.0, 20.0, 5, 2)

    dwl, dwr = band_stereo_core_chunked(l, r, arms_l, arms_r, cfg_whole,
                                        interpret=True)
    dcl, dcr = band_stereo_core_chunked(l, r, arms_l, arms_r, cfg_chunk,
                                        interpret=True)
    np.testing.assert_array_equal(_np(dwl), _np(dcl))
    np.testing.assert_array_equal(_np(dwr), _np(dcr))

    rng2 = np.random.default_rng(5)
    outl = jnp.asarray((rng2.random((h, w)) < 0.4).astype(np.uint8))
    outr = jnp.asarray((rng2.random((h, w)) < 0.4).astype(np.uint8))
    ref = dr_irv_band_lr(dwl, outl, dwr, outr, arms_l, arms_r, 5, 0.4,
                         12, 6, 5, 2, interpret=True)
    got = dr_irv_band_chunked(dwl, outl, dwr, outr, arms_l, arms_r,
                              cfg_chunk, interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(_np(a[0]), _np(b[0]))
        np.testing.assert_array_equal(_np(a[1]), _np(b[1]))

    # sparse outliers over many rounds: the chunked loop's
    # change-frontier flags (need masks) must reproduce the dense
    # fixed-iteration reference exactly, including accept chains where
    # a round-k fill enables a round-k+1 fill next door
    outl2 = np.zeros((h, w), np.uint8)
    outl2[h // 2, 4:min(w, 60)] = 1          # a row run that fills inward
    outl2[2, 2] = 1
    outr2 = np.zeros((h, w), np.uint8)
    outr2[h // 3, 10:min(w, 40)] = 1
    cfg4 = cfg_chunk.replace(irv_iterations=4, irv_thresh_s=2,
                             irv_thresh_h=0.1)
    ref = dr_irv_band_lr(dwl, jnp.asarray(outl2), dwr, jnp.asarray(outr2),
                         arms_l, arms_r, 2, 0.1, 12, 6, 5, 4,
                         interpret=True)
    got = dr_irv_band_chunked(dwl, jnp.asarray(outl2), dwr,
                              jnp.asarray(outr2), arms_l, arms_r, cfg4,
                              interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(_np(a[0]), _np(b[0]))
        np.testing.assert_array_equal(_np(a[1]), _np(b[1]))


def test_band_aggregate_dm_matches_lane_major(rng):
    """Disparity-major aggregation (band_aggregate_q_dm) + the stacked-eyes
    cost kernel: bit-identical to the lane-major band path (same integer
    arithmetic; layout only).  Multi-tile (otile=128) and padded widths
    are exercised."""
    from stereo_to_multiview_tpu.ops.band import (
        band_aggregate_q, band_aggregate_q_dm, quantize_cost)
    from stereo_to_multiview_tpu.ops.cost import ci_adcensus_hwd
    from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern_stacked

    h, w, nd, zd, usd, lsd = 16, 160, 12, 6, 5, 2
    l = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    arms_l = ops.cross_arms(l, 6.0, 20.0, usd, lsd)
    arms_r = ops.cross_arms(r, 6.0, 20.0, usd, lsd)
    cl, cr = ci_adcensus_hwd(l, r, 10.0, 30.0, nd, zd)
    ql, qr = quantize_cost(cl), quantize_cost(cr)

    cost = jnp.concatenate([ql, qr], axis=0)
    arms = jnp.concatenate([arms_l, arms_r], axis=1)
    disp = band_aggregate_q(cost, arms, usd, zero_disp=zd, interpret=True)
    ref_l, ref_r = disp[:h], disp[h:]

    # the stacked cost kernel's (2D, H, W) output == moveaxis of the
    # per-eye volumes
    cost2 = ci_adcensus_kern_stacked(l, r, 10.0, 30.0, nd, zd,
                                     interpret=True)
    np.testing.assert_array_equal(
        _np(cost2), _np(jnp.concatenate([jnp.moveaxis(ql, 2, 0),
                                         jnp.moveaxis(qr, 2, 0)], axis=0)))

    for otile in (128, 256):
        dl, dr = band_aggregate_q_dm(cost2, arms_l, arms_r, num_disp=nd,
                                     zero_disp=zd, max_arm=usd,
                                     otile=otile, interpret=True)
        np.testing.assert_array_equal(_np(ref_l), _np(dl))
        np.testing.assert_array_equal(_np(ref_r), _np(dr))


def test_band_core_dm_matches_chunked(stereo_pair):
    """band_stereo_core_dm (whole-frame and row-chunked) vs the lane-major
    chunked core: bit-exact."""
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.ops.band import (
        band_stereo_core_chunked, band_stereo_core_dm)
    left, right = stereo_pair
    h, w = left.shape[:2]
    base = dict(num_rows=h, num_cols=w, num_rows_out=h, num_cols_out=w,
                num_disp=12, zero_disp=6, usd=5, lsd=2, irv_iterations=2,
                irv_thresh_s=5, irv_thresh_h=0.4, num_views=4)
    l, r = jnp.asarray(left), jnp.asarray(right)
    arms_l = ops.cross_arms(l, 6.0, 20.0, 5, 2)
    arms_r = ops.cross_arms(r, 6.0, 20.0, 5, 2)

    cfg_whole = PipelineConfig(engine="band", band_row_chunk=0, **base)
    ref = band_stereo_core_chunked(l, r, arms_l, arms_r, cfg_whole,
                                   interpret=True)
    for chunk in (0, 8):
        cfg = PipelineConfig(engine="band", band_row_chunk=chunk, **base)
        got = band_stereo_core_dm(l, r, arms_l, arms_r, cfg,
                                  interpret=True)
        np.testing.assert_array_equal(_np(ref[0]), _np(got[0]))
        np.testing.assert_array_equal(_np(ref[1]), _np(got[1]))


def test_irv_round_kern_matches_dr_irv(stereo_pair, rng):
    """Direct unit test for the fused IRV round kernels (rowspan + vote,
    with outlier-sparse block skipping): bit-identical to ops.irv.dr_irv
    for one round, including padded-edge rows."""
    from stereo_to_multiview_tpu.ops.irvkern import irv_round_kern
    left, _ = stereo_pair
    img = jnp.asarray(left)
    usd, lsd, nd, zd = 9, 4, 12, 6
    arms = ops.cross_arms(img, 6.0, 20.0, usd, lsd)
    h, w = left.shape[:2]
    disp = jnp.asarray(
        rng.integers(-zd, nd - zd, (h, w)).astype(np.float32))
    # sparse outliers: exercises skipped blocks alongside active ones
    outl = jnp.asarray((rng.random((h, w)) < 0.05).astype(np.uint8))

    ref_d, ref_o = ops.dr_irv(disp, outl, arms, 5, 0.4, nd, zd, usd, 1)
    out_d, out_o = irv_round_kern(disp, outl, arms, 5, 0.4, nd, zd, usd,
                                  interpret=True)
    np.testing.assert_array_equal(_np(ref_d), _np(out_d))
    np.testing.assert_array_equal(_np(ref_o), _np(out_o))

    # all-reliable input: every block skips, nothing may change
    zero = jnp.zeros((h, w), jnp.uint8)
    out_d2, out_o2 = irv_round_kern(disp, zero, arms, 5, 0.4, nd, zd, usd,
                                    interpret=True)
    np.testing.assert_array_equal(_np(disp), _np(out_d2))
    np.testing.assert_array_equal(_np(zero), _np(out_o2))


def test_warp_pair_kern_matches_xla(stereo_pair, rng):
    """DIBR warp-pair Pallas kernel vs ops.dibr.dibr_backward_warp
    (ADVICE round 1): same warped views after the mask multiply."""
    from stereo_to_multiview_tpu.ops.warpkern import dibr_warp_pair_kern
    from stereo_to_multiview_tpu.ops.dibr import dibr_backward_warp
    left, right = stereo_pair
    l, r = jnp.asarray(left), jnp.asarray(right)
    h, w = left.shape[:2]
    nd, zd = 12, 6
    disp_l = jnp.asarray(
        rng.integers(-zd, nd - zd, (h, w)).astype(np.float32))
    disp_r = jnp.asarray(
        rng.integers(-zd, nd - zd, (h, w)).astype(np.float32))
    mask_l = jnp.asarray((rng.random((h, w)) < 0.8).astype(np.float32))
    mask_r = jnp.asarray((rng.random((h, w)) < 0.8).astype(np.float32))
    for shift in (0.25, 0.5, 0.875):
        va, vb = dibr_warp_pair_kern(l, r, disp_l, disp_r, shift, nd, zd,
                                     interpret=True)
        got_a = (va * mask_r[:, :, None]).astype(jnp.uint8)
        got_b = (vb * mask_l[:, :, None]).astype(jnp.uint8)
        ref_a = dibr_backward_warp(l, mask_r, disp_r, -shift, nd, zd)
        ref_b = dibr_backward_warp(r, mask_l, disp_l, 1.0 - shift, nd, zd)
        np.testing.assert_array_equal(_np(ref_a), _np(got_a))
        np.testing.assert_array_equal(_np(ref_b), _np(got_b))


def test_band_engine_pipeline_close(stereo_pair):
    """Full compute_disparities: band engine vs xla engine."""
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.pipeline import compute_disparities
    left, right = stereo_pair
    h, w = left.shape[:2]
    base = dict(num_rows=h, num_cols=w, num_rows_out=h, num_cols_out=w,
                num_disp=12, zero_disp=6, usd=9, lsd=4, irv_iterations=2,
                bilateral_radius=2, num_views=4)
    cfg_x = PipelineConfig(engine="xla", **base)
    cfg_b = PipelineConfig(engine="band", band_nsplit=3, **base)
    l, r = jnp.asarray(left), jnp.asarray(right)
    dx_l, dx_r, ox_l, _ = compute_disparities(l, r, cfg_x)
    db_l, db_r, ob_l, _ = compute_disparities(l, r, cfg_b)
    # disparities are integers pre-bilateral; allow rare argmin tie flips
    # from the bf16-split tolerance
    mismatch = np.mean(_np(dx_l) != _np(db_l))
    assert mismatch < 0.02, mismatch
    np.testing.assert_allclose(_np(dx_l), _np(db_l), atol=12.0)


def test_bilateral_kern_matches_xla(stereo_pair, rng):
    """Pallas bilateral filter vs ops.filters.filter_bilateral: same
    taps and weights (accumulation order differs: the kernel iterates
    dx-outer to share lane rolls), so values agree to f32 tolerance."""
    from stereo_to_multiview_tpu.ops.postkern import filter_bilateral_kern
    left, _ = stereo_pair
    h, w = left.shape[:2]
    disp = jnp.asarray(
        (rng.random((h, w)) * 12 - 6).astype(np.float32))
    ref = ops.filter_bilateral(disp, 3, 5.0, 10.0, 12)
    out = filter_bilateral_kern(disp, 3, 5.0, 10.0, 12, interpret=True)
    np.testing.assert_allclose(_np(ref), _np(out), rtol=1e-6, atol=1e-6)


def test_bilateral_kern_lr_matches_per_eye(stereo_pair, rng):
    """Both-eyes bilateral (seam-spacer stacking) == two per-eye calls,
    bit for bit."""
    from stereo_to_multiview_tpu.ops.postkern import (
        filter_bilateral_kern, filter_bilateral_kern_lr)
    left, _ = stereo_pair
    h, w = left.shape[:2]
    dl = jnp.asarray(rng.normal(0, 4, (h, w)).astype(np.float32))
    dr = jnp.asarray(rng.normal(2, 3, (h, w)).astype(np.float32))
    ref_l = filter_bilateral_kern(dl, 3, 5.0, 10.0, 12, interpret=True)
    ref_r = filter_bilateral_kern(dr, 3, 5.0, 10.0, 12, interpret=True)
    out_l, out_r = filter_bilateral_kern_lr(dl, dr, 3, 5.0, 10.0, 12,
                                            interpret=True)
    np.testing.assert_array_equal(_np(ref_l), _np(out_l))
    np.testing.assert_array_equal(_np(ref_r), _np(out_r))


def test_dcc_occl_kern_matches_xla(stereo_pair, rng):
    """Banded-compare DCC/occlusion kernel vs the XLA select-shift ops:
    bit-exact labels and hit masks, including clamped border targets."""
    from stereo_to_multiview_tpu.ops.postkern import dcc_occl_kern
    left, _ = stereo_pair
    h, w = left.shape[:2]
    nd, zd = 12, 6
    disp_l = jnp.asarray(
        rng.integers(-zd, nd - zd, (h, w)).astype(np.float32))
    disp_r = jnp.asarray(
        rng.integers(-zd, nd - zd, (h, w)).astype(np.float32))

    ref_l, ref_r = ops.dr_dcc(disp_l, disp_r, 1.0, num_disp=nd,
                              zero_disp=zd)
    # the bounded path (num_disp/zero_disp set) is what the pipeline
    # runs: the dvals loop + border-clamp patch interplay (ADVICE r3)
    out_l, out_r = dcc_occl_kern(disp_l, disp_r, 1.0, with_labels=True,
                                 num_disp=nd, zero_disp=zd,
                                 interpret=True)
    np.testing.assert_array_equal(_np(ref_l), _np(out_l))
    np.testing.assert_array_equal(_np(ref_r), _np(out_r))

    # unbounded fallback (reach = full 128-lane pad) must agree too
    out_l2, out_r2 = dcc_occl_kern(disp_l, disp_r, 1.0, with_labels=True,
                                   interpret=True)
    np.testing.assert_array_equal(_np(ref_l), _np(out_l2))
    np.testing.assert_array_equal(_np(ref_r), _np(out_r2))

    # occlusion hits on refined (float) disparities: trunc-toward-zero,
    # including NEGATIVE floats (-5.9 truncates to -5, not -6)
    fl = disp_l + jnp.asarray(rng.random((h, w)).astype(np.float32)) * 0.9
    fr = disp_r - jnp.asarray(rng.random((h, w)).astype(np.float32)) * 0.9
    refh_l, refh_r = ops.dibr_occl(fl, fr, num_disp=nd, zero_disp=zd)
    oh_l, oh_r = dcc_occl_kern(fl, fr, with_labels=False,
                               num_disp=nd, zero_disp=zd, interpret=True)
    np.testing.assert_array_equal(_np(refh_l), _np(oh_l))
    np.testing.assert_array_equal(_np(refh_r), _np(oh_r))


def test_bleed_mask_kern_matches_xla(rng):
    """Fused radius-1 bleed + occl_to_mask kernel vs the XLA pair:
    bit-exact, including the reference's mirror edge behavior."""
    from stereo_to_multiview_tpu.ops.postkern import filter_bleed_mask_kern
    h, w = 40, 150
    occ_l = jnp.asarray((rng.random((h, w)) < 0.12).astype(np.uint8))
    occ_r = jnp.asarray((rng.random((h, w)) < 0.5).astype(np.uint8))
    ref_l = ops.dibr_occl_to_mask(ops.filter_bleed(occ_l, 1))
    ref_r = ops.dibr_occl_to_mask(ops.filter_bleed(occ_r, 1))
    out_l, out_r = filter_bleed_mask_kern(occ_l, occ_r, 1, interpret=True)
    np.testing.assert_array_equal(_np(ref_l), _np(out_l))
    np.testing.assert_array_equal(_np(ref_r), _np(out_r))


def test_cross_arms_kern_matches_xla(stereo_pair):
    """Two-pass (vertical + transposed-vertical) Pallas arms kernel vs
    ops.cross.cross_arms: bit-exact, borders and tier rule included.
    Also the lane-stacked both-eyes variant."""
    from stereo_to_multiview_tpu.ops.postkern import (cross_arms_kern,
                                                      cross_arms_kern_lr)
    left, right = stereo_pair
    refs = []
    for img in (left, right):
        im = jnp.asarray(img)
        ref = ops.cross_arms(im, 6.0, 20.0, 9, 4)
        refs.append(ref)
        out = cross_arms_kern(im, 6.0, 20.0, 9, 4, interpret=True)
        np.testing.assert_array_equal(_np(ref), _np(out))
    out_l, out_r = cross_arms_kern_lr(jnp.asarray(left), jnp.asarray(right),
                                      6.0, 20.0, 9, 4, interpret=True)
    np.testing.assert_array_equal(_np(refs[0]), _np(out_l))
    np.testing.assert_array_equal(_np(refs[1]), _np(out_r))


def test_warp_views_kern_matches_pair(stereo_pair, rng):
    """Fused all-views warp kernel vs per-view warp: bit-identical."""
    from stereo_to_multiview_tpu.ops.warpkern import (dibr_warp_pair_kern,
                                                      dibr_warp_views_kern)
    left, right = stereo_pair
    l, r = jnp.asarray(left), jnp.asarray(right)
    h, w = left.shape[:2]
    nd, zd = 12, 6
    disp_l = jnp.asarray(
        rng.integers(-zd, nd - zd, (h, w)).astype(np.float32))
    disp_r = jnp.asarray(
        rng.integers(-zd, nd - zd, (h, w)).astype(np.float32))
    shifts = (0.75, 0.5, 0.25)
    va, vb = dibr_warp_views_kern(l, r, disp_l, disp_r, shifts, nd, zd,
                                  interpret=True)
    for j, s in enumerate(shifts):
        ra, rb = dibr_warp_pair_kern(l, r, disp_l, disp_r, s, nd, zd,
                                     interpret=True)
        np.testing.assert_array_equal(_np(ra), _np(va[j]))
        np.testing.assert_array_equal(_np(rb), _np(vb[j]))

    # x-major data-adaptive twin (the shipping TPU path): bit-identical
    # transposed, including on NON-integral disparities
    from stereo_to_multiview_tpu.ops.warpkern import dibr_warp_views_kern_xm
    fl = disp_l + jnp.asarray(rng.random((h, w)).astype(np.float32)) * 0.9
    fr = disp_r - jnp.asarray(rng.random((h, w)).astype(np.float32)) * 0.9
    va, vb = dibr_warp_views_kern(l, r, fl, fr, shifts, nd, zd,
                                  interpret=True)
    vax, vbx = dibr_warp_views_kern_xm(l, r, fl, fr, shifts, nd, zd,
                                       interpret=True)
    np.testing.assert_array_equal(_np(va), _np(jnp.swapaxes(vax, 1, 2)))
    np.testing.assert_array_equal(_np(vb), _np(jnp.swapaxes(vbx, 1, 2)))


def test_fast_exp_cost_parity(rng):
    """The polynomial-exp cost path (opt-in; for hardware without a fast
    exp pipe) is bit-identical to the f32-exp quantizer: exhaustively on
    the discrete (AD, Hamming) domain for the standard coefficients, and
    kernel-vs-reference on images."""
    from stereo_to_multiview_tpu.ops.fastmath import (cost_flip_count,
                                                      exp_neg, exp_neg_np)
    assert cost_flip_count(1.0 / 10.0, 1.0 / 30.0) == 0
    assert cost_flip_count(1.0 / 5.0, 1.0 / 15.0) == 0
    x = np.linspace(0, 40, 4096).astype(np.float32)
    a = np.asarray(jnp.vectorize(exp_neg)(jnp.asarray(x)))
    assert np.abs(a - np.exp(-x.astype(np.float64))).max() < 1e-6
    assert np.abs(exp_neg_np(x) - np.exp(-x.astype(np.float64))).max() < 1e-6

    from stereo_to_multiview_tpu.ops.costkern import ci_adcensus_kern_xm
    from stereo_to_multiview_tpu.ops.cost import ci_adcensus_hwd
    l = jnp.asarray(rng.integers(0, 256, (16, 256, 3), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, (16, 256, 3), dtype=np.uint8))
    a, b = ci_adcensus_kern_xm(l, r, 10.0, 30.0, 16, 8, quant=True,
                               fast_exp=True, interpret=True)
    ra, rb = ci_adcensus_hwd(l, r, 10.0, 30.0, 16, 8, fast_exp=True)
    np.testing.assert_array_equal(
        _np(a), _np(jnp.rint(ra * 127).astype(jnp.bfloat16)))
    np.testing.assert_array_equal(
        _np(b), _np(jnp.rint(rb * 127).astype(jnp.bfloat16)))


def test_hslo_hwd_matches_dhw(rng):
    """dc_hslo_hwd ((H, W, D), the band engine's layout) must equal
    dc_hslo ((D, H, W), the XLA engine's layout) up to the moveaxis --
    pins the penalty shift/sign conventions of the two formulations
    against each other for BOTH eye signs (ADVICE r4: this equivalence
    was only manually verified before)."""
    from stereo_to_multiview_tpu.ops.hslo import dc_hslo, dc_hslo_hwd
    h, w, d, zd = 20, 96, 16, 8
    vol = jnp.asarray(rng.random((h, w, d)).astype(np.float32))
    gl = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
    gr = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
    for sign in (+1, -1):
        a = dc_hslo_hwd(vol, gl, gr, d, zd, 15.0, 2.0, 6.0, sign=sign)
        b = dc_hslo(jnp.moveaxis(vol, 2, 0), gl, gr, d, zd, 15.0, 2.0,
                    6.0, sign=sign)
        np.testing.assert_allclose(_np(a), _np(jnp.moveaxis(b, 0, 2)),
                                   rtol=0, atol=1e-4)


def test_hslo_wta_kern_matches_scan(rng):
    """Fused Pallas DP+WTA kernel vs the lax.scan twin (dc_hslo_hwd +
    argmin): identical disparities on integer-valued volumes, both eye
    conventions."""
    from stereo_to_multiview_tpu.ops.hslo import dc_hslo_hwd
    from stereo_to_multiview_tpu.ops.hslokern import dc_hslo_wta_kern
    # w = 203 exercises the zero-pad neutrality of the scan axis
    h, w, d, zd = 24, 203, 16, 8
    vol = jnp.asarray(np.round(rng.random((h, w, d)).astype(np.float32)
                               * 500))
    gl = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
    gr = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
    for sign, ga, gb in ((+1, gl, gr), (-1, gr, gl)):
        ref = dc_hslo_hwd(vol, gl, gr, d, zd, 15.0, 2.0, 6.0, sign=sign)
        ref_d = (jnp.argmin(ref, axis=2) - zd).astype(jnp.float32)
        out = dc_hslo_wta_kern(jnp.swapaxes(vol, 0, 1), ga, gb, d, zd,
                               15.0, 2.0, 6.0, sign=sign, interpret=True)
        # identical f32 recurrence; ties can differ between the scan's
        # argmin and the kernel's only through FMA association, bounded
        assert np.mean(_np(ref_d) != _np(out)) < 1e-3


def test_band_aggregate_final_out_t_large_values():
    """final_out_t (the HSLO kernel's W-major volume) must carry the
    FULL pass-4 aggregate: at usd=34 the output reaches ~1.4M (the
    rescale shifts only bound each pass's INPUT below 2^15), so an
    int16 volume wraps -- regression for the r4 review finding.
    Worst case: maximal quantized costs with full-length arms."""
    from stereo_to_multiview_tpu.ops.band import band_aggregate_q
    h, w, d, usd = 80, 208, 16, 34
    vol = jnp.full((h, w, d), 254, jnp.bfloat16)
    x = np.arange(w)[None, :].repeat(h, 0)
    y = np.arange(h)[:, None].repeat(w, 1)
    arms = jnp.asarray(np.stack([
        np.minimum(usd, y), np.minimum(usd, h - 1 - y),
        np.minimum(usd, x), np.minimum(usd, w - x),
    ]).astype(np.int32))
    ref = band_aggregate_q(vol, arms, usd, interpret=True)        # f32
    out = band_aggregate_q(vol, arms, usd, interpret=True,
                           final_out_t=True)                      # W-major
    assert float(jnp.max(ref)) > 32767, "fixture must exceed int16"
    np.testing.assert_array_equal(
        _np(ref), _np(jnp.swapaxes(out, 0, 1).astype(jnp.float32)))


def test_irv_round_need_mask_exact(rng):
    """Frontier `need` masks must be state-preserving for non-need
    pixels: an outlier sharing a flagged 128-row vote segment with a
    need pixel but sitting outside the rowspan flags' dilation would
    otherwise read partially-zeroed span windows, whose SMALLER total
    raises the reference's accept ratio and can spuriously accept it
    (r4 second-review finding).  Need pixels must match the full-need
    round exactly; non-need pixels must be untouched."""
    from stereo_to_multiview_tpu.ops.irvkern import irv_round_kern
    h, w, nd, zd, usd = 256, 64, 12, 6, 5
    disp = jnp.asarray(
        rng.integers(-zd, nd - zd, (h, w)).astype(np.float32))
    outl = np.zeros((h, w), np.uint8)
    outl[8, 10] = 1          # the need pixel (changed region nearby)
    outl[120, 10] = 1        # same 128-row vote segment, far from need
    outl[200, 30] = 1        # different segment entirely
    outl_j = jnp.asarray(outl)
    arms = jnp.asarray(np.stack([
        np.minimum(usd, np.arange(h))[:, None].repeat(w, 1),
        np.minimum(usd, h - 1 - np.arange(h))[:, None].repeat(w, 1),
        np.minimum(usd, np.arange(w))[None, :].repeat(h, 0),
        np.minimum(usd, w - np.arange(w))[None, :].repeat(h, 0),
    ]).astype(np.int32))

    full_d, full_o = irv_round_kern(disp, outl_j, arms, 2, 0.1, nd, zd,
                                    usd, interpret=True)
    need = np.zeros((h, w), bool)
    need[:32, :] = True      # frontier covers only the first pixel
    part_d, part_o = irv_round_kern(disp, outl_j, arms, 2, 0.1, nd, zd,
                                    usd, interpret=True,
                                    need=jnp.asarray(need))
    # need region: identical to the full round
    np.testing.assert_array_equal(_np(full_d)[:32], _np(part_d)[:32])
    np.testing.assert_array_equal(_np(full_o)[:32], _np(part_o)[:32])
    # outside need: state untouched, no spurious accepts
    np.testing.assert_array_equal(_np(part_d)[32:], _np(disp)[32:])
    np.testing.assert_array_equal(_np(part_o)[32:], outl[32:])


def test_synthesize_interlace_fused_matches_unfused(stereo_pair, rng):
    """The fused transposed synthesis chain (occl/bleed/feather in the
    (W, H) domain, mask+merge inside the warp kernel, transposed
    interlace) is bit-identical to synthesize_views + mux_multiview."""
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.pipeline import (
        synthesize_views, synthesize_interlace)
    left, right = stereo_pair
    h, w = left.shape[:2]
    cfg = PipelineConfig(num_rows=h, num_cols=w, num_rows_out=h,
                         num_cols_out=w, num_disp=12, zero_disp=6,
                         num_views=8, engine="band",
                         bilateral_radius=2, feather_radius=3)
    l, r = jnp.asarray(left), jnp.asarray(right)
    disp_l = jnp.asarray(
        rng.integers(-6, 6, (h, w)).astype(np.float32)
        + rng.random((h, w)).astype(np.float32) * 0.9)
    disp_r = jnp.asarray(
        rng.integers(-6, 6, (h, w)).astype(np.float32)
        + rng.random((h, w)).astype(np.float32) * 0.9)
    views = synthesize_views(l, r, disp_l, disp_r, cfg)
    ref = ops.mux_multiview(views, h, w, cfg.angle)
    out = synthesize_interlace(l, r, disp_l, disp_r, cfg)
    np.testing.assert_array_equal(_np(ref), _np(out))


def test_gaussian_lift_t_matches_natural(rng):
    """filter_gaussian_lift_t(m.T).T == filter_gaussian_lift(m) to the
    last f32 bit (the fused synthesis chain's feather)."""
    from stereo_to_multiview_tpu.ops.filters import (
        filter_gaussian_lift, filter_gaussian_lift_t)
    m = jnp.asarray(rng.random((37, 53)).astype(np.float32))
    a = filter_gaussian_lift(m, 5, 7.0)
    b = filter_gaussian_lift_t(m.T, 5, 7.0)
    np.testing.assert_array_equal(_np(a), _np(b.T))


def test_band_lossy_wta_dial(stereo_pair):
    """cfg.band_lossy_wta (the r5 speed dial): pass 4 feeds WTA through
    one bf16 dot instead of band_digits exact digit dots.  The rounding
    may flip WTA only at near-ties, so (a) the flip fraction vs the
    exact path stays tiny on the real fixture crop, and (b) row chunking
    remains bit-identical (the rounding is deterministic + row-local)."""
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.ops.band import band_stereo_core_chunked
    left, right = stereo_pair
    h, w = left.shape[:2]
    base = dict(num_rows=h, num_cols=w, num_rows_out=h, num_cols_out=w,
                num_disp=12, zero_disp=6, usd=5, lsd=2, num_views=4)
    l, r = jnp.asarray(left), jnp.asarray(right)
    arms_l = ops.cross_arms(l, 6.0, 20.0, 5, 2)
    arms_r = ops.cross_arms(r, 6.0, 20.0, 5, 2)

    cfg = PipelineConfig(engine="band", **base)
    dl_exact, _ = band_stereo_core_chunked(l, r, arms_l, arms_r, cfg,
                                           interpret=True)
    cfg_lossy = cfg.replace(band_lossy_wta=True)
    dl, _ = band_stereo_core_chunked(l, r, arms_l, arms_r, cfg_lossy,
                                     interpret=True)
    flips = np.mean(_np(dl) != _np(dl_exact))
    assert flips < 0.02, flips

    dl_c, _ = band_stereo_core_chunked(
        l, r, arms_l, arms_r, cfg_lossy.replace(band_row_chunk=8),
        interpret=True)
    np.testing.assert_array_equal(_np(dl), _np(dl_c))
