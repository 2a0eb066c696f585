"""Per-stage fidelity: JAX ops vs the NumPy golden transcriptions of the
reference CUDA kernels (stereo_to_multiview_tpu.golden)."""

import numpy as np
import pytest

import stereo_to_multiview_tpu.golden as G
import stereo_to_multiview_tpu.ops as O

D, ZD = 8, 4
UCD, LCD, USD, LSD = 6.0, 20.0, 6, 3


def _np(x):
    return np.asarray(x)


@pytest.fixture(scope="module")
def pair(rng):
    h, w = 36, 52
    l = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # right = shifted left + noise so disparity structure exists
    r = np.roll(l, -3, axis=1)
    r = np.clip(r.astype(np.int16) + rng.integers(-6, 7, r.shape), 0, 255)
    return l, r.astype(np.uint8)


def test_demux_sbs(rng):
    sbs = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
    gl, gr = G.demux_sbs(sbs)
    ol, orr = O.demux_sbs(sbs)
    np.testing.assert_array_equal(gl, _np(ol))
    np.testing.assert_array_equal(gr, _np(orr))


def test_mux_average_exact(pair):
    l, _ = pair
    np.testing.assert_array_equal(G.mux_average(l), _np(O.mux_average(l)))


def test_census_packing_matches_u64(pair):
    l, _ = pair
    gray = G.mux_average(l)
    g64 = G.census_transform_9x7(gray)
    w2 = _np(O.census_transform_9x7(gray)).astype(np.uint64)
    rebuilt = (w2[..., 0] << np.uint64(24)) | w2[..., 1]
    np.testing.assert_array_equal(g64, rebuilt)


def test_ci_ad_exact(pair):
    l, r = pair
    gl, gr = G.ci_ad(l, r, D, ZD)
    ol, orr = O.ci_ad(l, r, D, ZD)
    np.testing.assert_array_equal(gl, _np(ol))
    np.testing.assert_array_equal(gr, _np(orr))


def test_ci_census_exact(pair):
    l, r = pair
    cl = G.census_transform_9x7(G.mux_average(l))
    cr = G.census_transform_9x7(G.mux_average(r))
    gl, gr = G.ci_census(cl, cr, D, ZD)
    wl = O.census_transform_9x7(O.mux_average(l))
    wr = O.census_transform_9x7(O.mux_average(r))
    ol, orr = O.ci_census(wl, wr, D, ZD)
    np.testing.assert_array_equal(gl, _np(ol))
    np.testing.assert_array_equal(gr, _np(orr))


def test_ci_adcensus_combine_close(pair):
    l, r = pair
    gl, _ = G.ci_adcensus(l, r, 10.0, 30.0, D, ZD)
    ol, _ = O.ci_adcensus(l, r, 10.0, 30.0, D, ZD)
    np.testing.assert_allclose(gl, _np(ol), atol=2e-6)


def test_cross_arms_exact(pair):
    l, _ = pair
    g = G.cross_arms(l, UCD, LCD, USD, LSD)
    o = _np(O.cross_arms(l, UCD, LCD, USD, LSD))
    np.testing.assert_array_equal(g, o)


def test_cross_arms_border_quirk():
    """Arm written before the color test: a color failure at distance 1
    leaves arm 1; the image border at distance 1 leaves arm 0."""
    img = np.zeros((5, 5, 3), np.uint8)
    img[2, 3] = 255  # hard edge right of center
    arms = G.cross_arms(img, 2.0, 2.0, 3, 1)
    assert arms[G.RIGHT, 2, 2] == 1   # fails color test at k=1 -> arm 1
    assert arms[G.RIGHT, 2, 4] == 0   # border break before write -> arm 0
    o = _np(O.cross_arms(img, 2.0, 2.0, 3, 1))
    np.testing.assert_array_equal(arms, o)


def test_cross_aggregate_close(pair):
    l, r = pair
    cost, _ = G.ci_adcensus(l, r, 10.0, 30.0, D, ZD)
    arms = G.cross_arms(l, UCD, LCD, USD, LSD)
    g = G.cross_aggregate(cost, arms)
    o = _np(O.cross_aggregate(cost, arms))
    np.testing.assert_allclose(g, o, rtol=2e-5, atol=1e-3)


def test_span_half_open_excludes_anchor_when_right_arm_zero():
    cost = np.ones((1, 1, 5), np.float32)
    arms = np.zeros((4, 1, 5), np.int32)
    # left arm 2 at x=4, right arm 0 -> span [2, 4) -> sum 2 (anchor excluded)
    arms[G.LEFT, 0, 4] = 2
    out = G.cross_aggregate(cost, arms)
    # 4 passes; after pass 1 x=4 has 2.0 and others (arm 0,0) have 0.0
    o = _np(O.cross_aggregate(cost, arms))
    np.testing.assert_allclose(out, o, rtol=1e-6)
    assert out[0, 0, 4] == 0.0  # second H pass: span [2,4) of zeros


def test_wta_first_min(pair):
    l, r = pair
    cost, _ = G.ci_adcensus(l, r, 10.0, 30.0, D, ZD)
    g = G.dc_wta(cost, ZD)
    o = _np(O.dc_wta(cost, ZD))
    np.testing.assert_array_equal(g, o)
    # explicit tie: first minimum wins
    tie = np.zeros((3, 2, 2), np.float32)
    assert _np(O.dc_wta(tie, 1))[0, 0] == -1.0  # argmin=0 -> 0-1


def test_dr_dcc_exact(pair):
    l, r = pair
    cost_l, cost_r = G.ci_adcensus(l, r, 10.0, 30.0, D, ZD)
    dl = G.dc_wta(cost_l, ZD)
    dr_ = G.dc_wta(cost_r, ZD)
    gl, gr = G.dr_dcc(dl, dr_, 1.0)
    ol, orr = O.dr_dcc(dl, dr_, 1.0)
    np.testing.assert_array_equal(gl, _np(ol))
    np.testing.assert_array_equal(gr, _np(orr))


def test_dr_irv_exact(pair):
    l, r = pair
    cost_l, cost_r = G.ci_adcensus(l, r, 10.0, 30.0, D, ZD)
    dl = G.dc_wta(cost_l, ZD)
    dr_ = G.dc_wta(cost_r, ZD)
    out_l, _ = G.dr_dcc(dl, dr_, 1.0)
    arms = G.cross_arms(l, UCD, LCD, USD, LSD)
    gd, go = G.dr_irv(dl, out_l, arms, 5, 0.4, D, ZD, USD, 2)
    od, oo = O.dr_irv(dl, out_l, arms, 5, 0.4, D, ZD, USD, 2)
    np.testing.assert_array_equal(go, _np(oo))
    np.testing.assert_array_equal(gd, _np(od))


def test_dc_hslo_exact_both_eyes(pair):
    """Scanline DP vs the explicit per-column NumPy golden: bit-exact for
    both eyes (same f32 operation order)."""
    l, r = pair
    cost_l, cost_r = G.ci_adcensus(l, r, 10.0, 30.0, D, ZD)
    gray_l = G.mux_average(l)
    gray_r = G.mux_average(r)
    for cost, sign in ((cost_l, +1), (cost_r, -1)):
        ref = G.dc_hslo(cost, gray_l, gray_r, D, ZD, 15.0, 1.0, 3.0,
                        sign=sign)
        out = O.dc_hslo(np.asarray(cost), gray_l, gray_r, D, ZD, 15.0,
                        1.0, 3.0, sign=sign)
        np.testing.assert_array_equal(ref, _np(out))


def test_dc_hslo_penalizes_jumps():
    """With uniform images (all gradients < T) the DP must smooth an
    isolated disparity spike: the spiky plane's optimized cost exceeds
    the smooth plane's near the spike."""
    h, w, d = 8, 24, 6
    cost = np.full((d, h, w), 5.0, np.float32)
    cost[2] = 0.0                       # smooth winner everywhere
    cost[2, :, 12] = 2.0                # spike column prefers plane 5 by 2
    cost[5, :, 12] = 0.0                # (< the P2 jump penalty of 3)
    gray = np.full((h, w), 100, np.uint8)
    out = _np(O.dc_hslo(cost, gray, gray, d, d // 2, 15.0, 1.0, 3.0))
    # plane 2 still wins at the spike: neighbors' support dominates
    assert (out[:, :, 12].argmin(axis=0) == 2).all()


def test_filter_gaussian_lift_close(rng):
    img = rng.random((20, 24)).astype(np.float32)
    g = G.filter_gaussian_lift(img, 3, 2.5)
    o = _np(O.filter_gaussian_lift(img, 3, 2.5))
    np.testing.assert_allclose(g, o, rtol=1e-5, atol=1e-5)
    assert (o >= img - 1e-6).all()  # lifting property


def test_filter_bilateral_close(rng):
    disp = rng.integers(-4, 4, (20, 24)).astype(np.float32)
    g = G.filter_bilateral(disp, 3, 5.0, 10.0, D)
    o = _np(O.filter_bilateral(disp, 3, 5.0, 10.0, D))
    np.testing.assert_allclose(g, o, rtol=1e-4, atol=1e-4)


def test_filter_bleed_exact(rng):
    m = (rng.random((18, 22)) > 0.7).astype(np.uint8)
    np.testing.assert_array_equal(G.filter_bleed(m, 1),
                                  _np(O.filter_bleed(m, 1)))
    np.testing.assert_array_equal(G.filter_bleed(m, 2),
                                  _np(O.filter_bleed(m, 2)))


def test_filter_median_exact(rng):
    img = rng.random((15, 17)).astype(np.float32)
    np.testing.assert_array_equal(G.filter_median(img),
                                  _np(O.filter_median(img)))


def test_dibr_occl_exact(rng):
    dl = rng.integers(-3, 4, (12, 16)).astype(np.float32)
    dr_ = rng.integers(-3, 4, (12, 16)).astype(np.float32)
    gl, gr = G.dibr_occl(dl, dr_)
    ol, orr = O.dibr_occl(dl, dr_)
    np.testing.assert_array_equal(gl, _np(ol))
    np.testing.assert_array_equal(gr, _np(orr))
    np.testing.assert_array_equal(G.dibr_occl_to_mask(gl),
                                  _np(O.dibr_occl_to_mask(gl)))


def test_dibr_backward_warp_exact(rng, pair):
    l, _ = pair
    disp = rng.integers(-3, 4, l.shape[:2]).astype(np.float32)
    mask = (rng.random(l.shape[:2]) > 0.2).astype(np.float32)
    g = G.dibr_backward_warp(l, mask, disp, -0.4)
    o = _np(O.dibr_backward_warp(l, mask, disp, -0.4))
    assert np.abs(g.astype(int) - o.astype(int)).max() <= 1


def test_dibr_dbm_close(rng, pair):
    l, r = pair
    h, w = l.shape[:2]
    dl = rng.integers(-3, 4, (h, w)).astype(np.float32)
    dr_ = rng.integers(-3, 4, (h, w)).astype(np.float32)
    ml = (rng.random((h, w)) > 0.2).astype(np.float32)
    mr = (rng.random((h, w)) > 0.2).astype(np.float32)
    g = G.dibr_dbm(l, r, dl, dr_, ml, mr, 0.5, 3, 2.0)
    o = _np(O.dibr_dbm(l, r, dl, dr_, ml, mr, 0.5, 3, 2.0))
    assert np.abs(g.astype(int) - o.astype(int)).max() <= 2


def test_dibr_forward_warp_deterministic_rule(rng, pair):
    l, _ = pair
    disp = rng.integers(-3, 4, l.shape[:2]).astype(np.float32)
    g = G.dibr_forward_warp(l, disp, 0.5)
    o = _np(O.dibr_forward_warp(l, disp, 0.5))
    np.testing.assert_array_equal(g, o)


def test_mux_multiview_close(rng):
    views = rng.integers(0, 256, (4, 20, 24, 3), dtype=np.uint8)
    g = G.mux_multiview(views, 30, 36, 18.43)
    o = _np(O.mux_multiview(views, 30, 36, 18.43))
    assert np.abs(g.astype(int) - o.astype(int)).max() <= 1
    # identical resolution path too
    g2 = G.mux_multiview(views, 20, 24, 40.0)
    o2 = _np(O.mux_multiview(views, 20, 24, 40.0))
    assert np.abs(g2.astype(int) - o2.astype(int)).max() <= 1


def test_tx_scale_close(rng, pair):
    l, _ = pair
    for fn_g, fn_o in ((G.tx_scale_bilinear, O.tx_scale_bilinear),
                       (G.tx_scale_nearest, O.tx_scale_nearest)):
        g = fn_g(l, 24, 30)
        o = _np(fn_o(l, 24, 30))
        assert np.abs(g.astype(int) - o.astype(int)).max() <= 1
    disp = rng.integers(-4, 4, l.shape[:2]).astype(np.float32)
    g = G.tx_disp_scale(disp, 70, 100, 2.0)
    o = _np(O.tx_disp_scale(disp, 70, 100, 2.0))
    np.testing.assert_allclose(g, o, rtol=1e-5, atol=1e-5)


def test_mux_merge_truncation_semantics():
    """The double-uint8-truncation of mux_merge_AB (d_mux_common.cu:43-45)
    is observable output behavior."""
    a = np.full((1, 1, 3), 101, np.uint8)
    b = np.full((1, 1, 3), 101, np.uint8)
    m = np.full((1, 1), 0.5, np.float32)
    out = G.mux_merge_ab(b, a, m)
    assert out[0, 0, 0] == 100  # trunc(50.5)+trunc(50.5) = 100, not 101
    np.testing.assert_array_equal(out, _np(O.mux_merge_ab(b, a, m)))


def test_dc_hslo_hwd_matches_dhw_layout():
    """(H, W, D)-layout HSLO == (D, H, W)-layout HSLO for both signs
    (ADVICE r4: the two layout twins were only linked manually)."""
    import numpy as np
    import jax.numpy as jnp
    from stereo_to_multiview_tpu.ops.hslo import dc_hslo, dc_hslo_hwd
    rng = np.random.default_rng(7)
    h, w, d, zd = 12, 40, 8, 4
    vol = jnp.asarray(rng.random((d, h, w)).astype(np.float32))
    gl = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
    gr = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
    for sign in (+1, -1):
        ref = dc_hslo(vol, gl, gr, d, zd, 15.0, 1.0, 3.0, sign=sign)
        out = dc_hslo_hwd(jnp.moveaxis(vol, 0, 2), gl, gr, d, zd,
                          15.0, 1.0, 3.0, sign=sign)
        np.testing.assert_array_equal(np.asarray(ref),
                                      np.asarray(jnp.moveaxis(out, 2, 0)))
