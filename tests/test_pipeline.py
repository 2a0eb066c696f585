"""End-to-end pipeline tests on the bundled bud/fish stereo fixtures
(the reference's de-facto test data, SURVEY.md section 4)."""

import os

import numpy as np
import pytest

from stereo_to_multiview_tpu.config import PipelineConfig
from stereo_to_multiview_tpu.models.pipeline import (
    process_frame, process_frame_lowres, compute_disparities)
from stereo_to_multiview_tpu.utils.bmp import read_bmp, write_bmp

DATA = os.path.join(os.path.dirname(__file__), "data")

# Small-but-real config so the CPU test backend stays fast: quarter-res bud.
CFG = PipelineConfig(num_rows=96, num_cols=160, num_rows_out=96,
                     num_cols_out=160, num_disp=16, zero_disp=8,
                     usd=10, lsd=5, num_views=4, irv_iterations=2,
                     bilateral_radius=3, feather_radius=3)


def _load_pair(name):
    # bud_1/bud_5 are 360 rows, the rest 384: use a size-matched pair
    a, b = ("2", "3") if name == "bud" else ("1", "2")
    l = read_bmp(os.path.join(DATA, f"{name}_{a}.bmp"))
    r = read_bmp(os.path.join(DATA, f"{name}_{b}.bmp"))
    return l, r


def _downscale4(img):
    return img[::4, ::4]


@pytest.fixture(scope="module")
def bud_sbs():
    l, r = _load_pair("bud")
    l, r = _downscale4(l), _downscale4(r)
    return np.concatenate([l, r], axis=1)


def test_bmp_roundtrip(tmp_path):
    l, _ = _load_pair("bud")
    assert l.shape == (384, 640, 3) and l.dtype == np.uint8
    p = str(tmp_path / "x.bmp")
    write_bmp(p, l)
    np.testing.assert_array_equal(read_bmp(p), l)


def test_process_frame_shapes_and_ranges(bud_sbs):
    dl, dr, il = process_frame(bud_sbs, CFG)
    dl, dr, il = map(np.asarray, (dl, dr, il))
    assert dl.shape == (96, 160) and dl.dtype == np.float32
    assert il.shape == (96, 160, 3) and il.dtype == np.uint8
    lo, hi = CFG.disp_range
    assert dl.min() >= lo and dl.max() < hi
    assert dr.min() >= lo and dr.max() < hi
    assert il.std() > 10  # non-degenerate image content


def test_process_frame_deterministic(bud_sbs):
    out1 = process_frame(bud_sbs, CFG)
    out2 = process_frame(bud_sbs, CFG)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_disparity_quality_on_real_pair(bud_sbs):
    """The bud pair is a real stereo pair: after refinement the outlier rate
    must be modest and disparity locally smooth."""
    w = bud_sbs.shape[1] // 2
    dl, dr, out_l, out_r = compute_disparities(
        bud_sbs[:, :w], bud_sbs[:, w:], CFG)
    out_l = np.asarray(out_l)
    frac_outliers = (out_l != 0).mean()
    assert frac_outliers < 0.5, f"too many outliers: {frac_outliers:.2%}"
    dl = np.asarray(dl)
    grad = np.abs(np.diff(dl, axis=1))
    assert np.median(grad) <= 1.0  # mostly smooth


def test_lowres_variant_matches_contract(bud_sbs):
    cfg = CFG.replace(num_rows_disp=48, num_cols_disp=80, disp_scale=0.5)
    dl, dr, il = process_frame_lowres(bud_sbs, cfg)
    assert np.asarray(dl).shape == (96, 160)
    assert np.asarray(il).shape == (96, 160, 3)
    # 1/disp_scale = 2: upscaled disparities live in a doubled range
    assert np.asarray(dl).max() <= 2 * cfg.num_disp


def test_hslo_stage_runs_and_smooths(bud_sbs):
    cfg = CFG.replace(use_hslo=True)
    w = bud_sbs.shape[1] // 2
    dl_h, _, _, _ = compute_disparities(bud_sbs[:, :w], bud_sbs[:, w:], cfg)
    dl, _, _, _ = compute_disparities(bud_sbs[:, :w], bud_sbs[:, w:], CFG)
    dl_h, dl = np.asarray(dl_h), np.asarray(dl)
    assert dl_h.shape == dl.shape
    # scanline optimization should not roughen the solution
    assert np.abs(np.diff(dl_h, 1)).mean() <= np.abs(np.diff(dl, 1)).mean() * 1.25


def test_fish_other_view_count():
    l = _downscale4(read_bmp(os.path.join(DATA, "fish_1.bmp")))
    r = _downscale4(read_bmp(os.path.join(DATA, "fish_2.bmp")))
    cfg = CFG.replace(num_views=6, num_rows_out=120, num_cols_out=192)
    sbs = np.concatenate([l, r], axis=1)
    dl, dr, il = process_frame(sbs, cfg)
    assert np.asarray(il).shape == (120, 192, 3)


def test_use_median_flag(bud_sbs):
    """cfg.use_median inserts the 3x3 median between IRV and the
    bilateral (reference call site image_io.cpp:239-240, commented on the
    live path): the flagged pipeline differs from the plain one and still
    yields a valid disparity map."""
    from stereo_to_multiview_tpu.ops.demux import demux_sbs

    img_l, img_r = demux_sbs(bud_sbs)
    dl_m, dr_m, _, _ = compute_disparities(img_l, img_r,
                                           CFG.replace(use_median=True))
    dl, _, _, _ = compute_disparities(img_l, img_r, CFG)
    assert not np.array_equal(np.asarray(dl_m), np.asarray(dl))
    lo, hi = CFG.disp_range
    for a in (np.asarray(dl_m), np.asarray(dr_m)):
        assert a.min() >= lo and a.max() < hi
