"""Intermediate-tensor dump API -- the file-based replacement for the
reference's 8 interactive display modes (image_io.cpp:38-48, :321-470).

Every stage output can be written as PNG (display-normalized like the
reference's cv::normalize CV_MINMAX prep) and/or NPY (exact values).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from stereo_to_multiview_tpu.utils.imageio import (
    write_png, normalize_for_display)


class DumpWriter:
    """Writes named intermediates to <out_dir>/<name>.png/.npy."""

    def __init__(self, out_dir: str, png: bool = True, npy: bool = False):
        self.out_dir = out_dir
        self.png = png
        self.npy = npy
        os.makedirs(out_dir, exist_ok=True)

    def _path(self, name: str, ext: str) -> str:
        return os.path.join(self.out_dir, f"{name}.{ext}")

    def image(self, name: str, img) -> None:
        """uint8 image (BGR or gray), written as-is."""
        img = np.asarray(img)
        if self.png:
            write_png(self._path(name, "png"), img)
        if self.npy:
            np.save(self._path(name, "npy"), img)

    def map(self, name: str, arr) -> None:
        """Float map (disparity, mask, cost slice): min-max normalized PNG
        plus exact NPY."""
        arr = np.asarray(arr)
        if self.png:
            write_png(self._path(name, "png"), normalize_for_display(arr))
        if self.npy:
            np.save(self._path(name, "npy"), arr)

    def volume_slices(self, name: str, vol, every: int = 8) -> None:
        """(D, H, W) cost volume: one normalized slice per `every` planes
        (the reference's per-disparity-level browsing modes)."""
        vol = np.asarray(vol)
        for d in range(0, vol.shape[0], every):
            self.map(f"{name}_d{d:03d}", vol[d])
        if self.npy:
            np.save(self._path(name, "npy"), vol)


def dump_pipeline_intermediates(writer: DumpWriter, img_l, img_r, cfg,
                                cost_slices: bool = False) -> Dict[str, np.ndarray]:
    """Run the pipeline stage by stage, dumping every display mode the
    reference viewer offers.  Returns the final tensors."""
    import jax.numpy as jnp
    from stereo_to_multiview_tpu import ops

    writer.image("00_left", img_l)
    writer.image("01_right", img_r)

    cost_l, cost_r = ops.ci_adcensus(img_l, img_r, cfg.ad_coeff,
                                     cfg.census_coeff, cfg.num_disp,
                                     cfg.zero_disp)
    if cost_slices:
        writer.volume_slices("02_cost_l", cost_l)

    arms_l = ops.cross_arms(img_l, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
    arms_r = ops.cross_arms(img_r, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
    acost_l = ops.cross_aggregate(cost_l, arms_l, max_arm=cfg.usd)
    acost_r = ops.cross_aggregate(cost_r, arms_r, max_arm=cfg.usd)
    if cost_slices:
        writer.volume_slices("03_acost_l", acost_l)

    disp_l = ops.dc_wta(acost_l, cfg.zero_disp)
    disp_r = ops.dc_wta(acost_r, cfg.zero_disp)
    writer.map("04_disp_raw_l", disp_l)
    writer.map("04_disp_raw_r", disp_r)

    out_l, out_r = ops.dr_dcc(disp_l, disp_r, cfg.dcc_thresh,
                              num_disp=cfg.num_disp, zero_disp=cfg.zero_disp)
    writer.map("05_outliers_l", np.asarray(out_l).astype(np.float32))
    writer.map("05_outliers_r", np.asarray(out_r).astype(np.float32))

    disp_l, out_l = ops.dr_irv(disp_l, out_l, arms_l, cfg.irv_thresh_s,
                               cfg.irv_thresh_h, cfg.num_disp, cfg.zero_disp,
                               cfg.usd, cfg.irv_iterations)
    disp_r, out_r = ops.dr_irv(disp_r, out_r, arms_r, cfg.irv_thresh_s,
                               cfg.irv_thresh_h, cfg.num_disp, cfg.zero_disp,
                               cfg.usd, cfg.irv_iterations)

    disp_l = ops.filter_bilateral(disp_l, cfg.bilateral_radius,
                                  cfg.bilateral_sigma_color,
                                  cfg.bilateral_sigma_spatial, cfg.num_disp)
    disp_r = ops.filter_bilateral(disp_r, cfg.bilateral_radius,
                                  cfg.bilateral_sigma_color,
                                  cfg.bilateral_sigma_spatial, cfg.num_disp)
    writer.map("06_disp_l", disp_l)
    writer.map("06_disp_r", disp_r)

    occl_l, occl_r = ops.dibr_occl(disp_l, disp_r, num_disp=cfg.num_disp,
                                   zero_disp=cfg.zero_disp)
    occl_l = ops.filter_bleed(occl_l, cfg.bleed_radius)
    occl_r = ops.filter_bleed(occl_r, cfg.bleed_radius)
    mask_l = ops.dibr_occl_to_mask(occl_l)
    mask_r = ops.dibr_occl_to_mask(occl_r)
    writer.map("07_mask_l", mask_l)
    writer.map("07_mask_r", mask_r)

    from stereo_to_multiview_tpu.models.pipeline import synthesize_views
    views = synthesize_views(jnp.asarray(img_l), jnp.asarray(img_r),
                             disp_l, disp_r, cfg)
    for v in range(cfg.num_views):
        writer.image(f"08_view_{v}", views[v])

    interlaced = ops.mux_multiview(views, cfg.num_rows_out, cfg.num_cols_out,
                                   cfg.angle)
    writer.image("09_interlaced", interlaced)

    return {
        "disp_l": np.asarray(disp_l), "disp_r": np.asarray(disp_r),
        "outliers_l": np.asarray(out_l), "outliers_r": np.asarray(out_r),
        "views": np.asarray(views), "interlaced": np.asarray(interlaced),
    }
