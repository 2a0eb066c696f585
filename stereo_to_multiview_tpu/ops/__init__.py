"""Jittable stage functions (dense-array JAX), one per reference module.

Stage names track the reference (SURVEY.md section 2.4):
  demux_sbs / demux_rgb            <- d_demux_common.cu
  mux_average / mux_merge_ab       <- d_mux_common.cu
  census_transform_9x7             <- d_ci_census.cu (tx_census_9x7_kernel_3)
  ci_ad / ci_census / ci_adcensus  <- d_ci_ad.cu, d_ci_census.cu, d_ci_adcensus.cu
  cross_arms / cross_aggregate     <- d_ca_cross.cu, d_ca_cross_sum.cu
  dc_wta                           <- d_dc_wta.cu
  dc_hslo                          <- d_dc_hslo.cu (real DP; reference is a stub)
  dr_dcc / dr_irv                  <- d_dr_dcc.cu, d_dr_irv.cu
  filter_*                         <- d_filter*.cu
  dibr_*                           <- d_dibr_*.cu
  mux_multiview                    <- d_mux_multiview.cu
  tx_scale_* / tx_disp_scale       <- d_tx_scale.cu
"""

from stereo_to_multiview_tpu.ops.demux import demux_sbs, demux_rgb
from stereo_to_multiview_tpu.ops.mux import mux_average, mux_merge_ab, mux_multiview
from stereo_to_multiview_tpu.ops.cost import (
    census_transform_9x7, hamming48, ci_ad, ci_census, ci_adcensus_combine,
    ci_adcensus)
from stereo_to_multiview_tpu.ops.cross import cross_arms, cross_aggregate
from stereo_to_multiview_tpu.ops.wta import dc_wta
from stereo_to_multiview_tpu.ops.dcc import dr_dcc
from stereo_to_multiview_tpu.ops.irv import dr_irv
from stereo_to_multiview_tpu.ops.filters import (
    filter_gaussian_lift, filter_bilateral, filter_bleed, filter_median,
    gaussian_kernel_2d, gaussian_lut_1d)
from stereo_to_multiview_tpu.ops.dibr import (
    dibr_occl, dibr_occl_to_mask, dibr_backward_warp, dibr_dbm,
    dibr_forward_warp, dibr_dfm, op_invertnormf)
from stereo_to_multiview_tpu.ops.scale import (
    tx_scale_bilinear, tx_scale_nearest, tx_disp_scale)
from stereo_to_multiview_tpu.ops.hslo import dc_hslo

__all__ = [
    "demux_sbs", "demux_rgb", "mux_average", "mux_merge_ab", "mux_multiview",
    "census_transform_9x7", "hamming48", "ci_ad", "ci_census",
    "ci_adcensus_combine", "ci_adcensus", "cross_arms", "cross_aggregate",
    "dc_wta", "dc_hslo", "dr_dcc", "dr_irv", "filter_gaussian_lift",
    "filter_bilateral", "filter_bleed", "filter_median", "gaussian_kernel_2d",
    "gaussian_lut_1d", "dibr_occl", "dibr_occl_to_mask", "dibr_backward_warp",
    "dibr_dbm", "dibr_forward_warp", "dibr_dfm", "op_invertnormf",
    "tx_scale_bilinear", "tx_scale_nearest", "tx_disp_scale",
]
