"""Pipeline configuration.

The reference passes 15-16 positional argv parameters (image_io.cpp:118-131,
video_io.cpp:96-109) and hard-codes the rest per call site (IRV iterations,
bilateral/bleed/feather radii, DCC threshold, census window).  Here every knob
lives in one frozen, hashable dataclass so the whole config can be a static
argument to `jax.jit` -- shapes and loop counts are compile-time constants,
which is what XLA wants.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """All parameters of the stereo->multiview pipeline.

    Disparity convention (reference d_ci_ad.cu:133-144, d_dc_wta.cu:34):
    cost plane d compares L(x) with R(x + (d - zero_disp)); the computed
    disparity is `argmin_d - zero_disp`, spanning [-zero_disp,
    num_disp - zero_disp).
    """

    # --- geometry ---
    num_rows: int = 360          # input rows (single eye)
    num_cols: int = 640          # input cols (single eye); SBS input is 2x
    num_rows_out: int = 360      # interlaced output rows
    num_cols_out: int = 640      # interlaced output cols

    # --- disparity search ---
    num_disp: int = 64           # number of disparity hypotheses D
    zero_disp: int = 32          # index of zero disparity inside [0, D)

    # --- cost initialization (d_ci_adcensus.cu:27-34) ---
    ad_coeff: float = 10.0       # lambda_AD in 1-exp(-c/lambda)
    census_coeff: float = 30.0   # lambda_census

    # --- cross-based aggregation (d_ca_cross.cu:17-172) ---
    ucd: float = 6.0             # color threshold beyond lsd ("upper")
    lcd: float = 20.0            # color threshold within lsd ("lower")
    usd: int = 34                # max arm length ("upper spatial")
    lsd: int = 17                # near/far switch distance ("lower spatial")

    # --- disparity refinement ---
    dcc_thresh: float = 1.0      # LR mismatch threshold (d_dr_dcc.cu:117)
    irv_iterations: int = 5      # streaming path d_io.cu:147; image path uses 1
    irv_thresh_s: int = 20       # min reliable votes (dr_irv_kernel_3:36)
    irv_thresh_h: float = 0.4    # vote-ratio threshold (dr_irv_kernel_3:36)

    # --- post filters ---
    bilateral_radius: int = 7        # d_io.cu:150 (streaming: 7,5,10)
    bilateral_sigma_color: float = 5.0
    bilateral_sigma_spatial: float = 10.0
    bleed_radius: int = 1            # d_io.cu:167
    feather_radius: int = 10         # d_dibr_bwarp.cu:63 (streaming: 10,15)
    feather_sigma: float = 15.0

    # --- view synthesis / mux ---
    num_views: int = 8
    angle: float = 18.43         # lenticular slant, degrees (d_mux_multiview.cu:146)

    # --- compute engine ---
    # "auto": banded-MXU Pallas kernels on TPU, pure-XLA select-shift path
    # on CPU (tests / virtual meshes).  "band" / "xla" force one.
    engine: str = "auto"
    band_nsplit: int = 2         # bf16 split terms for float band matmuls
                                 # (2 ~ 1e-5 rel err, 3 ~ f32; IRV is exact
                                 # regardless)
    band_digits: int = 3         # aggregation digit planes (all exact
                                 # integer arithmetic):
                                 # 3 (default, r5): ~17-18 bits kept per
                                 #   pass (inputs bounded by (2^24-1)/
                                 #   wmax, int32 inter volumes) -- and
                                 #   MEASURED FASTER than 2 at 1080p
                                 #   (58.8 vs 71.2 ms/frame, same-process
                                 #   A/B) while cutting the bud bad-pixel
                                 #   residual 0.0135 -> 0.0006;
                                 # 2: the r2-r4 base-256 pair path
                                 #   (2^15 per-pass bound, int16
                                 #   volumes);
                                 # 1: single-digit fast path (~4 bits
                                 #   lost per rescale, WTA flips at
                                 #   near-ties)
    band_qscale: float = 127.0   # band-engine cost quantization scale
                                 # (q = rint(cost * qscale), cost <= 2).
                                 # 127 (default): u8 volumes, the r2-r4
                                 # shipping path.  Higher values (255,
                                 # 510, 1020) shrink the engine's single
                                 # lossy step's residual at a documented
                                 # cost: int16 cost volumes (2x relayout
                                 # bytes) and a split pass-1 digit dot
                                 # (scripts/qscale_sweep.py; BASELINE.md
                                 # fidelity dial rows)
    band_lossy_wta: bool = False # speed dial: pass 4 of the band
                                 # aggregation feeds WTA through ONE
                                 # bf16 dot (8 mantissa bits) instead of
                                 # band_digits exact digit dots.  The
                                 # aggregate is only an argmin input
                                 # there, so rounding flips WTA only at
                                 # near-ties (bud 0.0003/0.0004 of
                                 # pixels, fish identical; BASELINE.md
                                 # r5).  Deterministic + row-local:
                                 # chunking/sharding stay bit-identical
                                 # -- only golden exactness is relaxed
    xla_agg_qscale: float = 0.0  # > 0: quantize costs to
                                 # rint(cost*qscale) before the XLA
                                 # engine's cumsum aggregation.  Integer
                                 # cumsums are exact (prefix bounds
                                 # checked at trace time), so the XLA
                                 # engine becomes bit-deterministic under
                                 # any halo sharding -- the exactness
                                 # harness for parallel.halo.  0 = off
                                 # (reference-parity f32 aggregation).
    band_row_chunk: int = 0      # stereo-core rows per streamed chunk; 0 =
                                 # whole frame at once (int16 intermediate
                                 # volumes keep 1080p under ~3 GB of HBM;
                                 # set a chunk for 4K+ frames)
    irv_row_chunk: int = 0       # IRV rows per streamed chunk (0 = whole
                                 # frame; the bf16 row-span volume is half
                                 # the size of a cost volume)

    # --- optional stages ---
    use_median: bool = False     # 3x3 median on both refined disparity maps
                                 # between IRV and the bilateral filter --
                                 # the reference keeps filter_median callable
                                 # there but commented out on the live path
                                 # (image_io.cpp:239-240, d_filter.cu:7-45)
    use_hslo: bool = False       # real scanline optimization (reference stub
                                 # d_dc_hslo.cu is inert; off preserves parity)
    hslo_T: float = 15.0         # color-gradient threshold for penalties
    hslo_H1: float = 1.0         # base P1 penalty
    hslo_H2: float = 3.0         # base P2 penalty

    # --- low-resolution disparity variant (adcensus_stm_2, d_io.cu:240) ---
    num_rows_disp: int = 0       # 0 => full resolution (adcensus_stm path)
    num_cols_disp: int = 0
    disp_scale: float = 1.0      # disparity value scale between resolutions

    def __post_init__(self):
        if not (0 < self.zero_disp <= self.num_disp):
            raise ValueError("need 0 < zero_disp <= num_disp")
        if self.num_views < 2:
            raise ValueError("need at least 2 views (view 0 = right source, "
                             "view V-1 = left source; d_io.cu:182-183)")
        if self.usd < self.lsd:
            raise ValueError("usd must be >= lsd")

    # ---- derived, all static ----

    @property
    def lowres(self) -> bool:
        return self.num_rows_disp > 0 and self.num_cols_disp > 0

    @property
    def disp_shape(self) -> Tuple[int, int]:
        """Resolution at which disparity is estimated."""
        if self.lowres:
            return (self.num_rows_disp, self.num_cols_disp)
        return (self.num_rows, self.num_cols)

    @property
    def disp_range(self) -> Tuple[int, int]:
        """[min, max) of representable disparities."""
        return (-self.zero_disp, self.num_disp - self.zero_disp)

    @property
    def sbs_shape(self) -> Tuple[int, int, int]:
        return (self.num_rows, 2 * self.num_cols, 3)

    @property
    def out_shape(self) -> Tuple[int, int, int]:
        return (self.num_rows_out, self.num_cols_out, 3)

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


# Config used by the bundled test sequences (img/bud_*.bmp 640x360,
# img/fish_*.bmp 640x384).
BUD = PipelineConfig(num_rows=360, num_cols=640, num_rows_out=360, num_cols_out=640)
FISH = PipelineConfig(num_rows=384, num_cols=640, num_rows_out=384, num_cols_out=640)

# BASELINE.json measurement configs.
HD1080_D128 = PipelineConfig(
    num_rows=1080, num_cols=1920, num_rows_out=1080, num_cols_out=1920,
    num_disp=128, zero_disp=64, num_views=8)
UHD4K_16V = PipelineConfig(
    num_rows=2160, num_cols=3840, num_rows_out=2160, num_cols_out=3840,
    num_disp=128, zero_disp=64, num_views=16,
    band_row_chunk=540, irv_row_chunk=1080)
