#!/usr/bin/env python
"""Per-stage roofline / MFU accounting for the band-engine pipeline.

For every stage of the shipping 1080p/D=128/V=8 graph this computes, from
the algorithm (not from HLO), the three resource totals a TPU v5e chip
must spend:

  * MXU MACs        (banded-matmul aggregation / IRV passes)
  * VPU element-ops (everything elementwise: compares, selects, adds;
                     transcendentals counted separately at their measured
                     per-element cost)
  * HBM bytes       (every volume/plane each kernel reads or writes,
                     including XLA relayouts)

and converts each into a time floor against v5e peaks.  The stage's
roofline bound is max(mxu, vpu, hbm) -- the binding resource -- and
"% of light" is bound / measured.  This makes the north-star
"speed-of-light kernels" claim auditable (VERDICT r3 item 2): a stage at
~>=50% of a VPU-issue bound has little headroom left without changing
the algorithm's op count; a stage at 10% is an optimization target.

v5e peak numbers (public: cloud.google.com/tpu/docs/v5e and the JAX
scaling book): 197 bf16 TFLOP/s (4 MXUs), HBM 819 GB/s.  The VPU's
4-port (8,128) issue peak would be ~6.1e12 f32 element-ops/s, but a
dependent add/mul chain microbenchmark (Pallas, VMEM-resident, relay
amortized) sustains 1.6-2.0e9 vreg-ops/s = ~2.0e12 element-ops/s on
this chip -- the MEASURED ceiling real kernels see.  Floors here use
the measured rate; the analysis therefore says what is actually
reachable, not what a datasheet implies.

Measured ms come from scripts/profile_band.py (relay-amortized, net of
dispatch); pass them with --measured 'stage=ms,stage=ms,...' or accept
the recorded r4 defaults.
"""

import argparse
import sys

CLK = 1.5e9                      # v5e core clock (197e12 / (4*2*128*128))
MXU_FLOPS = 197e12               # bf16
VPU_EOPS = 2.0e12                # measured sustained (microbench; 4-port datasheet peak would be 6.1e12)
HBM_BPS = 819e9
EXP_COST = 3.0                   # VPU element-ops per transcendental:
                                 # the v5e has a hardware exp pipe
                                 # (measured: the cost kernel's 1.3G
                                 # exps cost ~1 ms total)


def fmt(x, unit):
    for s, m in (("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if x >= m:
            return f"{x / m:7.1f} {s}{unit}"
    return f"{x:7.1f}  {unit}"


def stage_model(H, W, D, V, usd, lsd, r_bil, r_feather, irv_rounds,
                digits=3):
    """Returns {stage: dict(macs, eops, exps, bytes, note)}.

    Element counts follow the shipping kernels (ops/costkern.py,
    ops/band.py, ops/postkern.py, ops/warpkern.py); per-element op
    counts are the kernel's arithmetic ops only (loads/stores ride the
    bytes term; slicing/roll overhead is real issue cost NOT modeled,
    which again makes the floors optimistic).
    """
    N = H * W
    E = 2
    halo = max(8, -(-usd // 8) * 8)        # ops.band._halo_for
    otile = 128
    win = otile + 2 * halo                 # band window per output tile

    st = {}

    # ---- cross arms (postkern._arms_kernel, both orientations) ----
    # per (pixel, direction-pair, k): shared compare plane F_k = 3 abs +
    # 2 max (bf16), then per direction: max-with-ndm (lsd tier), sub,
    # compare, add ~ 4; two orientations cover 4 directions.
    eops = E * N * 2 * (usd - 1) * (5 + 2 * 4)
    st["arms_lr"] = dict(
        macs=0, eops=eops, exps=0,
        bytes=E * N * (3 * 4 * 2 + 2 * 4 * 2) * 2,  # planes in, arms out x2 orientations
        note=f"VPU walk, {usd - 1} taps x 2 orientations")

    # ---- cost init (pair-volume shear, costkern._cost_kernel_xm) ----
    pair = (W + 256) * H * D               # extended pair volume elems
    # per elem: AD 3*(abs+sub+add) ~ 8, census 2 xor + 2 popcnt + add ~ 5,
    # combine 2*(mul+exp+sub+add) ~ 8 + 2 exps, quant ~ 2
    st["cost"] = dict(
        macs=0,
        eops=pair * (8 + 5 + 8 + 2),
        exps=pair * 2,
        bytes=(pair * 2                    # write P (bf16)
               + N * D * 2 * 2            # shear: read P slice + write R
               + E * N * D * 2 * 2),      # (D,W,H)->(H,W,D) relayout r+w
        note="pair volume + shear + 2 relayouts")

    # ---- aggregation (band_aggregate_q: H,V,V,H + fused WTA) ----
    # digit dots per pass: p1=1 (u8 costs are one bf16 digit at the
    # default qscale), p2=p3=p4=`digits` (cfg.band_digits; 3 is the
    # shipping default -- faster end-to-end, BASELINE.md r5)
    digit_passes = 1 + 3 * digits
    macs = E * N * D * win * digit_passes
    # inter-pass volume dtype: int16 holds the digits<=2 bounds;
    # digits=3's ~18-bit values ride int32
    isz = 4 if digits >= 3 else 2
    # VPU per output elem per pass: band build ~3 ops amortized over D
    # lanes => 3*win/D; digit split ~3 ops/digit on the window =>
    # 3*digits*win/otile for p2/p4; rescale+resplit ~5.5/digit on
    # outputs of p2/p3; WTA ~4.
    eops = E * N * D * (
        4 * (3 * win / D)                  # band builds (4 passes)
        + 2 * (3 * digits * win / otile)   # splits at p2, p4
        + 2 * 5.5 * digits                 # rescale + re-split p2/p3
        + 4)                               # fused WTA
    byts = (E * N * D * (2          # p1 reads bf16 cost
                         + 2 * isz  # p1 writes + vv reads
                         + 2 * isz) # vv writes + p4 reads
            + E * N * 4)            # disparity out
    st["agg+wta"] = dict(macs=macs, eops=int(eops), bytes=int(byts),
                         exps=0,
                         note=f"win={win} x {digit_passes} digit-dots")

    # ---- dcc (postkern._dcc_kernel value loop) ----
    st["dcc"] = dict(macs=0, eops=E * N * D * 6, exps=0,
                     bytes=E * N * (4 + 4) * 2,
                     note="D-value loop over the FULL range; the shipping kernel is data-adaptive (per-block range)")

    # ---- IRV (irvkern fused round; data-dependent early stop) ----
    # per round: one-hot E*N*D ~2; two inclusive band passes (1 digit,
    # bf16) MXU; vote logic ~25/pixel.  HBM: volume bf16 r/w per pass.
    macs = irv_rounds * E * N * D * win * 2
    eops = irv_rounds * E * N * (D * 2 + 25)
    byts = irv_rounds * E * N * D * 2 * 3
    st[f"irv({irv_rounds})"] = dict(macs=macs, eops=eops, exps=0,
                                    bytes=byts,
                                    note="2 one-hot band passes/round")

    # ---- bilateral (postkern._bilat_kernel) ----
    taps = (2 * r_bil + 1) ** 2
    st["bilateral"] = dict(macs=0,
                           eops=E * N * taps * 8,
                           exps=E * N * taps,
                           bytes=E * N * 4 * 2,
                           note=f"{taps} taps, exp per tap")

    # ---- synthesis ----
    st["occl"] = dict(macs=0, eops=E * N * D * 4, exps=0,
                      bytes=E * N * 8, note="full-range value loop; shipping kernel adaptive")
    st["bleed+mask"] = dict(macs=0, eops=E * N * 9 * 2, exps=0,
                            bytes=E * N * 8, note="3x3 count")
    ftaps = 2 * (2 * r_feather + 1)
    st["feather"] = dict(macs=0, eops=N * ftaps * 3, exps=0,
                         bytes=N * 8, note="separable lifting blur")
    # warp: per direction sum_v bound widths = D * sum(shifts); per
    # (pixel, k, view-in-range): ~7 select ops; window builds ~6 ops per
    # (k, channel) amortized over the 128-lane tile.
    shifts = [1.0 - v / (V - 1.0) for v in range(1, V - 1)]
    sumw = D * (sum(shifts) + sum(1 - s for s in shifts))
    union = D * 2 + 4
    eops = N * (sumw * 7 + union * 3 * 6) + N * len(shifts) * 2 * 12
    st["warp_views"] = dict(macs=0, eops=int(eops), exps=0,
                            bytes=int(N * (6 * 4 + len(shifts) * 2 * 3 * 4)),
                            note=f"static sum widths {int(sumw)}; shipping kernel adaptive (below this floor on real content)")
    st["merge+mask"] = dict(macs=0, eops=N * len(shifts) * 3 * 8, exps=0,
                            bytes=N * len(shifts) * 3 * (4 * 2 + 1),
                            note="mask mul + truncating blend")
    st["mux"] = dict(macs=0, eops=N * 3 * 10, exps=0,
                     bytes=N * 3 * (V // 4 + 1),
                     note="subpixel view select")
    return st


def hslo_row(H, W, D, rows_blk=None):
    """Optional-stage floor for the fused scanline-DP kernel
    (ops/hslokern.py, --hslo).  Unlike every other stage the DP is
    LATENCY-bound: each column's (rows_blk, D) update depends on the
    previous column's, so the critical path is
        grid_steps x W x 2 directions x DEP dependent vector ops,
    priced at VLAT cycles each (dependent-op latency; issue cost of the
    2 f32 vregs per op is below it).  DEP ~= 12: the cross-lane min
    reduce (~7 log steps) + the add/min/min/add/sub chain of the SGM
    update (d_dc_hslo.cu:31-95 semantics).  The elementwise work (loads,
    penalty tiers, non-chain ops) and HBM bytes ride the usual terms and
    are overlapped with the chain on real hardware, so the row's bound
    is max(), like every other stage."""
    if rows_blk is None:
        import os
        import sys
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".."))
        from stereo_to_multiview_tpu.ops.hslokern import _pick_rows
        rows_blk = _pick_rows(-(-W // 8) * 8, D, 4)   # int32 volume
    E = 2
    N = H * W
    DEP, VLAT = 12, 6
    steps = -(-E * H // rows_blk)
    lat_cyc = steps * W * 2 * DEP * VLAT
    return dict(macs=0,
                eops=E * N * D * (2 * (1 + 9 + 8) + 4),
                exps=0,
                bytes=E * N * D * 5 + E * N * 4,
                lat_cyc=lat_cyc,
                note=f"serial DP chain: {steps}x{W} cols x 2 dirs x "
                     f"{DEP} deps @ {VLAT} cyc; {rows_blk}-row blocks")


# r5 measured stage table (fish-3x input, 1x v5e, lax.map batch 4-16,
# net of relay dispatch; outputs reduced but kernel work DCE-proof) --
# update alongside BASELINE.md.  "agg+wta" = band_aggregate_q both eyes
# with the cost volumes precomputed; "cost" = ci_adcensus_kern_xm with
# outputs sum-consumed (the relayouts cannot be dead-code-eliminated).
MEASURED = {
    "arms_lr": 3.7,
    "cost": 9.4,           # ci_adcensus_kern_xm, outputs sum-consumed
    "agg+wta": 28.3,       # 2 x full band_aggregate_q 14.17/eye at the
                           # digits=3 default (r5 agg_probe; the d2
                           # path measured 15.3/eye).  ~11 ms/eye is
                           # pure MXU digit-dots at the 98.5% measured
                           # rate; every cheaper formulation measured
                           # or priced worse (BASELINE.md r5
                           # rejected-levers list)
    "dcc": 2.8,
    "irv": 1.8,            # r5 full-graph ablation (irv=5 vs irv=0)
                           # at the band_digits=3 default: the cleaner
                           # disparities collapse the early-stopped
                           # sparse rounds (9.9 ms at digits=2)
    "bilateral": 4.4,
    "occl": 2.0,
    "bleed+mask": 2.1,     # r4 standalone rows; the r5 synth chain runs
    "feather": 1.1,        # these fused in the warp kernel's transposed
    "warp_views": 6.6,     # domain (8a172b3) -- in-graph synth ~8 ms
    "merge+mask": 2.0,
    "mux": 0.7,
}
MEASURED_R4 = MEASURED   # back-compat alias


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1080)
    ap.add_argument("--cols", type=int, default=1920)
    ap.add_argument("--disp", type=int, default=128)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--usd", type=int, default=34)
    ap.add_argument("--lsd", type=int, default=17)
    ap.add_argument("--bilateral", type=int, default=7)
    ap.add_argument("--feather", type=int, default=10)
    ap.add_argument("--digits", type=int, default=3,
                    help="aggregation digit planes (cfg.band_digits; "
                         "3 is the shipping default)")
    ap.add_argument("--irv-rounds", type=float, default=0.5,
                    help="EFFECTIVE in-graph rounds on real content (the "
                         "early-stopped loop + sparse flag-gated DMA "
                         "collapse the bench content to ~0.5 at the "
                         "band_digits=3 default -- measured 1.8 ms by "
                         "full-graph ablation; use 5 for the standalone "
                         "dense worst case)")
    ap.add_argument("--measured", default="",
                    help="stage=ms,... measured times to rate against")
    ap.add_argument("--hslo", action="store_true",
                    help="add the optional scanline-DP stage's row "
                         "(excluded from the default-path total)")
    args = ap.parse_args()

    measured = dict(MEASURED_R4)
    if args.measured:
        for kv in args.measured.split(","):
            k, v = kv.split("=")
            measured[k] = float(v)

    st = stage_model(args.rows, args.cols, args.disp, args.views,
                     args.usd, args.lsd, args.bilateral, args.feather,
                     args.irv_rounds, args.digits)
    if args.hslo:
        st["hslo"] = hslo_row(args.rows, args.cols, args.disp)

    hdr = (f"{'stage':14s} {'MXU':>10s} {'VPU eops':>10s} {'HBM':>10s} "
           f"{'mxu ms':>7s} {'vpu ms':>7s} {'hbm ms':>7s} "
           f"{'bound':>6s} {'meas':>7s} {'%light':>6s}  note")
    print(hdr)
    print("-" * len(hdr))
    tot_bound = tot_meas = 0.0
    for name, d in st.items():
        t_mxu = 2 * d["macs"] / MXU_FLOPS * 1e3
        t_vpu = (d["eops"] + EXP_COST * d["exps"]) / VPU_EOPS * 1e3
        t_hbm = d["bytes"] / HBM_BPS * 1e3
        t_lat = d.get("lat_cyc", 0) / CLK * 1e3
        bound = max(t_mxu, t_vpu, t_hbm, t_lat)
        which = ("mxu", "vpu", "hbm", "lat")[
            [t_mxu, t_vpu, t_hbm, t_lat].index(bound)]
        m = measured.get(name.split("(")[0], measured.get(name))
        tot_bound += bound
        pct = ""
        ms = ""
        if m:
            tot_meas += m
            pct = f"{100 * bound / m:5.0f}%"
            ms = f"{m:7.1f}"
        print(f"{name:14s} {fmt(2 * d['macs'], 'F'):>10s} "
              f"{fmt(d['eops'] + EXP_COST * d['exps'], 'op'):>10s} "
              f"{fmt(d['bytes'], 'B'):>10s} "
              f"{t_mxu:7.2f} {t_vpu:7.2f} {t_hbm:7.2f} "
              f"{which:>6s} {ms:>7s} {pct:>6s}  {d['note']}")
    print("-" * len(hdr))
    line = f"{'TOTAL':14s} {'':>10s} {'':>10s} {'':>10s} " \
           f"{'':7s} {'':7s} {'':7s} {tot_bound:6.1f}"
    if tot_meas:
        line += f" {tot_meas:7.1f} {100 * tot_bound / tot_meas:5.0f}%"
    print(line)
    print(f"\nroofline frame floor {tot_bound:.1f} ms = "
          f"{1e3 / tot_bound:.1f} fps at the MEASURED VPU rate (zero "
          f"slicing/launch overhead assumed; stage floors simply add)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
