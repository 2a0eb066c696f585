#!/usr/bin/env python
"""Scaling-efficiency accounting for the halo-sharded pipeline.

Real multi-chip hardware is not available in this environment, so this
script produces the two measurable halves of the ≥80% scaling-efficiency
target (BASELINE.md):

 1. **Communication volume, measured from the compiled artifact**: the
    halo pipeline is compiled for an n-device mesh (virtual CPU devices)
    and the HLO is walked for collective ops (collective-permute,
    all-reduce, all-gather); their operand shapes are summed into exact
    bytes exchanged per frame per device.  This is what actually crosses
    ICI, not a hand model.
 2. **Efficiency projection**: with the single-chip frame time T1 (from
    BENCH/BASELINE) and v5e ICI bandwidth (~45 GB/s per link per
    direction, "How to Scale Your Model" numbers), predicted efficiency
    is T1/n / (T1/n + bytes/BW + n_coll * hop_latency).

Usage: python scripts/scaling_model.py [--rows 1080 --cols 1920 ...]
       (runs on CPU with --xla_force_host_platform_device_count)
"""

import argparse
import os
import re
import sys

sys.path.insert(0, ".")

_DTYPE_BYTES = {"pred": 1, "u8": 1, "s8": 1, "u16": 2, "s16": 2, "bf16": 2,
                "f16": 2, "u32": 4, "s32": 4, "f32": 4, "u64": 8, "s64": 8,
                "f64": 8}


def collective_bytes(hlo_text: str):
    """Sum output bytes of collective ops in an HLO dump.  Returns
    {op_kind: (count, bytes)} -- bytes are per device (the HLO is the
    per-device SPMD program)."""
    pat = re.compile(
        r"=\s+(?:\([^)]*\)\s+)?([a-z0-9]+)\[([0-9,]*)\][^=]*?"
        r"(collective-permute|all-reduce|all-gather|reduce-scatter)\(")
    out = {}
    for m in pat.finditer(hlo_text):
        dt, dims, kind = m.group(1), m.group(2), m.group(3)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        cnt, tot = out.get(kind, (0, 0))
        out[kind] = (cnt + 1, tot + n * _DTYPE_BYTES[dt])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1080)
    ap.add_argument("--cols", type=int, default=1920)
    ap.add_argument("--disp", type=int, default=128)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--t1-ms", type=float, default=None,
                    help="measured single-chip ms/frame (default: from "
                         "BENCH_r01.json-style latest bench if present)")
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="ICI GB/s per link per direction (v5e)")
    ap.add_argument("--hop-us", type=float, default=1.0)
    ap.add_argument("--engine", default="band", choices=("band", "xla"),
                    help="band = the shipping TPU engine (Pallas kernels "
                         "compile in interpret mode on the CPU mesh; the "
                         "ppermutes are in the same shard graph)")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices} "
        + os.environ.get("XLA_FLAGS", ""))
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.parallel import make_mesh
    from stereo_to_multiview_tpu.parallel.halo import halo_process_frame

    cfg = PipelineConfig(
        num_rows=args.rows, num_cols=args.cols, num_rows_out=args.rows,
        num_cols_out=args.cols, num_disp=args.disp,
        zero_disp=args.disp // 2, num_views=args.views, engine=args.engine)
    mesh = make_mesh((args.devices,), ("row",),
                     jax.devices()[:args.devices])
    fn = halo_process_frame(mesh, cfg)
    sbs = jax.ShapeDtypeStruct(cfg.sbs_shape, jax.numpy.uint8)
    hlo = fn.lower(sbs).compile().as_text()

    stats = collective_bytes(hlo)
    total_b = sum(b for _, b in stats.values())
    n_coll = sum(c for c, _ in stats.values())
    print(f"config {args.rows}x{args.cols}/D{args.disp}/V{args.views}, "
          f"{args.devices}-device row mesh (halo path, "
          f"{args.engine} engine):")
    for kind, (cnt, b) in sorted(stats.items()):
        print(f"  {kind:20s} x{cnt:3d}  {b / 1e6:8.2f} MB/frame/device")
    print(f"  TOTAL                    {total_b / 1e6:8.2f} MB/frame/device")

    t1 = args.t1_ms
    if t1 is None:
        import glob
        import json
        t1 = 420.0
        for p in sorted(glob.glob("BENCH_r0*.json")):
            try:
                with open(p) as f:
                    d = json.load(f)
                t1 = 1e3 / d.get("parsed", d)["value"]   # driver wrapper
            except Exception:
                pass
    bw = args.ici_gbps * 1e9
    # NOTE: the projection assumes perfect compute scaling (T1/n) -- it is
    # an upper bound on efficiency loss from communication only; the
    # per-shard halo recompute overhead is measured separately
    # (BASELINE.md halo row).
    for n in (2, 4, 8, 16):
        # halo widths are fixed by the stencils, so bytes/device do not
        # grow with n (until shards shrink below the halo, which
        # halo_process_frame rejects)
        comm_ms = (total_b / bw) * 1e3
        lat_ms = n_coll * args.hop_us * 1e-3
        eff = (t1 / n) / (t1 / n + comm_ms + lat_ms)
        print(f"  n={n:2d}: T_comp {t1 / n:7.1f} ms  T_comm {comm_ms:6.2f} "
              f"ms (+{lat_ms:.2f} ms latency)  predicted efficiency "
              f"{eff * 100:5.1f}%")


if __name__ == "__main__":
    main()
