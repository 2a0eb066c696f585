#!/usr/bin/env python
"""Streaming demo -- the reference's video_io (video_io.cpp:42-224) without
OpenCV: frames come from a Y4M video file (*.y4m -- real video ingestion,
`ffmpeg -i in.mp4 out.y4m`) or a directory of SBS BMPs (or stitched L/R
pairs).  Each frame runs the fused adcensus_stm-analog graph, per-frame
latency is printed, and selected outputs are written as PNG.

Positional parameters mirror the reference CLI:
  video_io.py VIDEO NVIEWS ANGLE OUT_W OUT_H NDISP ZERODISP AD_COEFF
              CENSUS_COEFF UCD LCD USD LSD THRESH_S THRESH_H

VIDEO is resolved under --vid-dir (default ./vid), like the reference's
./vid/<file> (video_io.cpp:66-68).  It may be a directory or a glob.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("video")
    p.add_argument("nviews", type=int), p.add_argument("angle", type=float)
    p.add_argument("out_w", type=int), p.add_argument("out_h", type=int)
    p.add_argument("ndisp", type=int), p.add_argument("zerodisp", type=int)
    p.add_argument("ad_coeff", type=float), p.add_argument("census_coeff", type=float)
    p.add_argument("ucd", type=float), p.add_argument("lcd", type=float)
    p.add_argument("usd", type=int), p.add_argument("lsd", type=int)
    p.add_argument("thresh_s", type=int), p.add_argument("thresh_h", type=float)
    p.add_argument("--vid-dir", default="./vid")
    p.add_argument("--out-dir", default=None,
                   help="write disparity+interlaced PNGs per frame")
    p.add_argument("--pair-mode", action="store_true",
                   help="treat frames as alternating L/R single images")
    p.add_argument("--frames", type=int, default=None, help="stop after N")
    p.add_argument("--no-loop", action="store_true")
    p.add_argument("--preview", type=int, default=None, metavar="PORT",
                   help="serve a live browser preview (interlaced + "
                        "disparity) at http://host:PORT/ -- the analog "
                        "of the reference's HighGUI display loop with "
                        "pause/resume (video_io.cpp:167-221)")
    p.add_argument("--preview-host", default="127.0.0.1",
                   help="preview bind address (default loopback; pass "
                        "0.0.0.0 to expose it -- /pause is "
                        "unauthenticated and stalls the stream)")
    p.add_argument("--lowres", type=str, default=None, metavar="RxC:SCALE",
                   help="adcensus_stm_2 mode, e.g. 192x320:1.0")
    p.add_argument("--depth", type=int, default=1,
                   help="frames in flight on the device: 1 = serial "
                        "latency loop (reference shape); >=2 pipelines "
                        "uploads/fetches against compute and the printed "
                        "per-frame time becomes steady-state throughput")
    p.add_argument("--readback", choices=("full", "sync"), default="full",
                   help="full = fetch every interlaced frame to the host "
                        "(reference display-loop shape); sync = force "
                        "completion only, frames stay on device (a "
                        "device-resident display/encode consumer)")
    p.add_argument("--cpu", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.stream import FrameSource, stream
    from stereo_to_multiview_tpu.utils.imageio import (
        write_png, normalize_for_display)
    from stereo_to_multiview_tpu.utils.device import (
        print_device_info, enable_compilation_cache)
    enable_compilation_cache()

    print("=======================================")
    print("== STEREO TO MULTIVIEW VIDEO PROCESS ==")
    print("=======================================\n")
    print_device_info()

    path = args.video
    if not os.path.exists(path) and not glob_has(path):
        path = os.path.join(args.vid_dir, args.video)
    if path.endswith(".y4m"):
        # real video ingestion (analog of video_io.cpp:77 VideoCapture)
        from stereo_to_multiview_tpu.models.stream import Y4MSource
        src = Y4MSource(path, loop=not args.no_loop,
                        max_frames=args.frames)
        h, w_sbs = src.h, src.w
    elif os.path.splitext(path)[1].lower() in (
            ".mp4", ".mkv", ".webm", ".mov", ".avi", ".m4v", ".mpg",
            ".mpeg", ".ts") and os.path.isfile(path):
        # video containers: ffmpeg yuv4mpegpipe subprocess -> Y4M parser
        # (needs the ffmpeg binary; no Python dependency).  Image files
        # keep falling through to FrameSource for exact decoding.
        from stereo_to_multiview_tpu.models.stream import FFmpegSource
        src = FFmpegSource(path, loop=not args.no_loop,
                           max_frames=args.frames)
        h, w_sbs = src.h, src.w
    else:
        src = FrameSource(path, pair_mode=args.pair_mode,
                          loop=not args.no_loop, max_frames=args.frames)
        first = next(iter(FrameSource(path, pair_mode=args.pair_mode,
                                      loop=False, max_frames=1)))
        h, w_sbs = first.shape[:2]
    w = w_sbs // 2
    print(f"Input Width (SBS):  {w_sbs}")
    print(f"Input Width:        {w}")
    print(f"Input Height:       {h}\n")

    kw = {}
    lowres = False
    if args.lowres:
        dims, scale = args.lowres.split(":")
        rr, cc = dims.split("x")
        kw = dict(num_rows_disp=int(rr), num_cols_disp=int(cc),
                  disp_scale=float(scale))
        lowres = True

    cfg = PipelineConfig(
        num_rows=h, num_cols=w, num_rows_out=args.out_h,
        num_cols_out=args.out_w, num_disp=args.ndisp,
        zero_disp=args.zerodisp, ad_coeff=args.ad_coeff,
        census_coeff=args.census_coeff, ucd=args.ucd, lcd=args.lcd,
        usd=args.usd, lsd=args.lsd, irv_thresh_s=args.thresh_s,
        irv_thresh_h=args.thresh_h, num_views=args.nviews,
        angle=args.angle, **kw)

    callbacks = []
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

        def dump_frame(i, dl, dr, il):
            write_png(os.path.join(args.out_dir, f"disp_l_{i:04d}.png"),
                      normalize_for_display(np.asarray(dl)))
            write_png(os.path.join(args.out_dir, f"interlaced_{i:04d}.png"),
                      np.asarray(il))
        callbacks.append(dump_frame)

    if args.preview is not None:
        import time
        from stereo_to_multiview_tpu.utils.preview import PreviewServer
        pv = PreviewServer(args.preview, host=args.preview_host)
        print(f"live preview: http://{args.preview_host}:{pv.port}/")

        def preview_frame(i, dl, dr, il):
            pv.update(interlaced=np.asarray(il),
                      disp_l=normalize_for_display(np.asarray(dl)))
            while pv.paused:            # reference 'p' key behavior
                time.sleep(0.1)
        callbacks.append(preview_frame)

    on_frame = None
    if callbacks:
        def on_frame(i, dl, dr, il):
            for cb in callbacks:
                cb(i, dl, dr, il)

    stats = stream(src, cfg, lowres=lowres, on_frame=on_frame,
                   depth=args.depth, readback=args.readback)
    print(f"\nsteady-state: {stats}")
    return 0


def glob_has(pattern: str) -> bool:
    import glob
    return bool(glob.glob(pattern))


if __name__ == "__main__":
    sys.exit(main())
