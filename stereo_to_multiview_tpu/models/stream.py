"""Streaming driver -- the reference's video_io loop (video_io.cpp:42-224)
rebuilt for TPU: background-thread frame decode (host) overlapped with
device compute, steady-state fps metering, output sinks to files instead of
a HighGUI window.  Loops the source at EOF like the reference
(video_io.cpp:149-153).
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator, List, Optional

import numpy as np

from stereo_to_multiview_tpu.config import PipelineConfig
from stereo_to_multiview_tpu.utils.bmp import read_bmp
from stereo_to_multiview_tpu.utils.timing import FrameMeter


class FrameSource:
    """SBS frame source from files.

    Accepted layouts:
      * directory of SBS frames:     frame_000.bmp, frame_001.bmp, ...
      * directory of L/R pairs:      sorted files taken two at a time as
        non-overlapping (L, R) pairs -- (f0, f1), (f2, f3), ... --
        stitched into SBS (pair mode).
    """

    def __init__(self, path: str, pair_mode: bool = False,
                 loop: bool = True, max_frames: Optional[int] = None):
        if os.path.isdir(path):
            files = sorted(glob.glob(os.path.join(path, "*.bmp")))
        else:
            files = sorted(glob.glob(path))
        if not files:
            raise FileNotFoundError(f"no BMP frames at {path}")
        self.files = files
        self.pair_mode = pair_mode
        self.loop = loop
        self.max_frames = max_frames

    def _frame_list(self) -> List:
        if self.pair_mode:
            return list(zip(self.files[0::2], self.files[1::2]))
        return self.files

    def __iter__(self) -> Iterator[np.ndarray]:
        n = 0
        items = self._frame_list()
        while True:
            for it in items:
                if self.max_frames is not None and n >= self.max_frames:
                    return
                if self.pair_mode:
                    l = read_bmp(it[0])
                    r = read_bmp(it[1])
                    if l.shape != r.shape:
                        continue  # skip mismatched pairs (bud_1 vs bud_2)
                    yield np.concatenate([l, r], axis=1)
                else:
                    yield read_bmp(it)
                n += 1
            if not self.loop:
                return


class Y4MSource:
    """SBS frame source from a Y4M video file -- the analog of the
    reference's cv::VideoCapture loop (video_io.cpp:77,148-153), including
    looping at EOF.  Uses the native C++ reader when the toolchain is
    available, the NumPy fallback otherwise (bit-identical output)."""

    def __init__(self, path: str, loop: bool = True,
                 max_frames: Optional[int] = None):
        self.path = path
        self.loop = loop
        self.max_frames = max_frames
        self._reader = self._open()
        self.h, self.w = self._reader.h, self._reader.w

    def _open(self):
        from stereo_to_multiview_tpu import native as _native
        if _native.available():
            return _native.NativeY4M(self.path)
        from stereo_to_multiview_tpu.utils.y4m import Y4MReader
        return Y4MReader(self.path)

    def __iter__(self) -> Iterator[np.ndarray]:
        n = 0
        r = self._reader
        while True:
            fr = r.read_frame()
            if fr is None:
                if not self.loop or n == 0:
                    return
                r.rewind()
                continue
            yield fr
            n += 1
            if self.max_frames is not None and n >= self.max_frames:
                return


class FFmpegSource:
    """SBS frame source from ANY container ffmpeg can open (mp4, mkv,
    webm, ...): an `ffmpeg -i X -f yuv4mpegpipe -` subprocess feeds the
    Y4M parser -- the full analog of the reference's cv::VideoCapture
    (video_io.cpp:77), which also delegates demux/decode to a library.
    EOF looping (video_io.cpp:148-153) restarts the subprocess (pipes
    cannot rewind).  Requires the `ffmpeg` binary on PATH; no Python
    dependency."""

    def __init__(self, path: str, loop: bool = True,
                 max_frames: Optional[int] = None, ffmpeg: str = "ffmpeg"):
        import shutil
        self.path = path
        self.loop = loop
        self.max_frames = max_frames
        self.ffmpeg = ffmpeg
        if shutil.which(ffmpeg) is None:
            raise FileNotFoundError(
                f"'{ffmpeg}' not on PATH -- install ffmpeg or pre-convert "
                f"with `ffmpeg -i {path} out.y4m` and pass the .y4m")
        self._proc = None
        self._reader = self._spawn()
        self.h, self.w = self._reader.h, self._reader.w

    def _command(self):
        return [self.ffmpeg, "-v", "error", "-nostdin", "-i", self.path,
                "-f", "yuv4mpegpipe", "-pix_fmt", "yuv420p", "-"]

    def _spawn(self):
        import subprocess
        from stereo_to_multiview_tpu.utils.y4m import Y4MReader
        self._close_proc()
        self._proc = subprocess.Popen(self._command(),
                                      stdout=subprocess.PIPE)
        return Y4MReader(self._proc.stdout)

    def _close_proc(self):
        if self._proc is not None:
            self._proc.stdout.close()
            self._proc.wait()
            self._proc = None

    def __iter__(self) -> Iterator[np.ndarray]:
        n = 0
        if self._proc is None:
            # a previous iteration reaped the child (finally below):
            # respawn so the source is re-iterable (ADVICE r4)
            self._reader = self._spawn()
        try:
            while True:
                fr = self._reader.read_frame()
                if fr is None:
                    if not self.loop or n == 0:
                        return
                    self._reader = self._spawn()
                    continue
                yield fr
                n += 1
                if self.max_frames is not None and n >= self.max_frames:
                    return
        finally:
            # consumers may abandon the iterator early (stream() abort,
            # break): always reap the ffmpeg child
            self._close_proc()

    def close(self) -> None:
        self._close_proc()


def native_source(path: str, pair_mode: bool = False, loops: int = 1,
                  depth: int = 4, threads: int = 2):
    """Frame iterator backed by the native C++ decode queue
    (native/stm_native.cpp): multi-threaded BMP decode + SBS stitch ahead
    of the consumer.  Falls back to FrameSource when the toolchain is
    unavailable."""
    import glob as _glob
    from stereo_to_multiview_tpu import native as _native

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.bmp")))
    else:
        files = sorted(_glob.glob(path))
    if not files:
        raise FileNotFoundError(f"no BMP frames at {path}")
    if not _native.available():
        return FrameSource(path, pair_mode=pair_mode, loop=loops > 1,
                           max_frames=None)
    if pair_mode and len(files) % 2:
        files = files[:-1]     # C side consumes files two at a time (L, R)
    return _native.NativeFrameQueue(files, pair_mode=pair_mode, depth=depth,
                                    loops=loops, threads=threads)


class PrefetchingSource:
    """Decode frames on a host thread so IO overlaps device compute --
    the TPU analog of overlapping OpenCV decode with GPU kernels."""

    def __init__(self, source, depth: int = 4):
        self.source = source
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            for frame in self.source:
                self.q.put(frame)
        finally:
            self.q.put(self._done)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self._done:
                return
            yield item


def stream(source, cfg: PipelineConfig, lowres: bool = False,
           on_frame=None, prefetch: int = 4, verbose: bool = True,
           max_consecutive_failures: int = 3, depth: int = 1,
           readback: str = "full"):
    """Run the fused pipeline over a frame stream.  Returns FrameMeter stats.

    on_frame(i, disp_l, disp_r, interlaced) is called with device arrays --
    fetch with np.asarray only if you need host data (it synchronizes).

    depth: frames in flight on the device.  1 (default) = the reference's
    serial loop shape (upload -> compute -> fetch per frame; the metered
    time is true per-frame latency).  depth >= 2 pipelines: frame i+1's
    upload+compute is dispatched (JAX async) before frame i's result is
    fetched, overlapping host<->device transfers with compute -- the
    metered time is then the completion-to-completion delta, i.e.
    steady-state THROUGHPUT per frame, not latency.

    readback: "full" fetches the whole interlaced frame to the host per
    frame (the reference display loop's shape, video_io.cpp:167-170);
    "sync" forces completion with a tiny corner fetch and leaves the
    frames on device (a device-resident consumer -- display/encode fed
    from HBM).  Through the axon relay the full 1080p readback alone
    costs ~30 ms + size/20 MB/s (measured r5), which buries the compute;
    on directly-attached hardware D2H is ~3 orders faster and the two
    modes converge.

    Failure policy (SURVEY.md section 5): the reference exits the process
    on any CUDA error (cuda_utils.h:19) but silently loops past video read
    failures (video_io.cpp:149-153).  Here a bad frame (decode error,
    shape mismatch, device error) is logged and skipped; more than
    `max_consecutive_failures` in a row aborts the stream, since that
    signals a wedged device rather than a corrupt frame.
    """
    import jax
    from stereo_to_multiview_tpu.models.pipeline import (
        process_frame, process_frame_lowres)

    fn = process_frame_lowres if lowres else process_frame
    meter = FrameMeter(warmup=2)
    src = PrefetchingSource(source, prefetch) if prefetch else source

    import time as _time
    from collections import deque
    failures = 0
    inflight = deque()          # (index, t_dispatch, out) awaiting fetch
    last_done = None

    def _finish(j, t0, out):
        """Fetch frame j's result and meter it.  May raise (device
        errors belong to the failure policy)."""
        nonlocal last_done
        if readback == "full":
            np.asarray(out[2])          # whole interlaced frame to host
        else:
            np.asarray(out[2][:8, :8])  # completion probe only
        now = _time.perf_counter()
        # depth 1: time directly around upload+compute+fetch, so consumer
        # callback time (PNG dumps, a paused preview's wait) never
        # pollutes fps/ms_max stats (ADVICE r4).  Pipelined: completion
        # deltas (callbacks DO land in the delta -- run bare for records).
        dt = (now - t0) if depth <= 1 or last_done is None \
            else (now - last_done)
        last_done = now
        meter.add(dt)
        if verbose and meter.times:
            print(f"[[ frame {j} took: {meter.times[-1]*1e3:.1f} ms ]]")
        return j, out

    def _emit(done):
        if done is not None and on_frame is not None:
            # outside the failure policy: a consumer bug is the caller's
            # error and must propagate, not count as a bad frame
            on_frame(done[0], *done[1])

    for i, sbs in enumerate(src):
        try:
            t0 = _time.perf_counter()
            out = fn(jax.device_put(sbs), cfg)   # async dispatch
            inflight.append((i, t0, out))
            done = None
            if len(inflight) >= max(1, depth):
                done = _finish(*inflight.popleft())
        except Exception as e:  # noqa: BLE001 -- stream must survive a frame
            failures += 1
            print(f"[[ frame {i} FAILED: {type(e).__name__}: {e} ]]")
            if failures > max_consecutive_failures:
                raise
            continue
        failures = 0
        _emit(done)
    for item in inflight:
        _emit(_finish(*item))
    return meter.stats()
