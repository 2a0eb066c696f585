"""Runtime layer tests: native C++ lib, frame sources, stream driver,
dump API."""

import os

import numpy as np
import pytest

from stereo_to_multiview_tpu.utils.bmp import read_bmp, write_bmp

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    """Four tiny SBS frames on disk."""
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(7)
    for i in range(4):
        write_bmp(str(d / f"frame_{i:03d}.bmp"),
                  rng.integers(0, 256, (24, 64, 3), dtype=np.uint8))
    return str(d)


def test_native_bmp_matches_python():
    from stereo_to_multiview_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    p = os.path.join(DATA, "bud_2.bmp")
    np.testing.assert_array_equal(native.read_bmp(p), read_bmp(p))


def test_native_bmp_write_roundtrip(tmp_path):
    from stereo_to_multiview_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 31, 3), dtype=np.uint8)  # odd row pad
    p = str(tmp_path / "t.bmp")
    native.write_bmp(p, img)
    np.testing.assert_array_equal(read_bmp(p), img)
    np.testing.assert_array_equal(native.read_bmp(p), img)


def test_native_queue_order_and_loops(frames_dir):
    from stereo_to_multiview_tpu import native
    from stereo_to_multiview_tpu.models.stream import native_source
    if not native.available():
        pytest.skip("no native toolchain")
    src = native_source(frames_dir, loops=2, depth=2, threads=3)
    frames = list(src)
    assert len(frames) == 8
    # in-order delivery across loops, even with 3 decode threads
    ref = [read_bmp(os.path.join(frames_dir, f"frame_{i:03d}.bmp"))
           for i in range(4)]
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f, ref[i % 4])


def test_frame_source_pair_mode_nonoverlapping(tmp_path):
    """Pair mode takes sorted files two at a time -- (f0,f1), (f2,f3) --
    never overlapping pairs; a trailing unpaired file is dropped and a
    shape-mismatched pair is skipped."""
    from stereo_to_multiview_tpu.models.stream import FrameSource
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (16, 20, 3), dtype=np.uint8)
            for _ in range(4)]
    for i, img in enumerate(imgs):
        write_bmp(str(tmp_path / f"a_{i + 1}.bmp"), img)
    write_bmp(str(tmp_path / "a_5.bmp"),
              rng.integers(0, 256, (16, 20, 3), dtype=np.uint8))  # unpaired
    src = FrameSource(str(tmp_path), pair_mode=True, loop=False)
    frames = list(src)
    assert len(frames) == 2  # (a_1,a_2), (a_3,a_4); a_5 has no partner
    np.testing.assert_array_equal(frames[0],
                                  np.concatenate([imgs[0], imgs[1]], axis=1))
    np.testing.assert_array_equal(frames[1],
                                  np.concatenate([imgs[2], imgs[3]], axis=1))

    # shape-mismatched pair: skipped, the following pair still decodes
    write_bmp(str(tmp_path / "a_0.bmp"),
              rng.integers(0, 256, (18, 20, 3), dtype=np.uint8))
    src = FrameSource(str(tmp_path), pair_mode=True, loop=False)
    frames = list(src)   # pairs now (a_0,a_1) bad, (a_2,a_3), (a_4,a_5)
    assert len(frames) == 2


def test_stream_driver(frames_dir):
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.stream import FrameSource, stream
    cfg = PipelineConfig(num_rows=24, num_cols=32, num_rows_out=24,
                         num_cols_out=32, num_disp=4, zero_disp=2,
                         usd=4, lsd=2, num_views=2, irv_iterations=1,
                         bilateral_radius=2, feather_radius=2)
    src = FrameSource(frames_dir, loop=False)
    seen = []
    stats = stream(src, cfg, on_frame=lambda i, dl, dr, il: seen.append(i),
                   verbose=False)
    assert seen == [0, 1, 2, 3]
    assert stats["frames"] >= 1


def test_stream_driver_meter_excludes_consumer(frames_dir):
    """At depth 1 the meter times exactly the upload+compute+fetch span,
    so a slow on_frame consumer (PNG dumps, a paused preview) must not
    inflate fps/ms_max stats (ADVICE r4; stream.py _finish)."""
    import time
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.stream import FrameSource, stream
    cfg = PipelineConfig(num_rows=24, num_cols=32, num_rows_out=24,
                         num_cols_out=32, num_disp=4, zero_disp=2,
                         usd=4, lsd=2, num_views=2, irv_iterations=1,
                         bilateral_radius=2, feather_radius=2)
    stats = stream(FrameSource(frames_dir, loop=False), cfg,
                   on_frame=lambda i, dl, dr, il: time.sleep(0.25),
                   verbose=False, depth=1)
    assert stats["frames"] >= 1
    # steady-state samples are post-compile; the tiny frame computes in
    # a few ms, so any consumer bleed-through would show as >=250 ms
    assert stats["ms_max"] < 200.0


def test_stream_driver_pipelined(frames_dir):
    """depth >= 2 (frames in flight) delivers every frame, in order,
    with outputs identical to the serial loop."""
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.stream import FrameSource, stream
    cfg = PipelineConfig(num_rows=24, num_cols=32, num_rows_out=24,
                         num_cols_out=32, num_disp=4, zero_disp=2,
                         usd=4, lsd=2, num_views=2, irv_iterations=1,
                         bilateral_radius=2, feather_radius=2)
    got = {}
    for d in (1, 3):
        seen, ils = [], []
        stream(FrameSource(frames_dir, loop=False), cfg,
               on_frame=lambda i, dl, dr, il: (seen.append(i),
                                               ils.append(np.asarray(il))),
               verbose=False, depth=d)
        assert seen == [0, 1, 2, 3]
        got[d] = ils
    for a, b in zip(got[1], got[3]):
        np.testing.assert_array_equal(a, b)


def test_dump_writer(tmp_path):
    from stereo_to_multiview_tpu.utils.dump import (
        DumpWriter, dump_pipeline_intermediates)
    from stereo_to_multiview_tpu.config import PipelineConfig
    rng = np.random.default_rng(11)
    l = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    r = np.roll(l, -2, axis=1)
    cfg = PipelineConfig(num_rows=24, num_cols=32, num_rows_out=24,
                         num_cols_out=32, num_disp=4, zero_disp=2,
                         usd=4, lsd=2, num_views=3, irv_iterations=1,
                         bilateral_radius=2, feather_radius=2)
    w = DumpWriter(str(tmp_path), png=True, npy=True)
    outs = dump_pipeline_intermediates(w, l, r, cfg)
    names = os.listdir(str(tmp_path))
    for expected in ("00_left.png", "06_disp_l.png", "09_interlaced.png",
                     "08_view_0.png", "08_view_2.png", "06_disp_l.npy"):
        assert expected in names, f"missing {expected}"
    assert outs["interlaced"].shape == (24, 32, 3)


def test_y4m_native_matches_python(tmp_path):
    """Native C++ Y4M reader and the NumPy fallback decode bit-identical
    BGR; the roundtrip through C444 (lossless chroma) stays within the
    BT.601 integer conversion's error."""
    from stereo_to_multiview_tpu.utils.y4m import (write_y4m, Y4MReader)
    from stereo_to_multiview_tpu import native as _native
    rng = np.random.default_rng(21)
    # 25-wide frames: odd width exercises the C422 cw=(w+1)/2 frame
    # sizing (a former native-reader bug desynced the stream there)
    for shape in ((16, 24, 3), (16, 25, 3)):
        frames = [rng.integers(0, 256, shape, dtype=np.uint8)
                  for _ in range(3)]
        for cs in ("C444", "C422", "C420jpeg"):
            path = str(tmp_path / f"clip_{cs}_{shape[1]}.y4m")
            write_y4m(path, frames, colorspace=cs)
            py = list(Y4MReader(path))
            assert len(py) == 3
            if _native.available():
                nat = list(_native.NativeY4M(path))
                assert len(nat) == 3
                for a, b in zip(py, nat):
                    np.testing.assert_array_equal(a, b)
    frames = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
              for _ in range(3)]
    path = str(tmp_path / "clip_C444.y4m")
    write_y4m(path, frames, colorspace="C444")
    # C444 roundtrip: limited-range quantization costs a few levels
    path = str(tmp_path / "clip_C444.y4m")
    dec = list(Y4MReader(path))
    for orig, back in zip(frames, dec):
        assert np.abs(orig.astype(int) - back.astype(int)).max() <= 4


def test_y4m_stream_through_pipeline(tmp_path):
    """Y4M video -> Y4MSource -> full pipeline: the real-video ingestion
    path of the reference (video_io.cpp:77,148), including looping."""
    from stereo_to_multiview_tpu.utils.y4m import write_y4m
    from stereo_to_multiview_tpu.models.stream import Y4MSource, stream
    from stereo_to_multiview_tpu.config import PipelineConfig
    rng = np.random.default_rng(22)
    # SBS frames: left|right with a small true shift
    base = rng.integers(0, 256, (24, 36, 3), dtype=np.uint8)
    sbs_frames = []
    for t in range(3):
        l = np.roll(base, t, axis=1)[:, :32]
        r = np.roll(base, t + 2, axis=1)[:, :32]
        sbs_frames.append(np.concatenate([l, r], axis=1))
    path = str(tmp_path / "clip.y4m")
    write_y4m(path, sbs_frames, colorspace="C444")

    src = Y4MSource(path, loop=True, max_frames=5)   # loops past EOF
    cfg = PipelineConfig(num_rows=24, num_cols=32, num_rows_out=24,
                         num_cols_out=32, num_disp=4, zero_disp=2,
                         usd=4, lsd=2, num_views=2, irv_iterations=1,
                         bilateral_radius=2, feather_radius=2)
    seen = []
    stream(src, cfg, on_frame=lambda i, dl, dr, il: seen.append(i),
           verbose=False)
    assert seen == [0, 1, 2, 3, 4]


def test_ffmpeg_pipe_source(tmp_path):
    """FFmpegSource: any-container ingestion through a yuv4mpegpipe
    subprocess into the Y4M parser (video_io.cpp:77 analog).  The
    producer here is a stub command streaming a generated clip (the
    real ffmpeg binary emits the identical format), exercising the pipe
    plumbing, EOF-loop respawn, and max_frames."""
    import sys
    import numpy as np
    from stereo_to_multiview_tpu.utils.y4m import write_y4m, Y4MReader
    from stereo_to_multiview_tpu.models.stream import FFmpegSource

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (32, 64, 3), dtype=np.uint8)
              for _ in range(3)]
    clip = str(tmp_path / "clip.y4m")
    write_y4m(clip, frames, colorspace="C420")

    class StubSource(FFmpegSource):
        def _command(self):
            return [sys.executable, "-c",
                    "import sys, shutil; "
                    "shutil.copyfileobj(open(sys.argv[1], 'rb'), "
                    "sys.stdout.buffer)", self.path]

    src = StubSource(clip, loop=True, max_frames=7, ffmpeg=sys.executable)
    got = list(src)
    assert len(got) == 7                      # EOF respawn looped 3+3+1
    ref = list(Y4MReader(clip))               # same decode path
    for i, fr in enumerate(got):
        np.testing.assert_array_equal(fr, ref[i % 3])
    assert src.h == 32 and src.w == 64

    # re-iterable: a second __iter__ after the child was reaped must
    # respawn the producer, not fail on the dead pipe (ADVICE r4)
    src2 = StubSource(clip, loop=False, ffmpeg=sys.executable)
    assert len(list(src2)) == 3
    assert len(list(src2)) == 3

    # missing binary -> clear error
    import pytest
    with pytest.raises(FileNotFoundError):
        FFmpegSource(clip, ffmpeg="definitely-not-ffmpeg-xyz")


def test_preview_server():
    """Live-preview HTTP server (the HighGUI display-loop analog):
    publishes frames, serves PNG snapshots and the index page, and the
    pause/resume endpoints toggle the driver-pollable flag."""
    import urllib.request
    import numpy as np
    from stereo_to_multiview_tpu.utils.preview import PreviewServer
    from stereo_to_multiview_tpu.utils.imageio import png_bytes

    pv = PreviewServer(port=0, host="127.0.0.1")
    try:
        img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        pv.update(interlaced=img, skipped=None)
        base = f"http://127.0.0.1:{pv.port}"
        got = urllib.request.urlopen(f"{base}/frame/interlaced").read()
        assert got == png_bytes(img, level=1)
        page = urllib.request.urlopen(base).read().decode()
        assert "interlaced" in page and "frame 1" in page
        urllib.request.urlopen(f"{base}/pause").read()
        assert pv.paused
        urllib.request.urlopen(f"{base}/resume").read()
        assert not pv.paused
        import urllib.error
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/frame/nope")
    finally:
        pv.close()
