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


def test_frame_source_pair_mode_skips_mismatched(tmp_path):
    from stereo_to_multiview_tpu.models.stream import FrameSource
    rng = np.random.default_rng(5)
    write_bmp(str(tmp_path / "a_1.bmp"),
              rng.integers(0, 256, (16, 20, 3), dtype=np.uint8))
    write_bmp(str(tmp_path / "a_2.bmp"),
              rng.integers(0, 256, (16, 20, 3), dtype=np.uint8))
    write_bmp(str(tmp_path / "a_3.bmp"),
              rng.integers(0, 256, (18, 20, 3), dtype=np.uint8))  # mismatched
    src = FrameSource(str(tmp_path), pair_mode=True, loop=False)
    frames = list(src)
    assert len(frames) == 1  # (a_1,a_2) ok; (a_2,a_3) skipped
    assert frames[0].shape == (16, 40, 3)


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
