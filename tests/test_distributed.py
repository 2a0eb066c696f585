"""Multi-host helpers (single-process-testable parts)."""

import numpy as np

from stereo_to_multiview_tpu.parallel import distributed


def test_frame_shard_round_robin():
    frames = list(range(10))
    assert list(distributed.frame_shard(frames, 0, 3)) == [0, 3, 6, 9]
    assert list(distributed.frame_shard(frames, 1, 3)) == [1, 4, 7]
    assert list(distributed.frame_shard(frames, 2, 3)) == [2, 5, 8]
    # defaults resolve to the current (single) process
    assert list(distributed.frame_shard(frames)) == frames


def test_global_row_mesh_shapes():
    m = distributed.global_row_mesh()
    assert m.axis_names == ("row",)
    m2 = distributed.global_row_mesh(view_devices=2)
    assert m2.axis_names == ("row", "view")
    assert m2.shape["view"] == 2
