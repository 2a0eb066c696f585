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


def test_disp_sharded_wta_exact():
    """Disparity-plane sharding (BASELINE config 3): D-sharded cost init +
    aggregation + argmin-with-index all-reduce is bit-identical to the
    unsharded XLA core, including first-min tie breaking."""
    import jax
    import jax.numpy as jnp
    from stereo_to_multiview_tpu import ops
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.parallel import (make_mesh,
                                                  disp_sharded_disparities)
    rng = np.random.default_rng(17)
    h, w, nd, zd = 48, 64, 8, 4
    base = rng.integers(0, 256, (h, w + 6, 3)).astype(np.float32)
    k = np.ones(3) / 3.0
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    left = base[:, :w].astype(np.uint8)
    right = base[:, 3:3 + w].astype(np.uint8)

    cfg = PipelineConfig(num_rows=h, num_cols=w, num_rows_out=h,
                         num_cols_out=w, num_disp=nd, zero_disp=zd,
                         usd=6, lsd=3, engine="xla")
    l, r = jnp.asarray(left), jnp.asarray(right)
    arms_l = ops.cross_arms(l, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
    arms_r = ops.cross_arms(r, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
    cost_l, cost_r = ops.ci_adcensus(l, r, cfg.ad_coeff, cfg.census_coeff,
                                     nd, zd)
    ref_l = ops.dc_wta(ops.cross_aggregate(cost_l, arms_l, max_arm=cfg.usd),
                       zd)
    ref_r = ops.dc_wta(ops.cross_aggregate(cost_r, arms_r, max_arm=cfg.usd),
                       zd)

    mesh = make_mesh((4,), ("disp",), jax.devices()[:4])
    out_l, out_r = disp_sharded_disparities(mesh, cfg)(l, r)
    np.testing.assert_array_equal(np.asarray(ref_l), np.asarray(out_l))
    np.testing.assert_array_equal(np.asarray(ref_r), np.asarray(out_r))


def test_disp_sharded_band_core_exact():
    """D-sharded quantized band aggregation (each shard runs
    band_aggregate_q on its D-slice; the all-reduce consumes exact
    integer minima) is bit-identical to the unsharded band stereo core
    (VERDICT r2 item 7)."""
    import jax
    import jax.numpy as jnp
    from stereo_to_multiview_tpu import ops
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.ops.band import band_stereo_core_chunked
    from stereo_to_multiview_tpu.parallel import (make_mesh,
                                                  disp_sharded_disparities)
    rng = np.random.default_rng(23)
    h, w, nd, zd = 48, 64, 8, 4
    base = rng.integers(0, 256, (h, w + 6, 3)).astype(np.float32)
    k = np.ones(3) / 3.0
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    left = base[:, :w].astype(np.uint8)
    right = base[:, 3:3 + w].astype(np.uint8)

    cfg = PipelineConfig(num_rows=h, num_cols=w, num_rows_out=h,
                         num_cols_out=w, num_disp=nd, zero_disp=zd,
                         usd=6, lsd=3, engine="band")
    l, r = jnp.asarray(left), jnp.asarray(right)
    arms_l = ops.cross_arms(l, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
    arms_r = ops.cross_arms(r, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
    ref_l, ref_r = band_stereo_core_chunked(l, r, arms_l, arms_r, cfg,
                                            interpret=True)

    mesh = make_mesh((4,), ("disp",), jax.devices()[:4])
    out_l, out_r = disp_sharded_disparities(mesh, cfg)(l, r)
    np.testing.assert_array_equal(np.asarray(ref_l), np.asarray(out_l))
    np.testing.assert_array_equal(np.asarray(ref_r), np.asarray(out_r))


def test_disp_sharded_process_frame_matches_single():
    """Full D-sharded pipeline vs the single-device XLA pipeline."""
    import jax
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.pipeline import process_frame
    from stereo_to_multiview_tpu.parallel import (make_mesh,
                                                  disp_sharded_process_frame)
    rng = np.random.default_rng(19)
    h, w = 48, 64
    base = rng.integers(0, 256, (h, w + 6, 3)).astype(np.float32)
    k = np.ones(3) / 3.0
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    left = base[:, :w].astype(np.uint8)
    right = base[:, 3:3 + w].astype(np.uint8)
    sbs = np.concatenate([left, right], axis=1)

    cfg = PipelineConfig(num_rows=h, num_cols=w, num_rows_out=h,
                         num_cols_out=w, num_disp=8, zero_disp=4,
                         usd=6, lsd=3, irv_iterations=1, num_views=4,
                         bilateral_radius=2, feather_radius=3, engine="xla")
    ref = list(map(np.asarray, process_frame(sbs, cfg)))
    mesh = make_mesh((4,), ("disp",), jax.devices()[:4])
    out = list(map(np.asarray, disp_sharded_process_frame(mesh, cfg)(sbs)))
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(a, b)
