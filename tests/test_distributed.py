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


def test_disp_sharded_hslo_matches_single():
    """use_hslo under disparity sharding: the D->row all_to_all reshard
    runs the full-D scanline DP on each device's row slab -- must equal
    the single-device engine bit for bit (both engines)."""
    import jax
    import numpy as np
    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.models.pipeline import compute_disparities
    from stereo_to_multiview_tpu.parallel import make_mesh
    from stereo_to_multiview_tpu.parallel.dispshard import (
        disp_sharded_disparities)

    rng = np.random.default_rng(31)
    h, w = 32, 48
    base = rng.integers(0, 256, (h, w + 6, 3)).astype(np.float32)
    k = np.ones(3) / 3.0
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    left = base[:, :w].astype(np.uint8)
    right = base[:, 3:3 + w].astype(np.uint8)

    from stereo_to_multiview_tpu import ops
    import jax.numpy as jnp

    mesh = make_mesh((4,), ("disp",), jax.devices()[:4])
    for engine in ("band", "xla"):
        cfg = PipelineConfig(num_rows=h, num_cols=w, num_rows_out=h,
                             num_cols_out=w, num_disp=8, zero_disp=4,
                             usd=5, lsd=2, num_views=4, engine=engine,
                             use_hslo=True)
        if engine == "band":
            from stereo_to_multiview_tpu.ops.band import (
                band_stereo_core_chunked)
            from stereo_to_multiview_tpu.ops.postkern import (
                cross_arms_kern_lr)

            @jax.jit
            def ref_fn(a, b, cfg=cfg):
                al = ops.cross_arms(a, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
                ar = ops.cross_arms(b, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
                return band_stereo_core_chunked(a, b, al, ar, cfg, True)
        else:
            @jax.jit
            def ref_fn(a, b, cfg=cfg):
                al = ops.cross_arms(a, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
                ar = ops.cross_arms(b, cfg.ucd, cfg.lcd, cfg.usd, cfg.lsd)
                cl, cr = ops.ci_adcensus(a, b, cfg.ad_coeff,
                                         cfg.census_coeff, cfg.num_disp,
                                         cfg.zero_disp)
                acl = ops.cross_aggregate(cl, al, max_arm=cfg.usd)
                acr = ops.cross_aggregate(cr, ar, max_arm=cfg.usd)
                gl, gr = ops.mux_average(a), ops.mux_average(b)
                acl = ops.dc_hslo(acl, gl, gr, cfg.num_disp, cfg.zero_disp,
                                  cfg.hslo_T, cfg.hslo_H1, cfg.hslo_H2, +1)
                acr = ops.dc_hslo(acr, gl, gr, cfg.num_disp, cfg.zero_disp,
                                  cfg.hslo_T, cfg.hslo_H1, cfg.hslo_H2, -1)
                return (ops.dc_wta(acl, cfg.zero_disp),
                        ops.dc_wta(acr, cfg.zero_disp))
        ref_l, ref_r = ref_fn(left, right)
        out_l, out_r = disp_sharded_disparities(mesh, cfg)(left, right)
        np.testing.assert_array_equal(np.asarray(ref_l), np.asarray(out_l),
                                      err_msg=engine)
        np.testing.assert_array_equal(np.asarray(ref_r), np.asarray(out_r),
                                      err_msg=engine)


def test_two_process_halo_matches_single():
    """TWO real processes (subprocess + jax.distributed.initialize, 4
    virtual CPU devices each) build parallel.distributed.global_row_mesh
    over all 8 devices and run halo_process_frame -- the DCN-seam device
    ordering's only real execution path.  Every process's addressable
    row shards must equal the single-process reference bit for bit
    (integer-quantized XLA engine)."""
    import os
    import socket
    import subprocess
    import sys
    import tempfile

    import numpy as np

    # free port for the coordinator
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"localhost:{port}"

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "_dist_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # worker sets its own device count

    outs, procs = [], []
    with tempfile.TemporaryDirectory() as td:
        for pid in range(2):
            out = os.path.join(td, f"w{pid}.npz")
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, worker, coord, "2", str(pid), out],
                env=env, cwd=os.path.dirname(here),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        logs = [p.communicate(timeout=900)[0].decode() for p in procs]
        for p, log in zip(procs, logs):
            assert p.returncode == 0, log[-2000:]

        # single-process reference (8 virtual devices in THIS process)
        import jax
        from stereo_to_multiview_tpu.config import PipelineConfig
        from stereo_to_multiview_tpu.models.pipeline import process_frame
        from tests._dist_worker import frame

        rows = 16 * 8
        cfg = PipelineConfig(num_rows=rows, num_cols=64, num_rows_out=rows,
                             num_cols_out=64, num_disp=8, zero_disp=4,
                             usd=5, lsd=2, num_views=4, irv_iterations=1,
                             bilateral_radius=2, feather_radius=2,
                             engine="xla", xla_agg_qscale=8.0)
        ref = {k: np.asarray(v) for k, v in zip(
            ("disp_l", "disp_r", "interlaced"),
            process_frame(frame(cfg), cfg))}

        n_shards = 0
        for out in outs:
            data = np.load(out)
            for key in data.files:
                name, _, rtag = key.rsplit("_", 2)
                row0 = int(rtag[1:])
                shard = data[key]
                np.testing.assert_array_equal(
                    shard, ref[name][row0:row0 + shard.shape[0]],
                    err_msg=key)
                n_shards += 1
        assert n_shards == 2 * 4 * 3     # 2 procs x 4 devices x 3 outputs
