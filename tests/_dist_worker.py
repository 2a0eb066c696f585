"""Worker process for the two-process distributed integration test.

Usage: python tests/_dist_worker.py <coordinator> <num_procs> <pid> <out.npz>

Each process brings up jax.distributed against the shared coordinator
with 4 virtual CPU devices, builds the GLOBAL row mesh over all 8
devices, runs halo_process_frame on a deterministic frame, and saves its
addressable row shards (with their global row offsets).  The test
reassembles both processes' shards and compares against the
single-process reference -- the only configuration where the DCN-seam
device ordering of parallel.distributed actually executes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def frame(cfg):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (cfg.num_rows, cfg.num_cols + 4, 3)
                        ).astype(np.float32)
    k = np.ones(3) / 3.0
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    left = base[:, :cfg.num_cols].astype(np.uint8)
    right = base[:, 2:2 + cfg.num_cols].astype(np.uint8)
    return np.concatenate([left, right], axis=1)


def main():
    coord, n, pid, out_path = (sys.argv[1], int(sys.argv[2]),
                               int(sys.argv[3]), sys.argv[4])
    # initialize BEFORE any package import can touch the backend
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n, process_id=pid)
    from stereo_to_multiview_tpu.parallel import distributed as D
    assert jax.process_count() == n
    assert len(jax.devices()) == 4 * n

    from stereo_to_multiview_tpu.config import PipelineConfig
    from stereo_to_multiview_tpu.parallel.halo import halo_process_frame
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = D.global_row_mesh()
    rows = 16 * len(jax.devices())
    cfg = PipelineConfig(num_rows=rows, num_cols=64, num_rows_out=rows,
                         num_cols_out=64, num_disp=8, zero_disp=4,
                         usd=5, lsd=2, num_views=4, irv_iterations=1,
                         bilateral_radius=2, feather_radius=2,
                         engine="xla", xla_agg_qscale=8.0)
    sbs = frame(cfg)

    sharding = NamedSharding(mesh, P("row", None, None))
    sbs_g = jax.make_array_from_callback(sbs.shape, sharding,
                                         lambda idx: sbs[idx])
    fn = halo_process_frame(mesh, cfg)
    out = jax.block_until_ready(fn(sbs_g))

    payload = {}
    for name, arr in zip(("disp_l", "disp_r", "interlaced"), out):
        for j, shard in enumerate(arr.addressable_shards):
            row0 = shard.index[0].start or 0
            payload[f"{name}_{j}_r{row0}"] = np.asarray(shard.data)
    np.savez(out_path, **payload)
    print(f"worker {pid} ok: {len(payload)} shards")


if __name__ == "__main__":
    main()
