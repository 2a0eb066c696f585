"""Sharded whole-frame pipelines (single-host multi-chip and multi-host).

Strategy A (this module): pjit with NamedSharding -- annotate the SBS input
as row-sharded and the outputs as row-sharded, and let XLA insert the ICI
collectives for every cross-row dependency (stencil halos, transposed
gathers).  This is the canonical "pick a mesh, annotate, let XLA do the
rest" recipe and is exact w.r.t. the single-chip graph.

Strategy B (parallel.halo, used by the Pallas paths): explicit shard_map +
ppermute halo exchange for stencil stages, which bounds communication to
the true halo widths instead of trusting the partitioner.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_to_multiview_tpu.config import PipelineConfig
from stereo_to_multiview_tpu.models.pipeline import (
    process_frame as _process_frame,
    compute_disparities as _compute_disparities)


def sharded_process_frame(mesh: Mesh, cfg: PipelineConfig,
                          row_axis: str = "row"):
    """Jitted SBS -> (disp_l, disp_r, interlaced) with H row-sharded over
    the mesh.  Output disparities/interlaced stay row-sharded (the caller
    gathers only if it needs the full frame on one host)."""
    in_s = NamedSharding(mesh, P(row_axis, None, None))
    out_disp = NamedSharding(mesh, P(row_axis, None))
    out_img = NamedSharding(mesh, P(row_axis, None, None))

    # The partitioner needs a plain-HLO graph; Pallas band kernels don't
    # auto-shard (a shard_map band path is the planned upgrade).
    cfg = cfg.replace(engine="xla")
    fn = functools.partial(_process_frame, cfg=cfg)
    return jax.jit(fn, in_shardings=(in_s,),
                   out_shardings=(out_disp, out_disp, out_img))


def sharded_compute_disparities(mesh: Mesh, cfg: PipelineConfig,
                                row_axis: str = "row"):
    """Row-sharded stereo-matching half (images -> disparities)."""
    in_s = NamedSharding(mesh, P(row_axis, None, None))
    out_disp = NamedSharding(mesh, P(row_axis, None))
    out_u8 = NamedSharding(mesh, P(row_axis, None))

    cfg = cfg.replace(engine="xla")

    def fn(img_l, img_r):
        return _compute_disparities(img_l, img_r, cfg)

    return jax.jit(fn, in_shardings=(in_s, in_s),
                   out_shardings=(out_disp, out_disp, out_u8, out_u8))
