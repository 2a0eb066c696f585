"""Multi-host execution (SURVEY.md sections 2.5 / 5 'distributed
communication backend' -- absent in the single-GPU reference; built here
the JAX way).

Two complementary strategies:

1. **Frame pipelining (DCN-free steady state)** -- autostereo streaming
   is embarrassingly parallel across frames: host k processes frames
   k, k+P, k+2P, ...  No inter-host communication at all; aggregate
   throughput scales linearly as long as the source keeps up.  This is
   the production layout for multi-stream/many-channel serving.
   `frame_shard` slices any frame iterator accordingly.

2. **Single-frame scale-out (ICI + DCN)** -- one frame's rows sharded
   over every chip of every host via the global mesh: build the mesh
   with `global_row_mesh()` and hand it to parallel.halo.
   halo_process_frame's ppermute ring then crosses hosts only at the two
   shard-boundary exchanges per stage (DCN), everything else rides ICI.
   Right for latency-bound single-stream 4K/8K work.

Process bring-up is standard JAX distributed: every process calls
`init()` with the same coordinator before touching the backend.
"""

from __future__ import annotations

import itertools
from typing import Iterable, Iterator, Optional

import jax
from jax.sharding import Mesh

from stereo_to_multiview_tpu.parallel.mesh import make_mesh


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper.  With no arguments, relies on
    the environment (TPU pod metadata / JAX_COORDINATOR_ADDRESS etc.),
    which is the normal path on Cloud TPU slices."""
    kw = {}
    if coordinator_address is not None:
        kw.update(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def global_row_mesh(view_devices: int = 1) -> Mesh:
    """1-D or 2-D mesh over *all* processes' devices for the halo path.
    Devices enumerate local-major, so neighboring row shards stay on the
    same host wherever possible and only the inter-host seams cross DCN.
    """
    devs = jax.devices()
    if view_devices > 1:
        if len(devs) % view_devices:
            raise ValueError("device count not divisible by view_devices")
        return make_mesh((len(devs) // view_devices, view_devices),
                         ("row", "view"), devs)
    return make_mesh((len(devs),), ("row",), devs)


def frame_shard(frames: Iterable, process_id: Optional[int] = None,
                num_processes: Optional[int] = None) -> Iterator:
    """Round-robin frame assignment for strategy 1: yields this process's
    subsequence (frames process_id, process_id+P, ...)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return itertools.islice(frames, pid, None, n)
