"""Device meshes and shardings.

The reference is single-GPU with zero inter-device communication (SURVEY.md
section 2.5).  The TPU build scales along the axes its loops expose:

  row    -- H-tile data parallelism.  Stencil stages need halos (census 3,
            cross arms usd, bilateral radius, feather radius); row-sharding
            keeps cost initialization halo-free because every disparity
            lookup stays within the row (d_ci_ad.cu:133-144 only offsets x).
  disp   -- disparity-plane parallelism for cost init + aggregation; WTA is
            an argmin reduction over this axis.
  view   -- DIBR fan-out: each chip synthesizes a subset of the V views.
  frame  -- streaming batch parallelism across frames/hosts.

Collectives ride ICI via XLA (pjit/NamedSharding) or explicitly via
shard_map + ppermute halo exchange (parallel.halo).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("row",),
              devices=None) -> Mesh:
    """Create a mesh over the available devices.

    Default: 1-D 'row' mesh over all devices.  Pass shape=(r, d) with
    axis_names=('row', 'disp') etc. for 2-D layouts.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def row_sharding(mesh: Mesh, ndim: int, row_axis_pos: int = 0,
                 axis: str = "row") -> NamedSharding:
    """Shard dimension `row_axis_pos` of an ndim-array over `axis`."""
    spec = [None] * ndim
    spec[row_axis_pos] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
