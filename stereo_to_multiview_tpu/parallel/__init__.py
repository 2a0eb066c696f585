from stereo_to_multiview_tpu.parallel.mesh import (
    make_mesh, row_sharding, replicated)
from stereo_to_multiview_tpu.parallel.sharded import (
    sharded_process_frame, sharded_compute_disparities)
from stereo_to_multiview_tpu.parallel.halo import (
    halo_exchange, halo_process_frame)
from stereo_to_multiview_tpu.parallel.dispshard import (
    disp_sharded_disparities, disp_sharded_process_frame)
from stereo_to_multiview_tpu.parallel import distributed

__all__ = [
    "make_mesh", "row_sharding", "replicated",
    "sharded_process_frame", "sharded_compute_disparities",
    "halo_exchange", "halo_process_frame",
    "disp_sharded_disparities", "disp_sharded_process_frame",
    "distributed",
]
