"""TPU-native stereo -> autostereoscopic multiview engine.

A ground-up JAX/XLA/Pallas re-design of the capability surface of the CUDA
reference `moddyz/stereo-to-multiview-cuda` (see SURVEY.md): side-by-side
stereo in, AD-Census disparity + N-view lenticular-interlaced frame out.

Layers (TPU-first, not a port):
  config    -- one frozen PipelineConfig holding every knob the reference
               scatters across argv and hard-coded literals.
  ops       -- one jittable function per pipeline stage, dense-array data
               model ((D, H, W) cost volumes instead of pointer tables).
  pallas    -- hand-tiled TPU kernels for the hot stages, each validated
               against its jnp twin.
  models    -- fused whole-frame graphs (process_frame == adcensus_stm,
               process_frame_lowres == adcensus_stm_2) and stream drivers.
  parallel  -- jax.sharding meshes: disparity-plane, row-tile (halo exchange
               over ICI via shard_map+ppermute) and view-axis fan-out.
  golden    -- NumPy transcriptions of the reference kernel semantics; the
               fidelity spec the ops layer is tested against.
  utils     -- BMP/PNG IO (no OpenCV), timing, intermediate-dump debug API.
"""

from stereo_to_multiview_tpu.config import PipelineConfig

__version__ = "0.1.0"
__all__ = ["PipelineConfig", "__version__"]
