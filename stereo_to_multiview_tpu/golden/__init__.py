"""NumPy golden transcriptions of the reference kernel semantics.

Each function is a direct, readable restatement of what the corresponding
CUDA kernel in /root/reference computes (file:line cited per function),
including its quirks: truncating uint8 casts, half-open aggregation
intervals, the lifting-max Gaussian, the 65-bin IRV vote with the
(max_d + zero_disp)/reliable ratio, clamp-to-edge conventions, etc.

These are the *spec* the JAX ops layer is unit-tested against.  They are
deliberately simple (loops over small test images are fine), never used on
the hot path.
"""

from stereo_to_multiview_tpu.golden.stages import *  # noqa: F401,F403
