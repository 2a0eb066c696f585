"""Test harness config: force the CPU backend with 8 virtual devices so
sharding/halo logic is testable without a pod (SURVEY.md section 4).

Must run before any JAX backend initialization.  The environment's
sitecustomize pins jax_platforms to the TPU plugin, so we override via
jax.config (env vars alone are ignored).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def _textured(rng, h, w, max_shift=6):
    """Stereo-ish pair: smooth random texture with a horizontally shifted
    center block, so disparity stages have real structure to chew on."""
    base = rng.integers(0, 256, (h + 8, w + 8, 3)).astype(np.float32)
    k = np.ones((5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view
    sm = sliding_window_view(base, (5, 5), axis=(0, 1)).mean(axis=(-1, -2))
    img = sm[:h, :w].astype(np.uint8)
    right = np.roll(img, -max_shift // 2, axis=1)
    return img, right


@pytest.fixture(scope="session")
def stereo_pair(rng):
    return _textured(rng, 36, 52)
