#!/usr/bin/env python
"""Bad-pixel-vs-qscale sweep for the cost quantization (VERDICT r4 item 5).

The band engine's single lossy step is the initial cost quantization
q = rint(cost * qscale) (ops/band.py quantize_cost, default 127).  This
sweep runs the REAL band engine (cfg.band_qscale, CPU interpret mode)
at each qscale on the bud and fish fixtures and measures disparities
against the f32 reference-parity XLA run.  frac(|d_diff| > 1) is the
north-star bad-pixel metric.  (The XLA engine's own xla_agg_qscale
cannot host this sweep: its exact-cumsum prefix bound rejects any
qscale at the fixtures' full geometry.)

  JAX_PLATFORMS=cpu python scripts/qscale_sweep.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp  # noqa: E402

from stereo_to_multiview_tpu.config import BUD, FISH  # noqa: E402
from stereo_to_multiview_tpu.models.pipeline import (  # noqa: E402
    compute_disparities)
from stereo_to_multiview_tpu.utils import read_bmp  # noqa: E402

PAIRS = (("bud", "tests/data/bud_2.bmp", "tests/data/bud_3.bmp", BUD),
         ("fish", "tests/data/fish_1.bmp", "tests/data/fish_2.bmp", FISH))
QSCALES = (32.0, 64.0, 127.0, 255.0, 510.0, 1020.0, 2040.0)


def disp(cfg, l, r):
    @jax.jit
    def run(l, r):
        dl, dr, _, _ = compute_disparities(l, r, cfg)
        return dl, dr
    return tuple(np.asarray(x) for x in run(l, r))


def main():
    for name, lp, rp, base in PAIRS:
        l = jnp.asarray(read_bmp(lp))
        r = jnp.asarray(read_bmp(rp))
        cfg0 = base.replace(engine="xla", xla_agg_qscale=0.0)
        ref_l, ref_r = disp(cfg0, l, r)
        print(f"[{name}] band-engine qscale sweep, frac(|d|>1) vs f32 "
              f"golden (disp_l / disp_r):")
        for q in QSCALES:
            cfg = base.replace(engine="band", band_qscale=q)
            try:
                dl, dr = disp(cfg, l, r)
            except ValueError as e:
                print(f"  q={q:7.0f}: rejected ({e})")
                continue
            fl = float(np.mean(np.abs(dl - ref_l) > 1.0))
            fr = float(np.mean(np.abs(dr - ref_r) > 1.0))
            print(f"  q={q:7.0f}: {fl:.4f} / {fr:.4f}", flush=True)
        # the real fidelity lever: 3 digit planes raise the per-pass
        # precision bound from 2^15 to (2^24-1)/wmax (the qscale sweep
        # above is flat because the rescale shifts grow with qscale)
        for q in (127.0, 510.0, 2040.0):
            cfg = base.replace(engine="band", band_qscale=q,
                               band_digits=3)
            dl, dr = disp(cfg, l, r)
            fl = float(np.mean(np.abs(dl - ref_l) > 1.0))
            fr = float(np.mean(np.abs(dr - ref_r) > 1.0))
            print(f"  q={q:7.0f} digits=3: {fl:.4f} / {fr:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
