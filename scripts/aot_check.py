#!/usr/bin/env python
"""Chipless AOT compile-check of the shipping graphs against a v5e
topology -- validates every Mosaic kernel (layouts, scoped VMEM, op
support) WITHOUT the TPU relay, in minutes instead of a round-trip per
failure.  Catches exactly the class of error the relay would surface at
measurement time (memory: three such bugs found this way in round 3).

  JAX_PLATFORMS=cpu python scripts/aot_check.py fish|hd|4k|bench [...]

Each phase traces the full process_frame graph at that config and
compiles it via jax.experimental.topologies (TpuAotCompiler, no chip).
Compile times observed: fish ~40 s, 1080p ~200 s, 4K ~970 s.
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

# The environment's sitecustomize pins jax_platforms to the TPU relay
# plugin (env vars are ignored); the config update MUST precede any
# backend use or the first array op hangs on a wedged relay.
jax.config.update("jax_platforms", "cpu")
# AOT compiles write the persistent cache too: repeated checks of an
# unchanged graph load in seconds.
jax.config.update("jax_compilation_cache_dir", ".jax_cache")


def _topology():
    import jax
    from jax.experimental.topologies import get_topology_desc
    tp = get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
    return jax, tp


def check_fn(fn, args, name):
    """AOT-compile fn(*args) for one v5e chip; print ok/fail + stats."""
    import jax
    from jax.sharding import SingleDeviceSharding
    _, tp = _topology()
    dev = tp.devices[0]
    sharding = SingleDeviceSharding(dev)
    t0 = time.time()
    jitted = jax.jit(fn, out_shardings=sharding)
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    dt = time.time() - t0
    mem = compiled.memory_analysis()
    print(f"AOT OK {name}: {dt:.1f} s compile; "
          f"hbm args+out+tmp = {mem.argument_size_in_bytes / 1e6:.0f}+"
          f"{mem.output_size_in_bytes / 1e6:.0f}+"
          f"{mem.temp_size_in_bytes / 1e6:.0f} MB", flush=True)
    return compiled


def _frame_phase(cfg, name):
    import jax
    import jax.numpy as jnp
    from stereo_to_multiview_tpu.models import pipeline
    # force the band engine and REAL Mosaic lowering (the pipeline would
    # otherwise resolve engine='auto' to XLA and interpret=True on the
    # CPU backend -- compiling the wrong graph entirely)
    pipeline.FORCE_MOSAIC = True
    cfg = cfg.replace(engine="band")
    h, w = cfg.num_rows, cfg.num_cols
    sbs = jax.ShapeDtypeStruct((h, 2 * w, 3), jnp.uint8)
    check_fn(lambda x: pipeline.process_frame(x, cfg), (sbs,), name)


def _multichip_phase(cfg_name="HD1080_D128", tag="1080p"):
    """Compile the halo+band shard graph for a REAL 4-chip v5e topology
    (SPMD + Mosaic through the actual TPU compiler -- a stronger scaling
    artifact than the virtual CPU mesh, which lowers Pallas in interpret
    mode).  Prints the collective mix of the per-device module."""
    import collections
    import re

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stereo_to_multiview_tpu import config as cfgmod
    from stereo_to_multiview_tpu.models import pipeline
    from stereo_to_multiview_tpu.parallel.halo import halo_process_frame

    pipeline.FORCE_MOSAIC = True
    _, tp = _topology()
    mesh = Mesh(np.array(tp.devices), ("row",))
    cfg = getattr(cfgmod, cfg_name).replace(engine="band")
    fn = halo_process_frame(mesh, cfg)
    sbs = jax.ShapeDtypeStruct(
        (cfg.num_rows, 2 * cfg.num_cols, 3), jnp.uint8)
    t0 = time.time()
    compiled = fn.lower(sbs).compile()
    dt = time.time() - t0
    mem = compiled.memory_analysis()
    print(f"AOT OK halo+band {tag} x4 v5e: {dt:.1f} s; per-device hbm "
          f"tmp = {mem.temp_size_in_bytes / 1e6:.0f} MB", flush=True)
    hlo = compiled.as_text()
    with open(f"/tmp/halo_band_x4_{tag}.hlo", "w") as f:
        f.write(hlo)
    # count instruction DEFINITIONS (an instruction's name also appears at
    # every use site, so a bare substring count over-reports ~3x); permutes
    # are keyed by their direction pattern which appears exactly once per
    # instruction
    perms = collections.Counter(
        m.group(1) for m in re.finditer(
            r"source_target_pairs=(\{\{\d+,\d+\})", hlo))
    others = collections.Counter(
        m.group(1) for m in re.finditer(
            r"= \S+ (all-reduce|all-gather|reduce-scatter|all-to-all)"
            r"(?:-start)?\(", hlo))
    print(f"collectives in the per-device module: "
          f"{sum(perms.values())} collective-permutes "
          f"{dict(perms)}; others: {dict(others)}", flush=True)


def main(phases):
    from stereo_to_multiview_tpu.config import FISH, HD1080_D128, UHD4K_16V
    table = {
        "fish": lambda: _frame_phase(FISH, "fish 640x384 D=64 V=8"),
        "hd": lambda: _frame_phase(HD1080_D128, "1080p D=128 V=8"),
        "4k": lambda: _frame_phase(UHD4K_16V, "4K D=128 V=16"),
        "multichip": _multichip_phase,
        "multichip4k": lambda: _multichip_phase("UHD4K_16V", "4k16v"),
    }
    for p in phases:
        table[p]()


if __name__ == "__main__":
    main(sys.argv[1:] or ["fish"])
