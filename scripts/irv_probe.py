#!/usr/bin/env python
"""Probe the IRV round structure on the bench input: outlier counts,
per-round accepts, and the block-flag densities that gate the fused
kernels (ops/irvkern.py).  Quantifies how much of the rowspan volume's
dense DMA a flag-gated (manual-DMA / sparse) design would actually skip
-- the round-5 decision data for VERDICT item 1.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from stereo_to_multiview_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from stereo_to_multiview_tpu.config import HD1080_D128
    import bench
    from stereo_to_multiview_tpu.ops import band as B
    from stereo_to_multiview_tpu.ops.cross import UP, DOWN, LEFT, RIGHT
    from stereo_to_multiview_tpu.ops.irvkern import irv_round_kern

    cfg = HD1080_D128
    sbs = bench.bench_input(cfg)
    img_l = jnp.asarray(np.ascontiguousarray(sbs[:, :cfg.num_cols]))
    img_r = jnp.asarray(np.ascontiguousarray(sbs[:, cfg.num_cols:]))

    @jax.jit
    def pre(l, r):
        from stereo_to_multiview_tpu.ops.postkern import (
            cross_arms_kern_lr, dcc_occl_kern)
        al, ar = cross_arms_kern_lr(l, r, cfg.ucd, cfg.lcd, cfg.usd,
                                    cfg.lsd)
        dl, dr = B.band_stereo_core_chunked(l, r, al, ar, cfg, False)
        ol, orr = dcc_occl_kern(dl, dr, cfg.dcc_thresh, with_labels=True,
                                num_disp=cfg.num_disp,
                                zero_disp=cfg.zero_disp)
        return al, ar, dl, dr, ol, orr

    t0 = time.perf_counter()
    al, ar, dl, dr, ol, orr = jax.block_until_ready(pre(img_l, img_r))
    print(f"pre: {time.perf_counter() - t0:.1f}s", flush=True)

    usd = cfg.usd
    h, w = dl.shape
    # stacked-eye geometry as dr_irv_band_chunked uses it
    disp = jnp.concatenate([dl, dr], axis=0)
    outl = jnp.concatenate([ol, orr], axis=0)
    arms = jnp.concatenate([al, ar], axis=1)

    def flag_density(need):
        """(vflag frac, rflag frac) at irv_round_kern's block grains."""
        hh, ww = need.shape
        hp = -(-hh // 128) * 128
        wp = -(-ww // 256) * 256
        m = np.zeros((hp, wp), bool)
        m[:hh, :ww] = need
        n_hseg, n_xb = hp // 128, wp // 8
        v = m.reshape(n_hseg, 128, n_xb, 8).any(axis=(1, 3))
        n_yb, n_xt = hp // 32, wp // 256
        blk = m.reshape(n_yb, 32, n_xt, 256).any(axis=(1, 3))
        r_reach = -(-usd // 32)
        dil = blk.copy()
        for k in range(1, r_reach + 1):
            dil[:-k] |= blk[k:]
            dil[k:] |= blk[:-k]
        return v.mean(), dil.mean()

    need = np.asarray(outl) != 0
    print(f"outliers: L={int(np.asarray(ol != 0).sum())} "
          f"R={int(np.asarray(orr != 0).sum())} "
          f"({(np.asarray(outl) != 0).mean() * 100:.3f}%)", flush=True)

    nmask = jnp.asarray(need)
    d_cur, o_cur = disp, outl
    for rnd in range(cfg.irv_iterations):
        vf, rf = flag_density(np.asarray(nmask) & (np.asarray(o_cur) != 0))
        t0 = time.perf_counter()
        nd, no = jax.block_until_ready(irv_round_kern(
            d_cur, o_cur, arms, cfg.irv_thresh_s, cfg.irv_thresh_h,
            cfg.num_disp, cfg.zero_disp, usd, False, need=nmask))
        dt = time.perf_counter() - t0
        ch = np.asarray(no != o_cur)
        print(f"round {rnd + 1}: vflags {vf * 100:5.1f}%  "
              f"rflags {rf * 100:5.1f}%  accepts {int(ch.sum())}  "
              f"outliers left {int(np.asarray(no != 0).sum())}  "
              f"wall {dt * 1e3:.1f} ms (incl dispatch)", flush=True)
        if not ch.any():
            print("fixpoint", flush=True)
            break
        # next-round frontier like dr_irv_band_chunked._dilate_cheb
        g = 8
        r = -(-usd // g) + 1
        hh, ww = ch.shape
        hp2 = -(-hh // g) * g
        wp2 = -(-ww // g) * g
        m = np.zeros((hp2, wp2), bool)
        m[:hh, :ww] = ch
        blk = m.reshape(hp2 // g, g, wp2 // g, g).any(axis=(1, 3))
        for axis in (0, 1):
            d2 = blk.copy()
            for k in range(1, min(r, blk.shape[axis] - 1) + 1):
                sl_lo = [slice(None)] * 2
                sl_hi = [slice(None)] * 2
                sl_lo[axis] = slice(k, None)
                sl_hi[axis] = slice(None, -k)
                d2[tuple(sl_hi)] |= blk[tuple(sl_lo)]
                d2[tuple(sl_lo)] |= blk[tuple(sl_hi)]
            blk = d2
        full = np.repeat(np.repeat(blk, g, axis=0), g, axis=1)
        nmask = jnp.asarray(full[:hh, :ww])
        d_cur, o_cur = nd, no
    return 0


if __name__ == "__main__":
    sys.exit(main())
