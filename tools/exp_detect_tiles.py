"""Tile-shape A/B for the fused detect kernel (r5).

The maps stage measures 4.35 ms at up_t2.0 against a ~1.5 ms VPU
accounting — per-program fixed costs (halo re-blur, DMA, issue) may be
the gap.  Times detect_maps over all octaves at several (tile_rows,
tile_cols), scan-chained.

Usage: python tools/exp_detect_tiles.py [--cpu]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sfm_tpu.config import SiftConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.sift import frontend, pyramid
    from sfm_tpu.ops import pallas_detect
    from sfm_tpu.utils.timing import measure_rtt

    img = jnp.asarray(load_gray("/root/reference/CudaSift/data/left.pgm"))
    cfg = SiftConfig(
        num_octaves=5, max_pts_per_octave=4096, sample_cap=16384,
        octave_caps=(4096, 4096, 2048, 1024, 512),
        thresh=2.0, up_scale=True, init_blur=1.0,
    )
    interp = jax.default_backend() == "cpu"
    mats = frontend._mats_for(img.shape, cfg)
    bases = pyramid.base_chain_pallas(img, cfg, interpret=interp) \
        if frontend._use_pallas_pyramid(cfg) else \
        pyramid.base_chain(img, cfg, mats if mats else None)
    jax.block_until_ready(bases)
    tapss = []
    for o in range(cfg.num_octaves):
        taps = pyramid.octave_kernel_bank(cfg, o)
        tapss.append(tuple(tuple(float(v) for v in row)
                           for row in np.asarray(taps)))

    def make(tr, tc):
        @jax.jit
        def run(bases_):
            def body(c, _):
                tot = jnp.float32(0.0)
                for o in range(cfg.num_octaves):
                    resp, aux = pallas_detect.detect_maps(
                        bases_[o] + c, taps=tapss[o],
                        n_scales=cfg.num_scales, thresh=float(cfg.thresh),
                        edge_limit=float(cfg.edge_limit), scale_gate=0.0,
                        interpret=interp, lean=True,
                        tile_rows=tr, tile_cols=tc,
                    )
                    tot = tot + resp[0, 0] + aux[0, 0, 0]
                return jnp.minimum(jnp.abs(tot), 0.0), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=8)
            return c

        return lambda: run(bases)

    # (r5: with the all-planes kernel, tile_rows 64 / tile_cols 2048
    # OOM'd the 16 MB scoped VMEM; the rolling 3-plane window frees
    # ~half the live set — re-sweep.)
    shapes = [(32, 1024), (64, 1024), (64, 2048), (128, 1024)]
    variants = {f"t{tr}x{tc}": make(tr, tc) for tr, tc in shapes}
    for name, fn in variants.items():
        t0 = time.time()
        jax.block_until_ready(fn())
        print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)
    best = {k: float("inf") for k in variants}
    for rep in range(4):
        for name, fn in variants.items():
            t0 = time.time()
            _ = float(fn())
            best[name] = min(
                best[name], max(0.0, (time.time() - t0) * 1000 - rtt) / 8
            )
            print(f"  rep {rep} {name}: {best[name]:.2f} ms", flush=True)
    print("--- summary (all-octave maps, ms per rep) ---", flush=True)
    for name, ms in best.items():
        print(f"{name}: {ms:.2f}", flush=True)


if __name__ == "__main__":
    main()
