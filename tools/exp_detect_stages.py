"""Sub-stage breakdown of the FUSED detect stage on device (dev tool).

The lean-kernel A/B (r4, tools/exp_detect_lean.py) moved the up-scale
detect stage only 12.55 -> 11.92 ms, so the dense per-pixel solve was
NOT the cost; speed-of-light for the kernel's arithmetic is ~1 ms.
This times cumulative prefixes of frontend._detect_impl's fused path:

  bases   pyramid.base_chain only (lowpass + decimation matmuls)
  atlas   + _build_atlas packing
  maps    + pallas detect_maps per octave (no selection)
  select  + select_from_maps top-k tail  (== the full stage)

Usage: python tools/exp_detect_stages.py [--config up_t2.0|dino] [--cpu]
"""

from __future__ import annotations

import dataclasses
import functools
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
    from sfm_tpu.sift import frontend, pyramid, detect as detect_mod
    from sfm_tpu.ops import pallas_detect
    from sfm_tpu.utils.timing import measure_rtt

    which = "up_t2.0"
    for a in sys.argv:
        if a.startswith("--config="):
            which = a.split("=", 1)[1]

    if which == "dino":
        img = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
        cfg = SiftConfig(max_pts_per_octave=1024)
    else:
        img = jnp.asarray(load_gray("/root/reference/CudaSift/data/left.pgm"))
        up = which.startswith("up")
        thresh = float(which.split("_t", 1)[1])
        cfg = SiftConfig(
            num_octaves=5, max_pts_per_octave=4096, sample_cap=16384,
            thresh=thresh, up_scale=up,
        )
    cfg = dataclasses.replace(cfg, fused_detect=True)
    mats = frontend._mats_for(img.shape, cfg)
    interp = jax.default_backend() == "cpu"

    def all_maps(img_, upto=None):
        bases = pyramid.base_chain(img_, cfg, mats if mats else None)
        atlas, offsets = frontend._build_atlas(bases)
        outs = []
        for o in range(len(offsets) if upto is None else upto):
            taps = pyramid.octave_kernel_bank(cfg, o)
            taps_t = tuple(
                tuple(float(v) for v in row) for row in np.asarray(taps)
            )
            outs.append(pallas_detect.detect_maps(
                bases[o], taps=taps_t, n_scales=cfg.num_scales,
                thresh=float(cfg.thresh),
                edge_limit=float(cfg.edge_limit), scale_gate=0.0,
                interpret=interp, lean=cfg.detect_lean,
            ))
        return atlas, outs

    @jax.jit
    def f_bases(img_):
        return pyramid.base_chain(img_, cfg, mats if mats else None)

    @jax.jit
    def f_atlas(img_):
        bases = pyramid.base_chain(img_, cfg, mats if mats else None)
        return frontend._build_atlas(bases)[0]

    @jax.jit
    def f_maps(img_):
        atlas, outs = all_maps(img_)
        return atlas, [r for r, _ in outs]

    @jax.jit
    def f_maps1(img_):
        atlas, outs = all_maps(img_, upto=1)
        return atlas, [r for r, _ in outs]

    @jax.jit
    def f_full(img_):
        return frontend._detect_stage(img, cfg, mats)

    variants = {
        "bases": f_bases,
        "atlas": f_atlas,
        "maps1": f_maps1,
        "maps": f_maps,
        "select": f_full,
    }
    for name, fn in variants.items():
        t0 = time.time()
        jax.block_until_ready(fn(img))
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)
    N = 8
    best = {k: float("inf") for k in variants}

    def sync(out):
        x = out
        while isinstance(x, (tuple, list)):
            x = x[0]
        return float(jnp.sum(x[:1, :1] if x.ndim >= 2 else x[:1]))

    for rep in range(3):
        for name, fn in variants.items():
            t0 = time.time()
            outs = [fn(img) for _ in range(N)]
            _ = sum(sync(o) for o in outs)
            best[name] = min(
                best[name], max(0.0, (time.time() - t0) * 1000 - rtt) / N
            )
            print(f"  rep {rep} {name}: {best[name]:.2f} ms", flush=True)
    print("--- detect sub-stages (cumulative) ---", flush=True)
    for name in variants:
        print(f"{name}: {best[name]:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
