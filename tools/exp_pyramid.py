"""Device A/B: Pallas base chain vs banded-matmul base chain.

VERDICT r4 item 1: the up-scale detect stage (~12 ms/image) is
dominated by the base chain's banded matmuls (~8 ms — r4 device
profile); ops/pallas_pyramid.py replaces them with bandwidth-bound
blur/decimate kernels.  Times frontend._detect_stage and full
extract_sift both ways, with detection-count parity.

Usage: python tools/exp_pyramid.py [--config up_t2.0|dino] [--cpu]
"""

from __future__ import annotations

import dataclasses
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
    from sfm_tpu.sift import frontend
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
    variants = {
        "matmul-chain": dataclasses.replace(cfg, pyramid_pallas=False),
        "pallas-chain": dataclasses.replace(cfg, pyramid_pallas=True),
    }
    mats = {n: frontend._mats_for(img.shape, c) for n, c in variants.items()}
    for name, c in variants.items():
        t0 = time.time()
        atlas, dets = frontend._detect_stage(img, c, mats[name])
        n = int(sum(np.asarray(jnp.sum(d.valid)) for d in dets))
        print(f"{name}: detect compile+first {time.time()-t0:.1f}s dets {n}",
              flush=True)
        t0 = time.time()
        r = frontend.extract_sift(img, c)
        nv = int(np.asarray(jnp.sum(r.keypoints.valid)))
        print(f"{name}: extract compile+first {time.time()-t0:.1f}s "
              f"feats {nv}", flush=True)

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)
    N = 8
    best = {}
    for rep in range(3):
        for name, c in variants.items():
            t0 = time.time()
            rs = [frontend._detect_stage(img, c, mats[name])
                  for _ in range(N)]
            _ = float(sum(jnp.sum(a[:1, :1]) for a, _ in rs))
            key = f"{name}:detect"
            best[key] = min(best.get(key, 1e9),
                            max(0.0, (time.time() - t0) * 1000 - rtt) / N)
            t0 = time.time()
            rs = [frontend.extract_sift(img, c) for _ in range(N)]
            _ = float(sum(jnp.sum(r.descriptors[:1, :1]) for r in rs))
            key = f"{name}:extract"
            best[key] = min(best.get(key, 1e9),
                            max(0.0, (time.time() - t0) * 1000 - rtt) / N)
            print(f"  rep {rep} {name}: "
                  f"detect {best[f'{name}:detect']:.2f} "
                  f"extract {best[f'{name}:extract']:.2f} ms", flush=True)
    print("--- summary ---", flush=True)
    for k, v in best.items():
        print(f"{k}: {v:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
