"""Device A/B: LEAN detect kernel vs in-kernel refinement (dev tool).

The up-scale detect stage sits at ~12.7 ms/image (NOTES_R3/r4 profile);
the lean kernel (ops/pallas_detect.py lean=True) moves the quadratic
solve + exp2 (~40% of the dense per-pixel VPU work) past the top-k, at
the price of 11 instead of 6 dense aux planes written to HBM.  This
times frontend._detect_stage both ways and checks detection parity.

Usage: python tools/exp_detect_lean.py [--config up_t2.0|dino] [--cpu]
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

    # Pin the fused kernel ON: this A/B is about its two variants
    # (interpret-mode on CPU, Mosaic on TPU).
    cfg = dataclasses.replace(cfg, fused_detect=True)
    mats = frontend._mats_for(img.shape, cfg)
    variants = {
        "full-kernel": dataclasses.replace(cfg, detect_lean=False),
        "lean-kernel": dataclasses.replace(cfg, detect_lean=True),
    }
    outs = {}
    for name, c in variants.items():
        t0 = time.time()
        atlas, dets = frontend._detect_stage(img, c, mats)
        n = int(sum(np.asarray(jnp.sum(d.valid)) for d in dets))
        outs[name] = dets
        print(f"{name}: compile+first {time.time()-t0:.1f}s dets {n}",
              flush=True)

    # Detection parity per octave (same candidates, same refinement —
    # only the place the solve runs differs).
    for o, (da, db) in enumerate(zip(outs["full-kernel"],
                                     outs["lean-kernel"])):
        va, vb = np.asarray(da.valid), np.asarray(db.valid)
        if va.sum() != vb.sum():
            print(f"  oct {o}: VALID MISMATCH {va.sum()} vs {vb.sum()}",
                  flush=True)
            continue
        dx = np.abs(np.asarray(da.x)[va] - np.asarray(db.x)[vb]).max() \
            if va.any() else 0.0
        print(f"  oct {o}: n={int(va.sum())} max|dx|={dx:.2e}", flush=True)

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)
    N = 8
    best = {k: float("inf") for k in variants}
    for rep in range(3):
        for name, c in variants.items():
            t0 = time.time()
            rs = [frontend._detect_stage(img, c, mats) for _ in range(N)]
            _ = float(sum(jnp.sum(a[:1, :1]) for a, _ in rs))
            best[name] = min(
                best[name], max(0.0, (time.time() - t0) * 1000 - rtt) / N
            )
            print(f"  rep {rep} {name}: {best[name]:.2f} ms", flush=True)
    print("--- summary (detect stage) ---", flush=True)
    for name in variants:
        print(f"{name}: {best[name]:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
