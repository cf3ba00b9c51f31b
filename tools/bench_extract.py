"""Per-stage extraction profile at a capacity class (dev tool).

The up-scale benchmark (tools/bench_upscale.py, NOTES_R3) showed the
high-capacity extraction regime (1280x960 input, up_scale, 4096
slots/octave, sample_cap 16384) at ~58 ms/image vs the reference's
published 13.2 ms (CudaSift/README.md:126-134).  This splits that time
across the two XLA programs of sift.frontend.extract_sift —
(1) dense pyramid+detect+atlas, (2) cap/top-k + fused orient+descriptor
sampling — to aim the optimization.

Measurement per CLAUDE.md: chain N dispatches, one scalar D2H sync,
subtract relay RTT, divide by N; ONE process at a time on the TPU.

Usage: python tools/bench_extract.py [--cpu] [--config up_t2.0|noup_t2.0|dino]
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
    from sfm_tpu.sift import frontend
    from sfm_tpu.utils.timing import measure_rtt

    which = "up_t2.0"
    blur = "matmul"
    for a in sys.argv:
        if a.startswith("--config="):
            which = a.split("=", 1)[1]
        if a.startswith("--blur="):
            blur = a.split("=", 1)[1]  # matmul | conv

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
    if blur == "conv":
        import dataclasses

        cfg = dataclasses.replace(cfg, blur_matmul=False)
    if "--fused" in sys.argv:
        import dataclasses

        cfg = dataclasses.replace(cfg, fused_detect=True)
    print(f"config {which}: image {img.shape}, up={cfg.up_scale}, "
          f"slots {cfg.num_octaves * cfg.max_pts_per_octave}, "
          f"cap {cfg.sample_cap}", flush=True)

    use_pallas = frontend._use_pallas(cfg)
    offsets, subs = frontend.atlas_layout(img.shape, cfg)
    mats = frontend._mats_for(img.shape, cfg)

    # Warm both programs + grab stage-1 outputs for stage-2 timing.
    t0 = time.time()
    atlas, dets = frontend._detect_stage(img, cfg, mats)
    res = frontend._sample_stage(atlas, offsets, subs, dets, cfg, use_pallas)
    nfeat = int(np.asarray(res.keypoints.count()))
    print(f"compile+first {time.time()-t0:.1f}s, feats {nfeat}", flush=True)
    ndet = int(np.asarray(sum(jnp.sum(d.valid) for d in dets)))
    print(f"raw detections {ndet} / {sum(d.x.shape[0] for d in dets)} slots",
          flush=True)

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)

    N = 8

    def amortized(fn, sync):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = [fn() for _ in range(N)]
            _ = float(sum(sync(o) for o in outs))
            best = min(best, max(0.0, (time.time() - t0) * 1000 - rtt) / N)
        return best

    t_detect = amortized(
        lambda: frontend._detect_stage(img, cfg, mats),
        lambda o: jnp.sum(o[0][:1, :1]),
    )
    print(f"stage1 detect (pyramid+NMS+atlas): {t_detect:.2f} ms", flush=True)

    t_sample = amortized(
        lambda: frontend._sample_stage(atlas, offsets, subs, dets, cfg,
                                       use_pallas),
        lambda o: jnp.sum(o.descriptors[:1, :1]),
    )
    print(f"stage2 sample (cap+orient+descriptor): {t_sample:.2f} ms",
          flush=True)

    t_all = amortized(
        lambda: frontend.extract_sift(img, cfg),
        lambda o: jnp.sum(o.descriptors[:1, :1]),
    )
    print(f"extract_sift total: {t_all:.2f} ms "
          f"(stage sum {t_detect + t_sample:.2f})", flush=True)


if __name__ == "__main__":
    main()
