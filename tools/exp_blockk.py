"""Device A/B of the fused sampling kernel's block_k (r5).

The phase decomposition measured ~0.9 us launch overhead per program
(phase-1 = 1.87 ms at block_k=8 / 2048 programs, up_t2.0) plus
per-keypoint post loops that batch wider with bigger blocks.  This
times the FULL extract (scan-chained, zero dispatch tax) at block_k
8 / 16 / 32, interleaved.

Usage: python tools/exp_blockk.py [--config up_t2.0|dino] [--cpu]
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
        if a.startswith("--config"):
            which = a.split("=", 1)[1] if "=" in a else "up_t2.0"
    if which == "dino":
        img = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
        base = SiftConfig(max_pts_per_octave=1024)
    else:
        img = jnp.asarray(load_gray("/root/reference/CudaSift/data/left.pgm"))
        up = which.startswith("up")
        thresh = float(which.split("_t", 1)[1])
        base = SiftConfig(
            num_octaves=5, max_pts_per_octave=4096, sample_cap=16384,
            octave_caps=(4096, 4096, 2048, 1024, 512),
            thresh=thresh, up_scale=up, init_blur=1.0,
        )

    cfgs = {f"bk{b}": dataclasses.replace(base, sample_block_k=b)
            for b in (32, 64)}
    if base.up_scale:
        # Per-octave adaptive caps: counts at up_t2.0 are 4096/4096/
        # 1895/722/247 — deep octaves pay top-k/gather/sample cost for
        # slots they never fill (SiftConfig.octave_caps).
        cfgs["bk64_ocaps"] = dataclasses.replace(
            base, sample_block_k=64,
            octave_caps=(4096, 4096, 2048, 1024, 512))
    # Select-mode rider: O(n) cumsum compaction (the reference's append
    # semantics, cudaSiftD.cu:1420) instead of the 2-level exact top-k
    # — the select stage measured 3.94 ms of the 16.6 ms extract (r5
    # detect-stage decomposition).
    # (r5 A/B: select="compact" measured 55 ms/extract — the O(n)
    # compaction scatter on a 4.9M-element map is far worse than the
    # 2-level top-k sorts on this backend.  topk stays.)

    NSCAN = 8
    use_pallas = frontend._use_pallas(base)
    offsets_l, subs_l = frontend.atlas_layout(img.shape, base)

    def make_scan(cfg):
        mats = frontend._mats_for(img.shape, cfg)

        @jax.jit
        def scanN(img_):
            def body(c, _):
                atlas, dets = frontend._detect_impl(img_ + c, cfg, mats)
                r = frontend._sample_stage(atlas, offsets_l, subs_l, dets,
                                           cfg, use_pallas)
                return jnp.minimum(jnp.abs(r.descriptors[0, 0]), 0.0), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=NSCAN)
            return c

        return scanN

    fns = {}
    for name, cfg in cfgs.items():
        t0 = time.time()
        fns[name] = make_scan(cfg)
        r = frontend.extract_sift(img, cfg)
        n = int(np.asarray(jnp.sum(r.keypoints.valid)))
        _ = float(fns[name](img))
        print(f"{name}: compile {time.time()-t0:.1f}s feats {n}", flush=True)

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)
    best = {k: float("inf") for k in cfgs}
    for rep in range(4):
        for name in cfgs:
            t0 = time.time()
            _ = float(fns[name](img))
            best[name] = min(
                best[name], max(0.0, (time.time() - t0) * 1000 - rtt) / NSCAN
            )
            print(f"  rep {rep} {name}: {best[name]:.2f} ms/extract",
                  flush=True)
    print("--- summary (scanN ms/extract) ---", flush=True)
    for name, ms in best.items():
        print(f"{name}: {ms:.2f}", flush=True)


if __name__ == "__main__":
    main()
