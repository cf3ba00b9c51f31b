"""A/B the pair-batched frontend (cfg.pair_frontend) on the real device.

Measures the FULL two-view pipeline (frontend + geometry) both ways,
interleaved per the measurement convention (relay throughput drifts),
and reports quality so speed is never read without accuracy.

Usage: python tools/exp_pair.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sfm_tpu.config import SiftConfig, PipelineConfig, RansacConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.models import two_view

    img1 = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
    img2 = jnp.asarray(load_gray("/root/reference/data/dino/viff.001.ppm"))
    h, w = img1.shape
    K = jnp.asarray(
        np.array([[2360.0, 0, w / 2], [0, 2360.0, h / 2], [0, 0, 1]], np.float32)
    )
    base = PipelineConfig(
        sift=SiftConfig(max_pts_per_octave=1024),
        ransac=RansacConfig(n_hyps=1024, threshold=3e-6, chunk=256),
    )
    # r3 resolution: the pair-batched frontend lost its device A/B
    # (12.51 vs 10.84 ms/pair at equal matches) and was DELETED from
    # the codebase; this tool keeps the remaining frontend knob A/Bs.
    cfgs = {
        "seq": base,
        # sample_cap 2048 -> 1536: sampling kernels + [K,128] matmuls +
        # matcher all scale with slots; CPU quality check was ~neutral
        # (NOTES_R2) — ship only if the time win is real and quality
        # holds on-device.
        "cap1536": dataclasses.replace(
            base, sift=dataclasses.replace(base.sift, sample_cap=1536)
        ),
        # O(n) cumsum compaction instead of the exact top_k sort in
        # detect (reference append semantics; same set below capacity).
        "compact": dataclasses.replace(
            base, sift=dataclasses.replace(base.sift, select="compact")
        ),
    }
    keys = [jax.random.PRNGKey(i) for i in range(16)]

    from sfm_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)

    import math

    for name, cfg in cfgs.items():
        t0 = time.time()
        r = two_view.two_view_pipeline(img1, img2, K, keys[0], cfg)
        _ = float(r.reproj_err)
        px = math.sqrt(float(r.reproj_err) / 2) * 2360.0
        print(
            f"{name}: compile {time.time()-t0:.1f}s  "
            f"matches={int(r.num_matches)} inliers={int(r.num_inliers)} "
            f"valid={int(r.point_valid.sum())} reproj={px:.3f}px",
            flush=True,
        )

    N = 10
    best = {k: float("inf") for k in cfgs}
    for _rep in range(4):
        for name, cfg in cfgs.items():
            t0 = time.time()
            outs = [
                two_view.two_view_pipeline(
                    img1, img2, K, keys[i % 16], cfg
                ).reproj_err
                for i in range(N)
            ]
            _ = float(sum(outs))
            best[name] = min(
                best[name], max(0.0, (time.time() - t0) * 1000 - rtt) / N
            )
            print(f"  rep {_rep} {name}: {best[name]:.2f} ms", flush=True)
    for name, ms in best.items():
        print(f"{name}: {ms:.2f} ms/pair", flush=True)


if __name__ == "__main__":
    main()
