"""Interleaved A/B: closed-form small solvers vs fixed-sweep Jacobi.

The sequential pair in tools/exp_geometry.py measured jacobi 2.12 ms vs
closed-form 2.65 ms — the OPPOSITE of the closed-form rewrite's intent —
but back-to-back runs are exposed to relay drift.  This interleaves the
two variants in one process via AOT compilation: each variant is
lowered+compiled under its own monkeypatch with jax.clear_caches()
between traces (an earlier attempt that relied on distinct static-arg
values leaked the patch through the NESTED jit trace caches — the inner
solver jaxprs traced under the jacobi patch were reused when tracing
the "closed" variant; AOT executables survive the cache clear).

Usage: python tools/exp_solver_ab.py
"""

from __future__ import annotations

import functools
import math
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
    from sfm_tpu.geometry import triangulate as tri_mod
    from sfm_tpu.ops import linalg
    from sfm_tpu.utils.timing import measure_rtt

    img1 = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
    img2 = jnp.asarray(load_gray("/root/reference/data/dino/viff.001.ppm"))
    h, w = img1.shape
    K = jnp.asarray(
        np.array([[2360.0, 0, w / 2], [0, 2360.0, h / 2], [0, 0, 1]], np.float32)
    )
    cfg = PipelineConfig(
        sift=SiftConfig(max_pts_per_octave=1024),
        ransac=RansacConfig(n_hyps=1024, threshold=3e-6, chunk=256),
    )
    uv1, uv2, mask = two_view.frontend_stage(img1, img2, cfg)
    jax.block_until_ready((uv1, uv2, mask))
    keys = [jax.random.PRNGKey(i) for i in range(16)]

    orig_svd = linalg.svd3x3
    orig_tri = tri_mod.triangulate

    def build(name, patch):
        if patch:
            linalg.svd3x3 = functools.partial(orig_svd, method="jacobi")
            tri_mod.triangulate = functools.partial(orig_tri, solver="jacobi")
        try:
            jax.clear_caches()  # drop nested-jit jaxprs traced under the
            # previous variant's patch state
            t0 = time.time()
            compiled = two_view.two_view_geometry.lower(
                keys[0], uv1, uv2, mask, K, cfg
            ).compile()
            r = compiled(keys[0], uv1, uv2, mask, K)
            _ = float(r.reproj_err)
            px = math.sqrt(float(r.reproj_err) / 2) * 2360.0
            print(
                f"{name}: compile {time.time()-t0:.1f}s "
                f"inliers={int(r.num_inliers)} "
                f"valid={int(r.point_valid.sum())} reproj={px:.3f}px",
                flush=True,
            )
            return compiled
        finally:
            linalg.svd3x3 = orig_svd
            tri_mod.triangulate = orig_tri

    comp_j = build("jacobi", patch=True)
    comp_c = build("closed", patch=False)

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)

    def time_once(compiled, n=12):
        t0 = time.time()
        outs = [
            compiled(keys[i % 16], uv1, uv2, mask, K).reproj_err
            for i in range(n)
        ]
        _ = float(sum(outs))
        return max(0.0, (time.time() - t0) * 1000 - rtt) / n

    best = {"jacobi": float("inf"), "closed": float("inf")}
    for rep in range(4):
        for name, compiled in (("jacobi", comp_j), ("closed", comp_c)):
            ms = time_once(compiled)
            best[name] = min(best[name], ms)
            print(f"  rep {rep} {name}: {ms:.2f} ms", flush=True)
    for name, ms in best.items():
        print(f"{name}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
