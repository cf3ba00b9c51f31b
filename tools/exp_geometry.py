"""Geometry-stage perf bisection on the real device.

The two-view geometry program (RANSAC + pose + refine + triangulate,
models/two_view.py:two_view_geometry) measured ~2.6 ms on TPU before
the closed-form solver rewrite — the largest single stage of the
9.5 ms pipeline.  Its FLOP count is trivial (~100 MFLOP), so the cost
is dependency-chain latency: scan iterations and lax.map scoring
chunks serialize.  This experiment times the stage under knob variants
AND reports quality (inliers / reproj) so speed is never read without
accuracy.  Config variants are timed INTERLEAVED per the measurement
convention (relay throughput drifts over a process lifetime); the
solver A/B (monkeypatched Jacobi) cannot interleave cheaply and runs
as a sequential pair at the end.

Usage: python tools/exp_geometry.py [variant ...]
Variants: base chunks refine polish hyps combo combo6 jacobi
"""

from __future__ import annotations

import dataclasses
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
    from sfm_tpu.utils.timing import measure_rtt

    want = lambda k: (len(sys.argv) == 1) or (k in sys.argv[1:])

    img1 = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
    img2 = jnp.asarray(load_gray("/root/reference/data/dino/viff.001.ppm"))
    h, w = img1.shape
    K = jnp.asarray(
        np.array([[2360.0, 0, w / 2], [0, 2360.0, h / 2], [0, 0, 1]], np.float32)
    )
    base_cfg = PipelineConfig(
        sift=SiftConfig(max_pts_per_octave=1024),
        ransac=RansacConfig(n_hyps=1024, threshold=3e-6, chunk=256),
    )
    # Frontend once (shared input for every geometry variant).
    uv1, uv2, mask = two_view.frontend_stage(img1, img2, base_cfg)
    jax.block_until_ready((uv1, uv2, mask))
    keys = [jax.random.PRNGKey(i) for i in range(16)]
    rc = base_cfg.ransac

    # --- variant set (CPU quality sweep results in NOTES_R2) ---
    variants = []
    if want("base"):
        variants.append(("base[chunk256,refine10,refit2]", base_cfg))
    if want("chunks"):
        for c in (512, 1024):
            variants.append((f"chunk{c}", dataclasses.replace(
                base_cfg, ransac=dataclasses.replace(rc, chunk=c))))
    if want("refine"):
        variants.append(("refine6", dataclasses.replace(base_cfg, refine_iters=6)))
    if want("polish"):
        variants.append(("refit1", dataclasses.replace(
            base_cfg, ransac=dataclasses.replace(rc, refit_iters=1))))
    if want("hyps"):
        # CPU quality: n_hyps=512 collapses pair 005-006 — timing only.
        variants.append(("hyps512[quality-lossy]", dataclasses.replace(
            base_cfg, ransac=dataclasses.replace(rc, n_hyps=512, chunk=512))))
    if want("combo"):
        variants.append(("combo[chunk1024,refit1]", dataclasses.replace(
            base_cfg, ransac=dataclasses.replace(rc, chunk=1024, refit_iters=1))))
    if want("combo6"):
        variants.append(("combo6[chunk1024,refit1,refine6]", dataclasses.replace(
            base_cfg,
            ransac=dataclasses.replace(rc, chunk=1024, refit_iters=1),
            refine_iters=6)))
    if want("votecap"):
        # Subset first-branch-vote: skips 75% of the first recover_pose
        # DLT solves; final vote/triangulation unchanged.
        variants.append(("votecap512", dataclasses.replace(
            base_cfg, vote_cap=512)))
    if want("votecombo"):
        variants.append(("votecombo[votecap512,chunk1024]",
                         dataclasses.replace(
                             base_cfg, vote_cap=512,
                             ransac=dataclasses.replace(rc, chunk=1024))))

    def compile_and_quality(cfg, name):
        t0 = time.time()
        r = two_view.two_view_geometry(keys[0], uv1, uv2, mask, K, cfg)
        _ = float(r.reproj_err)
        px = math.sqrt(float(r.reproj_err) / 2) * 2360.0
        print(
            f"{name}: compile {time.time()-t0:.1f}s  "
            f"inliers={int(r.num_inliers)} valid={int(r.point_valid.sum())} "
            f"reproj={px:.3f}px",
            flush=True,
        )

    def time_once(cfg, rtt, n=12):
        t0 = time.time()
        outs = [
            two_view.two_view_geometry(keys[i % 16], uv1, uv2, mask, K, cfg).reproj_err
            for i in range(n)
        ]
        _ = float(sum(outs))
        return max(0.0, (time.time() - t0) * 1000 - rtt) / n

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)

    for name, cfg in variants:
        compile_and_quality(cfg, name)
    best = {name: float("inf") for name, _ in variants}
    for rep in range(3):
        for name, cfg in variants:  # interleaved reps
            best[name] = min(best[name], time_once(cfg, rtt))
            print(f"  rep {rep} {name}: {best[name]:.2f} ms", flush=True)
    for name, ms in best.items():
        print(f"{name}: {ms:.2f} ms", flush=True)

    if want("jacobi"):
        # A/B the closed-form small solvers (analytic svd3x3 + adjugate
        # triangulation, defaults) vs the fixed-sweep Jacobi paths.
        # Monkeypatch + cache clear -> cannot interleave cheaply; run as
        # a back-to-back pair (same-magnitude drift hits both sides).
        import functools as _ft

        from sfm_tpu.ops import linalg as _linalg
        from sfm_tpu.geometry import triangulate as _tri

        orig_svd = _linalg.svd3x3
        orig_tri = _tri.triangulate
        _linalg.svd3x3 = _ft.partial(orig_svd, method="jacobi")
        _tri.triangulate = _ft.partial(orig_tri, solver="jacobi")
        jax.clear_caches()
        try:
            compile_and_quality(base_cfg, "base[jacobi solvers]")
            ms_j = min(time_once(base_cfg, rtt) for _ in range(3))
            print(f"base[jacobi solvers]: {ms_j:.2f} ms", flush=True)
        finally:
            _linalg.svd3x3 = orig_svd
            _tri.triangulate = orig_tri
            jax.clear_caches()
        compile_and_quality(base_cfg, "base[closed-form solvers]")
        ms_a = min(time_once(base_cfg, rtt) for _ in range(3))
        print(f"base[closed-form solvers]: {ms_a:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
