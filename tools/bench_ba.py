"""Bundle-adjustment benchmark: Schur-CG LM at production scale.

VERDICT r1 item 2's target: single-chip BA on M >= 50 cameras /
50k points in seconds.  Synthesizes a ring of M cameras observing P
points (O observations), perturbs, and times run_ba (solver="cg").

Usage: python tools/bench_ba.py [M] [P] [obs_per_cam] [--cpu]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    solver = "cg"
    for a in sys.argv[1:]:
        if a.startswith("--solver="):
            solver = a.split("=", 1)[1]
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

    from sfm_tpu.models import bundle_adjust as ba

    M = int(argv[0]) if len(argv) > 0 else 50
    P = int(argv[1]) if len(argv) > 1 else 50_000
    obs_per_cam = int(argv[2]) if len(argv) > 2 else 8_000
    rng = np.random.default_rng(0)

    # Ring of cameras looking inward at a point cloud.
    ang = np.linspace(0, 2 * np.pi, M, endpoint=False)
    X_gt = rng.uniform([-1, -1, -1], [1, 1, 1], size=(P, 3)).astype(np.float32)
    R_gt = np.zeros((M, 3, 3), np.float32)
    t_gt = np.zeros((M, 3), np.float32)
    for i, a in enumerate(ang):
        c, s = np.cos(a), np.sin(a)
        Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        R_gt[i] = Ry
        C = np.array([4 * np.sin(a), 0.2, -4 * np.cos(a)], np.float32)
        t_gt[i] = -Ry @ C
    cam_idx = np.repeat(np.arange(M), obs_per_cam).astype(np.int32)
    pt_idx = np.concatenate(
        [rng.choice(P, obs_per_cam, replace=False) for _ in range(M)]
    ).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", R_gt[cam_idx], X_gt[pt_idx]) + t_gt[cam_idx]
    uv = (Xc[:, :2] / Xc[:, 2:3] + 1e-3 * rng.normal(size=(M * obs_per_cam, 2))
          ).astype(np.float32)
    mask = np.ones(M * obs_per_cam, bool)
    fixed = np.zeros(M, bool)
    fixed[0] = True

    prob = ba.BAProblem(
        jnp.asarray(cam_idx), jnp.asarray(pt_idx), jnp.asarray(uv),
        jnp.asarray(mask), jnp.asarray(fixed),
    )
    # Perturbed init.
    X0 = (X_gt + 0.02 * rng.normal(size=X_gt.shape)).astype(np.float32)
    dr = 0.01 * rng.normal(size=(M, 3)).astype(np.float32)
    from sfm_tpu.geometry import lie

    R0 = np.einsum(
        "mij,mjk->mik", R_gt,
        np.asarray(jax.vmap(lie.so3_exp)(jnp.asarray(dr))),
    ).astype(np.float32)
    t0 = (t_gt + 0.01 * rng.normal(size=t_gt.shape)).astype(np.float32)

    iters, cg_iters = 15, 32
    t_c = time.time()
    st, costs = ba.run_ba(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X0), prob,
        iters=iters, solver=solver, cg_iters=cg_iters,
    )
    c_final = float(costs[-1])
    print(f"compile+first: {time.time()-t_c:.1f}s", flush=True)

    from sfm_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()

    best = float("inf")
    for _ in range(3):
        tt = time.time()
        st, costs = ba.run_ba(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X0), prob,
            iters=iters, solver=solver, cg_iters=cg_iters,
        )
        _ = float(costs[-1])
        best = min(best, max(0.0, (time.time() - tt) * 1000.0 - rtt))
    O = M * obs_per_cam
    print(
        f"BA M={M} P={P} O={O}: {best:.1f} ms for {iters} LM iters "
        f"(cg {cg_iters}) = {best/iters:.1f} ms/iter; "
        f"cost {float(costs[0]):.3e} -> {c_final:.3e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
