"""Device-vs-CPU forensics for the free-BA stage (r5).

Loads the BA problem dumped at the turntable pipeline's free-BA
boundary (SFM_TPU_TT_DUMP) and runs the exact _anneal_free_ba stages
on the CURRENT backend, printing per-stage costs and step spreads —
identical inputs on both backends isolate the geometry numerics.

Usage: python tools/diag_ba_dev.py [--npz /tmp/ba_problem.npz] [--cpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    npz = "/tmp/ba_problem.npz"
    for a in sys.argv:
        if a.startswith("--npz="):
            npz = a.split("=", 1)[1]
    d = np.load(npz)
    R = jnp.asarray(d["R"])
    t = jnp.asarray(d["t"])
    cam_idx = jnp.asarray(d["cam_idx"])
    pt_idx = jnp.asarray(d["pt_idx"])
    uv_nd = jnp.asarray(d["uv_nd"])
    mask = jnp.asarray(d["mask"])
    n_tracks = int(d["n_tracks"])
    f0 = float(d["f0"])
    global SOLVER
    SOLVER = "cg" if "--cg" in sys.argv else "auto"
    print(f"backend={jax.default_backend()} obs={int(mask.sum())} "
          f"tracks={n_tracks} solver={SOLVER}", flush=True)

    from sfm_tpu.geometry import triangulate as tri
    from sfm_tpu.models import bundle_adjust as ba
    from sfm_tpu.models.turntable import _steps_deg_np
    from sfm_tpu.utils.precision import f32_matmul

    @f32_matmul
    def stage(R, t, keep, hub, pru, iters):
        X, ok = tri.triangulate_tracks(R, t, cam_idx, pt_idx, uv_nd,
                                       jnp.asarray(keep), n_tracks)
        Xc = jnp.einsum("oij,oj->oi", R[cam_idx], X[pt_idx]) + t[cam_idx]
        z = jnp.where(jnp.abs(Xc[:, 2:3]) < 1e-8, 1e-8, Xc[:, 2:3])
        r = np.linalg.norm(np.asarray((Xc[:, :2] / z - uv_nd) * f0), axis=1)
        okm = np.asarray(mask) & np.asarray(ok)[np.asarray(pt_idx)]
        m = jnp.asarray(okm & (r < pru))
        prob = ba.BAProblem(cam_idx, pt_idx, uv_nd, m,
                            jnp.zeros((R.shape[0],), bool))
        st, costs = ba.run_ba(R, t, X, prob, iters=iters,
                              huber_delta=hub / f0, solver=SOLVER)
        return st, costs, okm

    keep = np.asarray(mask)
    for hub, pru in [(8.0, 64.0), (2.0, 12.0)]:
        st, costs, okm = stage(R, t, keep, hub, pru, 20)
        R, t = st.R, st.t
        c = np.asarray(costs)
        steps = _steps_deg_np(np.asarray(R))
        print(f"stage hub={hub}: costs {c[0]:.6e} -> {c[-1]:.6e} "
              f"(first5 {np.array2string(c[:5], precision=4)}), "
              f"step {steps.mean():.3f} +- {steps.std():.3f} deg",
              flush=True)
        # recompute keep for next stage
        Xc = jnp.einsum("oij,oj->oi", R[cam_idx],
                        st.X[pt_idx]) + t[cam_idx]
        z = jnp.where(jnp.abs(Xc[:, 2:3]) < 1e-8, 1e-8, Xc[:, 2:3])
        r = np.linalg.norm(np.asarray((Xc[:, :2] / z - uv_nd) * f0), axis=1)
        keep = okm & (r < pru)


if __name__ == "__main__":
    main()
