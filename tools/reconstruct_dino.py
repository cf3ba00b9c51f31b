"""Full dino-sequence reconstruction: all 37 turntable frames.

The reference ships data/dino/viff.000..036.ppm (36 views, ~10 deg
turntable steps) but only ever reconstructs ONE pair
(reference src/main.cpp:251-252).  This tool reconstructs the full
sequence with the incremental pipeline + distributed-capable BA and
reports turntable-consistency metrics:

  * per-step relative rotation angles (ideal: ~10 deg each)
  * total swept rotation (ideal: ~360 * 36/37 deg)
  * circle-fit RMS of camera centers / fitted radius (turntable
    cameras lie on a circle; dimensionless, gauge-invariant)
  * mean reprojection error over all retained observations

With --turntable, the circular-motion pipeline (models/turntable.py)
takes over: model-free ring tracks with wrap loop-closure edges,
uniform-phase turntable init, annealed variable-projected LM with
shared (f, k1) estimation, then annealed UNCONSTRAINED bundle
adjustment plus a snap-to-ring re-polish — the staging that rescues
this sequence from the bas-relief collapse (NOTES_R2.md). Measured:
10.0 +- 0.1 deg/step, 360.1 deg total, 1.2 px rms.

Usage:
  python tools/reconstruct_dino.py [--frames N] [--step S] [--cpu]
      [--out /tmp/dino_seq] [--pts-per-octave K] [--turntable]

Writes <out>.ply and <out>.metrics.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def circle_fit_metrics(centers: np.ndarray) -> dict:
    """Fit a plane + circle to camera centers; return relative RMS."""
    if not np.isfinite(centers).all():
        return {"circle_fit": "nonfinite centers"}
    c0 = centers.mean(0)
    X = centers - c0
    # plane normal = smallest right singular vector
    _, _, Vt = np.linalg.svd(X, full_matrices=False)
    n = Vt[-1]
    u, v = Vt[0], Vt[1]
    p = np.stack([X @ u, X @ v], 1)  # in-plane coords
    # algebraic circle fit (Kasa): |p - c|^2 = r^2
    A = np.concatenate([2 * p, np.ones((len(p), 1))], 1)
    b = (p ** 2).sum(1)
    sol, *_ = np.linalg.lstsq(A, b, rcond=None)
    cx, cy, k = sol
    r = math.sqrt(max(k + cx * cx + cy * cy, 1e-12))
    radial = np.sqrt(((p - [cx, cy]) ** 2).sum(1))
    oop = X @ n  # out-of-plane offsets
    return {
        "radius": float(r),
        "radial_rms_rel": float(np.sqrt(((radial - r) ** 2).mean()) / r),
        "out_of_plane_rms_rel": float(np.sqrt((oop ** 2).mean()) / r),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=37)
    ap.add_argument("--step", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/dino_seq")
    ap.add_argument("--pts-per-octave", type=int, default=512)
    ap.add_argument("--ba-iters", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    # Intrinsics overrides: the reference hard-codes f=2360 centered
    # (src/main.cpp:292-297); the published VGG dinosaur calibration is
    # fx=3310.4 fy=3325.5 c=(316.7, 200.6).
    ap.add_argument("--fx", type=float, default=2360.0)
    ap.add_argument("--fy", type=float, default=0.0, help="0 = same as fx")
    ap.add_argument("--cx", type=float, default=-1.0, help="<0 = w/2")
    ap.add_argument("--cy", type=float, default=-1.0, help="<0 = h/2")
    ap.add_argument("--turntable", action="store_true",
                    help="circular-motion constrained reconstruction")
    ap.add_argument("--save-feats", default=None,
                    help="save extracted features to this npz and exit-"
                    "free continue (device/CPU divergence forensics)")
    ap.add_argument("--load-feats", default=None,
                    help="skip extraction; load features from npz "
                    "(replay another backend's frontend)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from sfm_tpu.config import SiftConfig, PipelineConfig, RansacConfig
    from sfm_tpu.io.image_io import load_gray, save_ply
    from sfm_tpu.models import incremental
    from sfm_tpu.sift import frontend

    n_frames = args.frames
    if args.turntable:
        # viff.036 is byte-identical to viff.000: 36 unique ring views.
        n_frames = min(n_frames, 36)
    idxs = list(range(0, n_frames, args.step))
    paths = [f"/root/reference/data/dino/viff.{i:03d}.ppm" for i in idxs]
    h, w = None, None
    fx = args.fx
    fy = args.fy if args.fy > 0 else fx
    cfg = PipelineConfig(
        sift=SiftConfig(max_pts_per_octave=args.pts_per_octave),
        ransac=RansacConfig(n_hyps=1024, threshold=3e-6, chunk=256),
    )
    t0 = time.time()
    # Decode-ahead ingest: the native prefetcher (native/sfm_io.cpp)
    # decodes frames on worker threads while the extract_sift dispatch
    # for the previous frame runs on the accelerator, so frame decode
    # overlaps device compute (the reference ingests synchronously via
    # cv::imread, src/main.cpp:251-257).
    from sfm_tpu.io.image_io import iter_gray_frames

    imgs = [None] * len(paths)
    feats = [None] * len(paths)
    if args.load_feats:
        d = np.load(args.load_feats)
        from sfm_tpu.sift.frontend import Keypoints, SiftResult

        nfr = int(d["n_frames"])
        assert nfr == len(paths), (nfr, len(paths))
        for i, im in iter_gray_frames(paths, depth=4):
            imgs[i] = jnp.asarray(im)
            if h is None:
                h, w = imgs[i].shape
        for i in range(nfr):
            kp = Keypoints(*[jnp.asarray(d[f"f{i}_{f}"])
                             for f in Keypoints._fields])
            feats[i] = SiftResult(keypoints=kp,
                                  descriptors=jnp.asarray(d[f"f{i}_desc"]))
    else:
        for i, im in iter_gray_frames(paths, depth=4):
            imgs[i] = jnp.asarray(im)
            feats[i] = frontend.extract_sift(imgs[i], cfg.sift)
            if h is None:
                h, w = imgs[i].shape
    if args.save_feats:
        out = {"n_frames": len(paths)}
        for i, ft in enumerate(feats):
            for f in ft.keypoints._fields:
                out[f"f{i}_{f}"] = np.asarray(getattr(ft.keypoints, f))
            out[f"f{i}_desc"] = np.asarray(ft.descriptors)
        np.savez(args.save_feats, **out)
        print(f"saved features to {args.save_feats}", file=sys.stderr)
    cx = args.cx if args.cx >= 0 else w / 2
    cy = args.cy if args.cy >= 0 else h / 2
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    res = incremental.run_incremental(
        imgs, K, cfg, ba_iters=args.ba_iters, seed=args.seed, feats=feats
    )
    st = res.state
    elapsed = time.time() - t0

    tt_metrics = {}
    if args.turntable:
        from sfm_tpu.models import turntable as tt

        ttr = tt.reconstruct_turntable(
            feats, st.R, st.t, K, cfg, pose_valid=st.pose_valid
        )
        sd = np.asarray(ttr.step_deg)
        tt_metrics = {
            "turntable": True,
            "tt_rms_px": round(ttr.rms_px, 3),
            "tt_f_px": round(ttr.f, 1),
            "tt_k1": round(ttr.k1, 4),
            "tt_k2": round(ttr.k2, 4),
            "tt_tracks": int(ttr.tracks.n_tracks),
            "tt_obs": int(len(np.asarray(ttr.tracks.cam_idx))),
            "tt_obs_kept": int(np.asarray(ttr.keep).sum()),
            "tt_step_deg_mean": float(sd.mean()),
            "tt_step_deg_std": float(sd.std()),
            "tt_total_deg": round(ttr.total_deg, 2),
        }
        # Per-track validity: a track survives if any observation kept.
        tv = np.zeros((ttr.X.shape[0],), bool)
        np.logical_or.at(tv, np.asarray(ttr.tracks.pt_idx),
                         np.asarray(ttr.keep))
        st = st._replace(
            R=ttr.R, t=ttr.t, X=ttr.X, X_valid=jnp.asarray(tv),
            n_points=jnp.asarray(int(tv.sum()), jnp.int32),
            pose_valid=jnp.ones((len(idxs),), bool),
        )

    R = np.array(st.R)
    t = np.array(st.t)
    M = len(imgs)
    angles = []
    for i in range(1, M):
        dR = R[i] @ R[i - 1].T
        angles.append(
            math.degrees(math.acos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        )
    centers = np.einsum("mji,mj->mi", R, -t)  # C = -R^T t
    circ = circle_fit_metrics(centers) if M >= 5 else {}
    metrics = {
        "frames": M,
        "step_deg_ideal": 10.0 * args.step,
        "angles_deg": [round(a, 3) for a in angles],
        "angle_mean_deg": float(np.mean(angles)),
        "angle_std_deg": float(np.std(angles)),
        "total_rotation_deg": float(np.sum(angles)),
        "poses_valid": int(np.array(st.pose_valid).sum()),
        "n_points": int(st.n_points),
        "mean_reproj_norm2": float(res.mean_reproj),
        "mean_reproj_px": math.sqrt(max(float(res.mean_reproj), 0) / 2)
        * math.sqrt(fx * fy),
        "elapsed_s": round(elapsed, 1),
        **circ,
        **tt_metrics,
    }
    X = np.array(st.X)
    valid = np.array(st.X_valid)
    # Drop far-field stragglers for the viewable cloud.
    if valid.any():
        med = np.median(np.abs(X[valid]), axis=0)
        keep = valid & (np.abs(X) < 20 * (med + 1e-6)).all(1)
    else:
        keep = valid
    n_written = save_ply(args.out + ".ply", X, valid=keep)
    metrics["ply_vertices"] = int(n_written)
    with open(args.out + ".metrics.json", "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics, indent=1))


if __name__ == "__main__":
    main()
