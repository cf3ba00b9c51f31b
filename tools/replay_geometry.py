"""Replay a captured match set through the geometry stage on CPU.

Pairs with tools/capture_matches.py: loading the DEVICE's exact
compacted correspondences here separates frontend divergence from
geometry numerics/draw-dependence.  Prints per-seed quality for the
bench config (and optional config variants).

Usage: python tools/replay_geometry.py [--npz /tmp/matches_device.npz]
       [--seeds 8] [--only base,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os
import sys

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "tests"))
import _cpu  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="/tmp/matches_device.npz")
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sfm_tpu.config import SiftConfig, PipelineConfig, RansacConfig
    from sfm_tpu.models import two_view

    d = np.load(args.npz)
    uv1 = jnp.asarray(d["uv1"])
    uv2 = jnp.asarray(d["uv2"])
    mask = jnp.asarray(d["mask"])
    K = jnp.asarray(d["K"])
    print(f"loaded {args.npz}: matches={int(d['mask'].sum())} "
          f"captured on {d['backend']}")

    base = PipelineConfig(
        sift=SiftConfig(max_pts_per_octave=1024),
        ransac=RansacConfig(n_hyps=1024, threshold=3e-6, chunk=256),
    )
    h2048 = dataclasses.replace(
        base, ransac=dataclasses.replace(base.ransac, n_hyps=2048))
    cfgs = {
        "base": base,
        "probe16": dataclasses.replace(base, probe_starts=16),
        "h2048": h2048,
        "tvote2": dataclasses.replace(base, tvote_rounds=2),
        "h2048_tvote0": dataclasses.replace(h2048, tvote_rounds=0),
        "h2048_it4_tvote0": dataclasses.replace(
            h2048, probe_iters=4, tvote_rounds=0),
        "h2048_p16_tvote0": dataclasses.replace(
            h2048, probe_starts=16, tvote_rounds=0),
        "h1536": dataclasses.replace(
            base, ransac=dataclasses.replace(base.ransac, n_hyps=1536)),
    }
    if args.only:
        names = args.only.split(",")
        cfgs = {k: v for k, v in cfgs.items() if k in names}

    for name, cfg in cfgs.items():
        rows = []
        for s in range(args.seeds):
            r = two_view.two_view_geometry(
                jax.random.PRNGKey(s), uv1, uv2, mask, K, cfg)
            rows.append((s, int(r.num_inliers), int(r.point_valid.sum()),
                         math.sqrt(float(r.reproj_err) / 2) * 2360.0))
        print(f"{name}: min_valid={min(v for _, _, v, _ in rows)} "
              f"max_px={max(p for *_, p in rows):.3f}", flush=True)
        for s, i, v, p in rows:
            flag = "  <-- BAD" if (v < 900 or p > 0.75) else ""
            print(f"  seed {s}: inliers={i} valid={v} px={p:.3f}{flag}",
                  flush=True)


if __name__ == "__main__":
    main()
