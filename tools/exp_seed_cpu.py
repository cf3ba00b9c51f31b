"""CPU seed study at the bench config (VERDICT r5 item 1).

Reproduces the BENCH_r04 seed-0 valid-points regression on CPU: since
the f32 geometry precision fix (NOTES_R4), CPU and device agree on the
selected basin, so the regression should reproduce here without
burning relay time.  Prints per-seed (matches, inliers, valid, px).

Usage: python tools/exp_seed_cpu.py [--seeds 8] [--only name,name]
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os
import sys
import time

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "tests"))
import _cpu  # noqa: F401  (tests/_cpu.py forces the CPU backend)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sfm_tpu.config import SiftConfig, PipelineConfig, RansacConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.models import two_view

    img1 = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
    img2 = jnp.asarray(load_gray("/root/reference/data/dino/viff.001.ppm"))
    h, w = img1.shape
    K = jnp.asarray(
        np.array([[2360.0, 0, w / 2], [0, 2360.0, h / 2], [0, 0, 1]],
                 np.float32)
    )
    base = PipelineConfig(
        sift=SiftConfig(max_pts_per_octave=1024),
        ransac=RansacConfig(n_hyps=1024, threshold=3e-6, chunk=256),
    )
    cfgs = {
        "base": base,
        "restart32": dataclasses.replace(base, restart_k=32),
        "tight0125": dataclasses.replace(base, score_tight_mult=0.125),
        "tvote2": dataclasses.replace(base, tvote_rounds=2),
        "h2048": dataclasses.replace(
            base, ransac=dataclasses.replace(base.ransac, n_hyps=2048)),
        # r5 probe-trim sweep: with the probe picking the basin, how
        # much of the rounds/tvote machinery is still needed?
        "rounds1": dataclasses.replace(base, refine_rounds=1),
        "rounds1_tvote0": dataclasses.replace(
            base, refine_rounds=1, tvote_rounds=0),
        "tvote0": dataclasses.replace(base, tvote_rounds=0),
        "probe4": dataclasses.replace(base, probe_starts=4),
        "probe4_it4": dataclasses.replace(
            base, probe_starts=4, probe_iters=4),
        "probe8_it4": dataclasses.replace(base, probe_iters=4),
        "probe16": dataclasses.replace(base, probe_starts=16),
        "probe0": dataclasses.replace(base, probe_starts=0),
    }
    # r5 bench config (h1536 + tvote0) + geometry-trim variants: the
    # geometry stage is 4.10 ms of the 7.56 ms pipeline (bench_stages);
    # refine_rounds x refine_iters serial GN is the biggest slice.
    b15 = dataclasses.replace(
        base, ransac=dataclasses.replace(base.ransac, n_hyps=1536),
        tvote_rounds=0)
    cfgs.update({
        "bench15": b15,
        "bench15_it8": dataclasses.replace(b15, refine_iters=8),
        "bench15_it6": dataclasses.replace(b15, refine_iters=6),
        "bench15_r1it10": dataclasses.replace(b15, refine_rounds=1),
        "bench15_r1it14": dataclasses.replace(
            b15, refine_rounds=1, refine_iters=14),
        "bench15_chunk512": dataclasses.replace(
            b15, ransac=dataclasses.replace(b15.ransac, chunk=512)),
    })
    if args.only:
        names = args.only.split(",")
        cfgs = {k: v for k, v in cfgs.items() if k in names}

    uv1, uv2, mask = two_view.frontend_stage(img1, img2, base)
    print(f"frontend: matches={int(mask.sum())}", flush=True)
    for name, cfg in cfgs.items():
        t0 = time.time()
        rows = []
        for s in range(args.seeds):
            r = two_view.two_view_geometry(
                jax.random.PRNGKey(s), uv1, uv2, mask, K, cfg)
            rows.append((s, int(r.num_matches), int(r.num_inliers),
                         int(r.point_valid.sum()),
                         math.sqrt(float(r.reproj_err) / 2) * 2360.0))
        worst_v = min(v for _, _, _, v, _ in rows)
        worst_px = max(p for *_, p in rows)
        print(f"{name} ({time.time()-t0:.0f}s): min_valid={worst_v} "
              f"max_px={worst_px:.3f}", flush=True)
        for s, m, i, v, p in rows:
            flag = "  <-- BAD" if (v < 900 or p > 0.75) else ""
            print(f"  seed {s}: matches={m} inliers={i} valid={v} "
                  f"px={p:.3f}{flag}", flush=True)


if __name__ == "__main__":
    main()
