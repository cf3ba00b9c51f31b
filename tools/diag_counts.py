"""Per-octave detection-count diagnostic (VERDICT r5 item 3).

At noup_t2.0 we find 4990 features on left.pgm where the reference's
published %Matches implies ~6296 (README.md:111-122) — this breaks the
count into per-octave detections, duplicates, and cap bindings so the
missing ~1.3k can be localized (cap binding vs NMS semantics vs border
handling vs duplicate threshold).

Usage: python tools/diag_counts.py [--thresh 2.0] [--up]
"""

from __future__ import annotations

import argparse
import os
import sys

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "tests"))
import _cpu  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--thresh", type=float, default=2.0)
    ap.add_argument("--init-blur", type=float, default=1.0,
                    help="mainSift.cpp:59 uses 1.0 for the README tables "
                    "(the SfM app uses 1.5, src/main.cpp:269)")
    ap.add_argument("--up", action="store_true")
    ap.add_argument("--img",
                    default="/root/reference/CudaSift/data/left.pgm")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from sfm_tpu.config import SiftConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.sift import frontend

    img = jnp.asarray(load_gray(args.img))
    cfg = SiftConfig(
        num_octaves=5,
        max_pts_per_octave=4096,
        sample_cap=16384,
        thresh=args.thresh,
        init_blur=args.init_blur,
        up_scale=args.up,
    )
    atlas, dets = frontend._detect_stage(
        img, cfg, frontend._mats_for(img.shape, cfg))
    total = 0
    for o, d in enumerate(dets):
        n = int(np.asarray(d.valid.sum()))
        cap = d.valid.shape[0]
        total += n
        flag = "  <-- CAP BINDS" if n == cap else ""
        print(f"octave {o}: detections={n} / cap {cap}{flag}", flush=True)
    print(f"total detections: {total}")

    res = frontend.extract_sift(img, cfg)
    kp = res.keypoints
    nv = int(np.asarray(kp.valid.sum()))
    print(f"final features (with duplicates): {nv} "
          f"(duplicates: {nv - min(total, cfg.sample_cap or 10**9)})")
    v = np.asarray(kp.valid)
    oc = np.asarray(kp.octave)[v]
    for o in range(cfg.num_octaves):
        print(f"  octave {o}: final={int((oc == o).sum())}")


if __name__ == "__main__":
    main()
