"""Diagnose the on-device Pallas-vs-XLA sampling divergence.

bench.py's parity probe showed ~17% of descriptors with corr < 0.999
and orientation diffs up to 180 deg between the Mosaic-compiled
sampling kernels and the XLA gather path.  Two hypotheses:

  (a) benign: tiny numeric differences flip the orientation-histogram
      argmax between near-equal peaks; the descriptor is then sampled
      in a rotated frame and legitimately differs.
  (b) real: the compiled kernel's histograms/descriptors diverge even
      at matching orientations.

This script conditions the descriptor comparison on orientation
agreement and reports the peak ratio (2nd/1st histogram peak) of the
disagreeing keypoints.
"""

from __future__ import annotations

import dataclasses
import os
import sys

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

    from sfm_tpu.config import SiftConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.sift import frontend

    img = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
    cfg = SiftConfig(max_pts_per_octave=1024)

    s_p = frontend.extract_sift(img, cfg)
    s_x = frontend.extract_sift(img, dataclasses.replace(cfg, use_pallas=False))

    v = np.array(s_p.keypoints.valid) & np.array(s_x.keypoints.valid)
    dp = np.array(s_p.descriptors)[v]
    dx = np.array(s_x.descriptors)[v]
    op = np.array(s_p.keypoints.orientation)[v]
    ox = np.array(s_x.keypoints.orientation)[v]
    corr = (dp * dx).sum(1)
    ori_d = np.abs((op - ox + 180.0) % 360.0 - 180.0)

    agree = ori_d < 1.0
    print(f"n={v.sum()}  ori_agree(<1deg)={agree.mean():.4f}")
    for name, m in [("ori agree", agree), ("ori DISagree", ~agree)]:
        if m.sum() == 0:
            print(f"[{name}] none")
            continue
        c = corr[m]
        print(
            f"[{name}] n={m.sum()} corr min={c.min():.5f} "
            f"p1={np.percentile(c, 1):.5f} med={np.median(c):.5f} "
            f"frac>0.999={(c > 0.999).mean():.4f}"
        )

    # Among ori-agreeing but low-corr keypoints, look at positions/scales
    bad = agree & (corr < 0.999)
    if bad.sum():
        xs = np.array(s_p.keypoints.x)[v][bad]
        ys = np.array(s_p.keypoints.y)[v][bad]
        ss = np.array(s_p.keypoints.scale)[v][bad]
        cc = corr[bad]
        order = np.argsort(cc)[:10]
        print("worst ori-agreeing keypoints (x, y, scale, corr):")
        for i in order:
            print(f"  {xs[i]:8.2f} {ys[i]:8.2f} {ss[i]:7.3f} {cc[i]:.5f}")


if __name__ == "__main__":
    main()
