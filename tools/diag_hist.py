"""Compare raw orientation histograms Pallas-vs-XLA on device.

Follow-up to tools/diag_parity.py: the descriptor divergence is fully
explained by orientation peak choice.  This isolates whether the
compiled Pallas histogram itself diverges from the XLA gather path, and
how close the contested peaks are (near-tie flips vs real error).
"""

from __future__ import annotations

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
    from sfm_tpu.sift import frontend, orient
    from sfm_tpu.ops import pallas_sample

    img = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
    cfg = SiftConfig(max_pts_per_octave=1024)

    # Detection is shared by both paths; reuse one extraction's keypoints.
    s = frontend.extract_sift(img, cfg)
    kp = s.keypoints
    v = np.array(kp.valid)
    idx = np.nonzero(v)[0][:512]
    x = jnp.asarray(np.array(kp.x)[idx])
    y = jnp.asarray(np.array(kp.y)[idx])
    sc = jnp.asarray(np.array(kp.scale)[idx])

    h_x = np.array(orient.orientation_histograms(img, x, y, sc))
    h_p = np.array(
        pallas_sample.orientation_histogram_sample(
            img, x, y, sc, count=jnp.asarray(len(idx), jnp.int32)
        )
    )
    # Histograms may differ by a constant scale (weights normalization);
    # compare normalized.
    nx = h_x / np.maximum(np.linalg.norm(h_x, axis=1, keepdims=True), 1e-12)
    npp = h_p / np.maximum(np.linalg.norm(h_p, axis=1, keepdims=True), 1e-12)
    d = np.abs(nx - npp).max(axis=1)
    print(f"normalized-hist maxdiff: med={np.median(d):.2e} p99={np.percentile(d,99):.2e} max={d.max():.2e}")

    # Peak analysis on the XLA histograms: how near-tied are the top-2
    # peaks (after smoothing) for keypoints where argmax flips?
    def smooth(h):
        for _ in range(6 // 2):
            h = (np.roll(h, 1, 1) + h + np.roll(h, -1, 1)) / 3.0
        return h

    sx, sp = smooth(nx), smooth(npp)
    flip = sx.argmax(1) != sp.argmax(1)
    print(f"argmax flips: {flip.sum()}/{len(d)}")
    if flip.sum():
        hx = np.sort(sx[flip], axis=1)
        ratio = hx[:, -2] / np.maximum(hx[:, -1], 1e-12)
        print(
            "top2/top1 ratio at flips: "
            f"min={ratio.min():.4f} med={np.median(ratio):.4f} max={ratio.max():.4f}"
        )
        hd = np.abs(sx[flip] - sp[flip]).max(1)
        print(f"smoothed-hist maxdiff at flips: med={np.median(hd):.2e} max={hd.max():.2e}")


if __name__ == "__main__":
    main()
