"""Capture the device's compacted match set for offline geometry replay.

Runs frontend_stage at the bench config on the CURRENT backend and
saves (uv1, uv2, mask, K) to an npz.  Replay with
tools/replay_geometry.py on CPU to separate frontend differences from
geometry numerics (the r4 bf16 root-cause methodology, NOTES_R4).

Usage: python tools/capture_matches.py [--out /tmp/matches.npz] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/matches_device.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
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

    from sfm_tpu.config import SiftConfig, PipelineConfig, RansacConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.models import two_view

    img1 = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
    img2 = jnp.asarray(load_gray("/root/reference/data/dino/viff.001.ppm"))
    h, w = img1.shape
    K = np.array([[2360.0, 0, w / 2], [0, 2360.0, h / 2], [0, 0, 1]],
                 np.float32)
    cfg = PipelineConfig(
        sift=SiftConfig(max_pts_per_octave=1024),
        ransac=RansacConfig(n_hyps=1024, threshold=3e-6, chunk=256),
    )
    uv1, uv2, mask = two_view.frontend_stage(img1, img2, cfg)
    np.savez(args.out, uv1=np.asarray(uv1), uv2=np.asarray(uv2),
             mask=np.asarray(mask), K=K,
             backend=jax.default_backend())
    print(f"saved {args.out}: matches={int(np.asarray(mask).sum())} "
          f"backend={jax.default_backend()}")


if __name__ == "__main__":
    main()
