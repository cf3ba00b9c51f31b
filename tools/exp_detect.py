"""Scratch experiment: where does the detect stage's time go on TPU?

Variants timed amortized (see CLAUDE.md conventions):
  pyr     — pyramid only (matmul blur, all octaves)
  nms     — pyramid + extremum mask
  ref     — pyramid + dense refinement (no top-k)
  full    — current detect stage (exact top-k)
  approx  — detect with approx_max_k
  pixmax  — detect with per-pixel scale-max reduction before top-k
  batch2  — batched 2-image detect stage
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import functools

    from sfm_tpu.config import SiftConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.sift import frontend, pyramid, detect as detect_mod

    which = set(sys.argv[1:]) or {"all"}
    want = lambda n: "all" in which or n in which

    img1 = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
    img2 = jnp.asarray(load_gray("/root/reference/data/dino/viff.001.ppm"))
    jax.block_until_ready((img1, img2))
    cfg = SiftConfig(max_pts_per_octave=1024)

    one = jnp.float32(1.0) + 0.0
    float(np.asarray(one))
    rtt = 1e9
    for i in range(5):
        t0 = time.time()
        float(np.asarray(one + jnp.float32(i)))
        rtt = min(rtt, (time.time() - t0) * 1000)
    print(f"rtt ~ {rtt:.1f} ms", file=sys.stderr)

    def timeit(fn, label, n=10):
        t0 = time.time()
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(jnp.sum(leaf.reshape(-1)[:1])))
        print(f"{label}: compile {time.time()-t0:.1f}s", file=sys.stderr)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            outs = [fn() for _ in range(n)]
            acc = sum(
                jnp.sum(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:1])
                for o in outs
            )
            float(np.asarray(acc))
            best = min(best, max(0.0, (time.time() - t0) * 1000 - rtt) / n)
        print(f"{label}: {best:.2f} ms", flush=True)

    mats = frontend._mats_for(img1.shape, cfg)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def pyr_only(img, cfg, mats):
        octs = pyramid.build_pyramid(img, cfg, mats if mats else None)
        return [o.dog for o in octs]

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def pyr_ref(img, cfg, mats):
        octs = pyramid.build_pyramid(img, cfg, mats if mats else None)
        return [jnp.sum(detect_mod._refine_dense(o.dog, cfg.num_scales)[3]) for o in octs]

    if want("pyr"):
        timeit(lambda: pyr_only(img1, cfg, mats), "pyr")
    if want("ref"):
        timeit(lambda: pyr_ref(img1, cfg, mats), "pyr+refine")
    if want("full"):
        timeit(lambda: frontend._detect_stage(img1, cfg, mats), "full")
    if want("approx"):
        acfg = SiftConfig(max_pts_per_octave=1024, exact_topk=False)
        timeit(lambda: frontend._detect_stage(img1, acfg, mats), "approx")
    if want("batch2"):
        imgs = jnp.stack([img1, img2])
        timeit(lambda: frontend._detect_stage_batch(imgs, cfg, mats), "batch2", n=6)
    if want("sample"):
        offsets, subs = frontend.atlas_layout(img1.shape, cfg)
        atlas, dets = frontend._detect_stage(img1, cfg, mats)
        jax.block_until_ready((atlas, dets))
        timeit(lambda: frontend._sample_stage(atlas, offsets, subs, dets, cfg, True),
               "sample[fused]")
    if want("extract2"):
        timeit(lambda: (frontend.extract_sift(img1, cfg),
                        frontend.extract_sift(img2, cfg)), "extract2", n=6)


if __name__ == "__main__":
    main()
