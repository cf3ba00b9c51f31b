"""Device A/B: top-k prefilter block size + polyphase pyramid (dev tool).

Scan-chained (see exp_scan_extract.py) timings of the full detect
stage at a given config for several _topk_2level block sizes, plus the
bases-only prefix to validate the polyphase scale_down rewrite.

Usage: python tools/exp_topk.py [--config up_t2.0|dino] [--cpu]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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

    from sfm_tpu.config import SiftConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.sift import frontend, pyramid
    from sfm_tpu.utils.timing import measure_rtt

    which = "up_t2.0"
    for a in sys.argv:
        if a.startswith("--config="):
            which = a.split("=", 1)[1]

    if which == "dino":
        img = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
        base_cfg = SiftConfig(max_pts_per_octave=1024)
    else:
        img = jnp.asarray(load_gray("/root/reference/CudaSift/data/left.pgm"))
        up = which.startswith("up")
        thresh = float(which.split("_t", 1)[1])
        base_cfg = SiftConfig(
            num_octaves=5, max_pts_per_octave=4096, sample_cap=16384,
            thresh=thresh, up_scale=up,
        )
    interp = jax.default_backend() == "cpu"
    NSCAN = 8

    def scanner(fn):
        @jax.jit
        def scanN(img_):
            def body(c, _):
                r = fn(img_ + c)
                return jnp.minimum(jnp.abs(r), 0.0), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=NSCAN)
            return c

        return scanN

    def f_bases(img_):
        bases = pyramid.base_chain_pallas(img_, base_cfg, interpret=interp)
        return sum(jnp.sum(b[:1, :1]) for b in bases)

    def detect_for(cfg):
        mats = frontend._mats_for(img.shape, cfg)

        def f(img_):
            atlas, dets = frontend._detect_impl(img_, cfg, mats)
            return jnp.sum(atlas[:1, :1]) + sum(jnp.sum(d.x[:1]) for d in dets)

        return f

    variants = {"bases": scanner(f_bases)}
    counts = {}
    for name, kw in (("b16", dict(topk_block=16)),
                     ("b32", dict(topk_block=32)),
                     ("b64", dict(topk_block=64))):
        cfg = dataclasses.replace(base_cfg, **kw)
        variants[f"detect_{name}"] = scanner(detect_for(cfg))
        r = frontend.extract_sift(img, cfg)
        counts[f"detect_{name}"] = int(np.asarray(jnp.sum(r.keypoints.valid)))

    for name, fn in variants.items():
        t0 = time.time()
        _ = float(np.asarray(fn(img)))
        print(f"{name}: compile+first {time.time()-t0:.1f}s "
              f"feats {counts.get(name, '-')}", flush=True)

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)
    best = {k: float("inf") for k in variants}
    for rep in range(4):
        for name, fn in variants.items():
            t0 = time.time()
            _ = float(np.asarray(fn(img)))
            best[name] = min(
                best[name],
                max(0.0, (time.time() - t0) * 1000 - rtt) / NSCAN,
            )
            print(f"  rep {rep} {name}: {best[name]:.2f} ms", flush=True)
    print("--- summary ---", flush=True)
    for name in variants:
        print(f"{name}: {best[name]:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
