"""Per-stage TPU benchmark for the dino-pair pipeline (dev tool).

Measures amortized stage times per the project measurement convention
(CLAUDE.md): chain N dispatches, sync once with a scalar D2H read,
subtract the measured relay RTT, divide by N.  Run ONE instance at a
time (relay congestion poisons timings).

Usage: python tools/bench_stages.py [stage ...]
  stages: detect detect_conv sample match geometry pipeline all
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync_scalar(x):
    return float(np.asarray(x).ravel()[0])


def measure(fn_chain, n=10, reps=3, rtt_ms=0.0):
    """fn_chain(n) must enqueue n dispatches and return one scalar-able."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn_chain(n)
        sync_scalar(out)
        best = min(best, max(0.0, (time.time() - t0) * 1000.0 - rtt_ms) / n)
    return best


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"compilation cache unavailable: {e}", file=sys.stderr)

    from sfm_tpu.config import SiftConfig, PipelineConfig, RansacConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.models import two_view
    from sfm_tpu.sift import frontend, match as match_mod

    which = set(sys.argv[1:]) or {"all"}

    def want(name):
        return "all" in which or name in which

    print(f"devices: {jax.devices()}", file=sys.stderr)
    img1 = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
    img2 = jnp.asarray(load_gray("/root/reference/data/dino/viff.001.ppm"))
    h, w = img1.shape
    K = jnp.asarray(
        np.array([[2360.0, 0, w / 2], [0, 2360.0, h / 2], [0, 0, 1]], np.float32)
    )
    # Keep in sync with bench.py's config so the stage table sums to
    # the headline number (r5: n_hyps=1536, tvote_rounds=0).
    cfg = PipelineConfig(
        sift=SiftConfig(max_pts_per_octave=1024),
        ransac=RansacConfig(n_hyps=1536, threshold=3e-6, chunk=256),
        tvote_rounds=0,
    )
    jax.block_until_ready((img1, img2, K))

    # RTT
    one = jnp.float32(1.0) + 0.0
    sync_scalar(one)
    rtt = min(
        measure(lambda n: one + jnp.float32(i), n=1, reps=1) for i in range(5)
    )
    print(f"rtt ~ {rtt:.1f} ms", file=sys.stderr)

    def chain_stage(fn, label, n=10):
        """Compile once, then time n chained dispatches."""
        t0 = time.time()
        out = fn()
        sync_scalar(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1]))
        print(f"{label}: compile+first {time.time()-t0:.1f} s", file=sys.stderr)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = [fn() for _ in range(n)]
            acc = sum(
                jnp.sum(jax.tree_util.tree_leaves(o)[0][:1]) for o in outs
            )
            sync_scalar(acc)
            best = min(best, max(0.0, (time.time() - t0) * 1000 - rtt) / n)
        print(f"{label}: {best:.2f} ms", flush=True)
        return best

    if want("detect") or want("detect_conv"):
        for mode, name in (
            (True, "detect[matmul]"),
            (False, "detect[conv]"),
        ):
            if not (want("detect") if mode else want("detect_conv")):
                continue
            scfg = SiftConfig(max_pts_per_octave=1024, blur_matmul=mode)
            # NOTE: mats must be passed explicitly — without them the
            # stage silently runs the grouped-conv path regardless of
            # blur_matmul (that bug made both rows read ~48 ms).
            mats = frontend._mats_for(img1.shape, scfg)
            chain_stage(
                lambda scfg=scfg, mats=mats: frontend._detect_stage(
                    img1, scfg, mats
                ),
                name,
            )

    if want("sample"):
        scfg = SiftConfig(max_pts_per_octave=1024)
        offsets, subs = frontend.atlas_layout(img1.shape, scfg)
        atlas, dets = frontend._detect_stage(
            img1, scfg, frontend._mats_for(img1.shape, scfg)
        )
        jax.block_until_ready((atlas, dets))
        chain_stage(
            lambda: frontend._sample_stage(
                atlas, offsets, subs, dets, scfg, True
            ).descriptors,
            "sample[pallas]",
        )

    if want("match"):
        s1 = frontend.extract_sift(img1, cfg.sift)
        s2 = frontend.extract_sift(img2, cfg.sift)
        jax.block_until_ready((s1, s2))
        chain_stage(
            lambda: two_view._match_stage(s1, s2, cfg)[0], "match+gather"
        )

    if want("geometry"):
        s1 = frontend.extract_sift(img1, cfg.sift)
        s2 = frontend.extract_sift(img2, cfg.sift)
        key = jax.random.PRNGKey(0)
        # A/B: correspondence compaction cap vs full keypoint capacity.
        import dataclasses as _dc

        for label, c in (
            ("geometry[cap]", cfg),
            ("geometry[full]", _dc.replace(cfg, geometry_cap=0)),
        ):
            uv1, uv2, mask = two_view._match_stage(s1, s2, c)
            jax.block_until_ready((uv1, uv2, mask))
            chain_stage(
                lambda c=c, uv1=uv1, uv2=uv2, mask=mask: two_view.two_view_geometry(
                    key, uv1, uv2, mask, K, c
                ).points,
                label,
            )

    if want("pipeline"):
        keys = [jax.random.PRNGKey(i) for i in range(16)]
        n = 10
        t0 = time.time()
        r = two_view.two_view_pipeline(img1, img2, K, keys[0], cfg)
        sync_scalar(r.reproj_err)
        print(f"pipeline: compile+first {time.time()-t0:.1f} s", file=sys.stderr)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = [
                two_view.two_view_pipeline(img1, img2, K, keys[i % 16], cfg).reproj_err
                for i in range(n)
            ]
            sync_scalar(sum(outs))
            best = min(best, max(0.0, (time.time() - t0) * 1000 - rtt) / n)
        print(f"pipeline: {best:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
