"""Select-stage variants on real detect maps (r5, VERDICT item 2).

The select tail (dense maps -> top-k candidates) measured 3.94 ms of
the 16.6 ms up_t2.0 extract.  This times select_from_maps variants on
the REAL octave maps (computed once, held as device arrays),
scan-chained:

  b32/b64/b128   _topk_2level block size at this workload
  bf16           level-1/2 sort keys cast to bf16 (halves sort data;
                 order changes only among near-ties)
  approx1        approx_max_k for the level-1 block ranking
  flat           single-level lax.top_k (baseline)

Usage: python tools/exp_select.py [--config up_t2.0] [--cpu]
"""

from __future__ import annotations

import dataclasses
import functools
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
    from sfm_tpu.sift import frontend, detect as detect_mod
    from sfm_tpu.utils.timing import measure_rtt

    img = jnp.asarray(load_gray("/root/reference/CudaSift/data/left.pgm"))
    cfg = SiftConfig(
        num_octaves=5, max_pts_per_octave=4096, sample_cap=16384,
        octave_caps=(4096, 4096, 2048, 1024, 512),
        thresh=2.0, up_scale=True, init_blur=1.0,
    )
    mats = frontend._mats_for(img.shape, cfg)
    atlas, dets = frontend._detect_stage(img, cfg, mats)
    # Re-derive the dense maps (the detect stage consumed them); run
    # detect_maps per octave once and keep resp/aux resident.
    from sfm_tpu.sift import pyramid
    from sfm_tpu.ops import pallas_detect

    interp = jax.default_backend() == "cpu"
    bases = pyramid.base_chain_pallas(img, cfg, interpret=interp) \
        if frontend._use_pallas_pyramid(cfg) else \
        pyramid.base_chain(img, cfg, mats if mats else None)
    maps = []
    for o in range(cfg.num_octaves):
        taps = pyramid.octave_kernel_bank(cfg, o)
        taps_t = tuple(tuple(float(v) for v in row) for row in np.asarray(taps))
        resp, aux = pallas_detect.detect_maps(
            bases[o], taps=taps_t, n_scales=cfg.num_scales,
            thresh=float(cfg.thresh), edge_limit=float(cfg.edge_limit),
            scale_gate=0.0, interpret=interp, lean=True,
        )
        maps.append((resp, aux))
    jax.block_until_ready(maps)
    print(f"maps ready: {[m[0].shape for m in maps]}", flush=True)

    def sel_2level(resp, K, block, bf16):
        flat = resp.reshape(-1)
        if bf16:
            flat = flat.astype(jnp.bfloat16)
        n = flat.shape[0]
        k = min(K, n)
        nb = n // block
        if k > nb or nb * block != n:
            s, i = jax.lax.top_k(flat, k)
            return s.astype(jnp.float32), i.astype(jnp.int32)
        blocks = flat.reshape(nb, block)
        bscore = jnp.max(blocks, axis=1)
        _, bidx = jax.lax.top_k(bscore, k)
        cand = blocks[bidx].reshape(-1)
        scores, ci = jax.lax.top_k(cand, k)
        fi = bidx[ci // block] * block + ci % block
        return scores.astype(jnp.float32), fi.astype(jnp.int32)

    def sel_approx1(resp, K, block):
        flat = resp.reshape(-1)
        n = flat.shape[0]
        k = min(K, n)
        nb = n // block
        if k > nb or nb * block != n:
            s, i = jax.lax.top_k(flat, k)
            return s, i.astype(jnp.int32)
        blocks = flat.reshape(nb, block)
        bscore = jnp.max(blocks, axis=1)
        _, bidx = jax.lax.approx_max_k(bscore, k, recall_target=0.99)
        cand = blocks[bidx].reshape(-1)
        scores, ci = jax.lax.top_k(cand, k)
        fi = bidx[ci // block] * block + ci % block
        return scores, fi.astype(jnp.int32)

    def sel_flat(resp, K):
        s, i = jax.lax.top_k(resp.reshape(-1), min(K, resp.size))
        return s, i.astype(jnp.int32)

    def make(fn):
        @jax.jit
        def run():
            tot = jnp.float32(0.0)
            cnt = jnp.int32(0)
            for resp, aux in maps:
                def body(c, _):
                    s, i = fn(resp + c)
                    return jnp.minimum(jnp.abs(s[0]), 0.0), (s, i)

                c, (s, i) = jax.lax.scan(body, jnp.float32(0.0), None,
                                         length=8)
                tot = tot + c + s[0, 0]
                cnt = cnt + jnp.sum(s[-1] > 0)
            return tot, cnt

        return run

    K = cfg.max_pts_per_octave
    variants = {
        "b32": make(lambda r: sel_2level(r, K, 32, False)),
        "b64": make(lambda r: sel_2level(r, K, 64, False)),
        "b128": make(lambda r: sel_2level(r, K, 128, False)),
        "b32_bf16": make(lambda r: sel_2level(r, K, 32, True)),
        "b64_bf16": make(lambda r: sel_2level(r, K, 64, True)),
        "approx1_b32": make(lambda r: sel_approx1(r, K, 32)),
        "flat": make(lambda r: sel_flat(r, K)),
    }
    counts = {}
    for name, fn in variants.items():
        t0 = time.time()
        tot, cnt = fn()
        jax.block_until_ready((tot, cnt))
        counts[name] = int(np.asarray(cnt))
        print(f"{name}: compile {time.time()-t0:.1f}s "
              f"candidates(last octave scan)={counts[name]}", flush=True)

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)
    best = {k: float("inf") for k in variants}
    for rep in range(4):
        for name, fn in variants.items():
            t0 = time.time()
            tot, cnt = fn()
            _ = float(tot)
            best[name] = min(
                best[name], max(0.0, (time.time() - t0) * 1000 - rtt) / 8
            )
            print(f"  rep {rep} {name}: {best[name]:.2f} ms", flush=True)
    print("--- summary (all-octave select, ms per rep) ---", flush=True)
    for name, ms in best.items():
        print(f"{name}: {ms:.2f}", flush=True)


if __name__ == "__main__":
    main()
