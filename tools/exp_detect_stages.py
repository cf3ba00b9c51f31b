"""Sub-stage breakdown of extraction on device, scan-chained (dev tool).

Each cumulative prefix of the extraction pipeline is timed as a
lax.scan of NSCAN serialized reps inside ONE XLA program (the
methodology validated by tools/exp_scan_extract.py: per-dispatch relay
tax is ~0.2 ms, but per-PROCESS congestion can inflate chained-dispatch
walls arbitrarily, so cross-call decompositions are unreliable).
Prefixes:

  bases   pyramid base chain (Pallas blur/decimate on TPU)
  atlas   + _build_atlas packing
  maps    + pallas detect_maps per octave (no selection)
  select  + select_from_maps top-k tail  (== the full detect stage)
  extract + sampling stage               (== full extract_sift)

Deltas between consecutive rows are per-stage device time.

Usage: python tools/exp_detect_stages.py [--config up_t2.0|dino] [--cpu]
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
    from sfm_tpu.sift import frontend, pyramid, detect as detect_mod
    from sfm_tpu.ops import pallas_detect
    from sfm_tpu.utils.timing import measure_rtt

    which = "up_t2.0"
    for a in sys.argv:
        if a.startswith("--config="):
            which = a.split("=", 1)[1]

    if which == "dino":
        img = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
        cfg = SiftConfig(max_pts_per_octave=1024)
    else:
        img = jnp.asarray(load_gray("/root/reference/CudaSift/data/left.pgm"))
        up = which.startswith("up")
        thresh = float(which.split("_t", 1)[1])
        cfg = SiftConfig(
            num_octaves=5, max_pts_per_octave=4096, sample_cap=16384,
            octave_caps=(4096, 4096, 2048, 1024, 512),
            thresh=thresh, up_scale=up,
            init_blur=1.0,  # mainSift.cpp:59 — the published tables' config
        )
    cfg = dataclasses.replace(cfg, fused_detect=True)
    mats = frontend._mats_for(img.shape, cfg)
    interp = jax.default_backend() == "cpu"
    use_pp = frontend._use_pallas_pyramid(cfg)
    use_pallas = frontend._use_pallas(cfg)
    offsets_l, subs_l = frontend.atlas_layout(img.shape, cfg)

    def chain(img_):
        if use_pp:
            return pyramid.base_chain_pallas(img_, cfg, interpret=interp)
        return pyramid.base_chain(img_, cfg, mats if mats else None)

    def f_bases(img_):
        return chain(img_)[0]

    def f_atlas(img_):
        return frontend._build_atlas(chain(img_))[0]

    def all_maps(img_):
        bases = chain(img_)
        atlas, offsets = frontend._build_atlas(bases)
        outs = []
        for o in range(len(offsets)):
            taps = pyramid.octave_kernel_bank(cfg, o)
            taps_t = tuple(
                tuple(float(v) for v in row) for row in np.asarray(taps)
            )
            outs.append(pallas_detect.detect_maps(
                bases[o], taps=taps_t, n_scales=cfg.num_scales,
                thresh=float(cfg.thresh),
                edge_limit=float(cfg.edge_limit), scale_gate=0.0,
                interpret=interp, lean=cfg.detect_lean,
            ))
        return atlas, outs

    def f_maps(img_):
        atlas, outs = all_maps(img_)
        return sum(jnp.sum(r[:1, :1]) for r, _ in outs) + jnp.sum(atlas[:1, :1])

    def f_select(img_):
        atlas, dets = frontend._detect_impl(img_, cfg, mats)
        return jnp.sum(atlas[:1, :1]) + sum(jnp.sum(d.x[:1]) for d in dets)

    def f_extract(img_):
        atlas, dets = frontend._detect_impl(img_, cfg, mats)
        r = frontend._sample_stage(atlas, offsets_l, subs_l, dets, cfg,
                                   use_pallas)
        return jnp.sum(r.descriptors[0, :1])

    def to_scalar(out):
        x = out
        while isinstance(x, (tuple, list)):
            x = x[0]
        if x.ndim == 0:
            return x
        return jnp.sum(x[:1, :1]) if x.ndim >= 2 else jnp.sum(x[:1])

    NSCAN = 8

    def scanner(fn):
        @jax.jit
        def scanN(img_):
            def body(c, _):
                r = fn(img_ + c)
                return jnp.minimum(jnp.abs(to_scalar(r)), 0.0), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=NSCAN)
            return c

        return scanN

    variants = {
        "bases": scanner(f_bases),
        "atlas": scanner(f_atlas),
        "maps": scanner(f_maps),
        "select": scanner(f_select),
        "extract": scanner(f_extract),
    }
    for name, fn in variants.items():
        t0 = time.time()
        _ = float(np.asarray(fn(img)))
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)

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
    print("--- sub-stages (cumulative, per rep) ---", flush=True)
    prev = 0.0
    for name in variants:
        print(f"{name}: {best[name]:.2f} ms  (delta {best[name]-prev:+.2f})",
              flush=True)
        prev = best[name]


if __name__ == "__main__":
    main()
