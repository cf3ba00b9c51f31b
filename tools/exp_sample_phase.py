"""Phase breakdown of the fused sampling kernel on device (dev tool).

Times fused_orient_descriptor with its static `phases` truncation
(1 = patch loads/rolls + orientation tent dots, 2 = + orientation
post & dual peaks, 3 = + descriptor tent dots, 4 = full kernel incl.
descriptor post), scan-chained in one program per variant (see
exp_scan_extract.py for why).  Deltas between consecutive phases are
per-phase device time in the REAL kernel layout — an earlier
standalone probe mirrored the kernel by hand and OOM'd scoped VMEM.

Usage: python tools/exp_sample_phase.py [--config up_t2.0|dino] [--cpu]
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
    from sfm_tpu.sift import frontend
    from sfm_tpu.ops import pallas_sample
    from sfm_tpu.ops.compact import compaction_order
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
    interp = jax.default_backend() == "cpu"

    # Build the sampling-kernel inputs exactly as _sample_stage does.
    mats = frontend._mats_for(img.shape, cfg)
    atlas, dets = frontend._detect_stage(img, cfg, mats)
    x_a = jnp.concatenate([d.x for d in dets])
    y_a = jnp.concatenate([d.y for d in dets])
    sc_a = jnp.concatenate([d.scale for d in dets])
    sharp_a = jnp.concatenate([d.sharpness for d in dets])
    valid_a = jnp.concatenate([d.valid for d in dets])
    cap = cfg.sample_cap
    if cap and cap < valid_a.shape[0]:
        strength = jnp.where(valid_a, jnp.abs(sharp_a), -1.0)
        _, order = jax.lax.top_k(strength, cap)
        order = order.astype(jnp.int32)
    else:
        order = compaction_order(valid_a)
    x_a, y_a, sc_a, valid_a = (a[order] for a in (x_a, y_a, sc_a, valid_a))
    count = jnp.sum(valid_a, dtype=jnp.int32)
    print(f"{which}: atlas {atlas.shape}, {int(np.asarray(count))} keypoints "
          f"in {x_a.shape[0]} slots", flush=True)
    jax.block_until_ready((atlas, x_a, y_a, sc_a))

    # The kernel cannot be jitted standalone (the 43 MB atlas operand
    # OOMs scoped VMEM outside the production program shape), so each
    # phase runs through the REAL _sample_stage program via the
    # SiftConfig.sample_phases debug knob, chained-dispatch timed
    # (clean-process dispatch tax ~0.2-0.4 ms, exp_scan_extract).
    offsets_l, subs_l = frontend.atlas_layout(img.shape, cfg)
    use_pallas = frontend._use_pallas(cfg)
    NSCAN = 8

    def runner(p):
        cfg_p = dataclasses.replace(cfg, sample_phases=p)

        def run():
            return frontend._sample_stage(atlas, offsets_l, subs_l, dets,
                                          cfg_p, use_pallas)

        return run

    variants = {f"phase{p}": runner(p) for p in (-1, 0, 1, 2, 3, 4, 5)}
    for name, fn in variants.items():
        t0 = time.time()
        jax.block_until_ready(fn())
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)
    best = {k: float("inf") for k in variants}
    for rep in range(4):
        for name, fn in variants.items():
            t0 = time.time()
            outs = [fn() for _ in range(NSCAN)]
            _ = float(sum(jnp.sum(o.descriptors[:1, :1]) for o in outs))
            best[name] = min(
                best[name],
                max(0.0, (time.time() - t0) * 1000 - rtt) / NSCAN,
            )
            print(f"  rep {rep} {name}: {best[name]:.2f} ms", flush=True)
    print("--- kernel phases (cumulative) ---", flush=True)
    prev = 0.0
    for name in variants:
        print(f"{name}: {best[name]:.2f} ms (delta {best[name]-prev:+.2f})",
              flush=True)
        prev = best[name]


if __name__ == "__main__":
    main()
