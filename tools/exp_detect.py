"""Scratch experiment: where does the detect stage's time go on TPU?

Variants timed amortized (see CLAUDE.md conventions):
  pyr     — pyramid only (matmul blur, all octaves)
  nms     — pyramid + extremum mask
  ref     — pyramid + dense refinement (no top-k)
  full    — current detect stage (exact top-k)
  approx  — detect with approx_max_k
  pixmax  — detect with per-pixel scale-max reduction before top-k
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

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sfm_tpu.config import SiftConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.sift import frontend, pyramid, detect as detect_mod

    which = set(a for a in sys.argv[1:] if not a.startswith("--")) or {"all"}
    want = lambda n: "all" in which or n in which

    # --config=up_t2.0 etc. switches to the 1280x960 stereo fixture at
    # the high-capacity class (cf. tools/bench_extract.py); default is
    # the dino pipeline config.
    config = "dino"
    for a in sys.argv:
        if a.startswith("--config="):
            config = a.split("=", 1)[1]
    # fused_detect pinned OFF for the base cfg: every non-"fused"
    # variant here measures the XLA banded-matmul path (the knob is
    # auto-ON for TPU since r3, so the default would silently flip
    # both A/B arms to the kernel).
    if config == "dino":
        img1 = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
        img2 = jnp.asarray(load_gray("/root/reference/data/dino/viff.001.ppm"))
        cfg = SiftConfig(max_pts_per_octave=1024, fused_detect=False)
    else:
        img1 = jnp.asarray(load_gray("/root/reference/CudaSift/data/left.pgm"))
        img2 = jnp.asarray(load_gray("/root/reference/CudaSift/data/righ.pgm"))
        cfg = SiftConfig(
            num_octaves=5, max_pts_per_octave=4096, sample_cap=16384,
            thresh=float(config.split("_t", 1)[1]),
            up_scale=config.startswith("up"), fused_detect=False,
        )
    jax.block_until_ready((img1, img2))

    from sfm_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()
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

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def pyr_nms(img, cfg, mats):
        octs = pyramid.build_pyramid(img, cfg, mats if mats else None)
        outs = []
        for o in octs:
            c, mx, mn = detect_mod._neighbor_extrema(o.dog, cfg.num_scales)
            outs.append(jnp.sum(((c > mx) | (c < mn)).astype(jnp.int32)))
        return outs

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def pyr_topk(img, cfg, mats):
        # pyramid + per-octave top_k over |center| (no NMS/refine): the
        # selection cost in isolation.
        octs = pyramid.build_pyramid(img, cfg, mats if mats else None)
        outs = []
        for o in octs:
            resp = jnp.max(jnp.abs(o.dog[1:-1]), axis=0).reshape(-1)
            k = min(cfg.max_pts_per_octave, resp.shape[0])
            outs.append(jax.lax.top_k(resp, k)[0][0])
        return outs

    if want("pyr"):
        timeit(lambda: pyr_only(img1, cfg, mats), "pyr")
    if want("nms"):
        timeit(lambda: pyr_nms(img1, cfg, mats), "pyr+nms")
    if want("topk"):
        timeit(lambda: pyr_topk(img1, cfg, mats), "pyr+topk")
    if want("ref"):
        timeit(lambda: pyr_ref(img1, cfg, mats), "pyr+refine")
    if want("full"):
        timeit(lambda: frontend._detect_stage(img1, cfg, mats), "full")
    if want("fused"):
        import dataclasses as _dc

        fcfg = _dc.replace(cfg, fused_detect=True)
        fmats = frontend._mats_for(img1.shape, fcfg)
        timeit(lambda: frontend._detect_stage(img1, fcfg, fmats), "fused")
        r_f = frontend._detect_stage(img1, fcfg, fmats)
        r_x = frontend._detect_stage(img1, cfg, mats)
        nf = sum(int(np.asarray(jnp.sum(d.valid))) for d in r_f[1])
        nx = sum(int(np.asarray(jnp.sum(d.valid))) for d in r_x[1])
        print(f"fused detections {nf} vs xla {nx}", flush=True)
    if want("approx"):
        import dataclasses as _dc

        acfg = _dc.replace(cfg, select="approx")
        timeit(lambda: frontend._detect_stage(img1, acfg, mats), "approx")
    if want("compact"):
        import dataclasses as _dc

        ccfg = _dc.replace(cfg, select="compact")
        timeit(lambda: frontend._detect_stage(img1, ccfg, mats), "compact")
    if want("prec"):
        # Matmul-blur precision ladder (MXU passes: bf16=1, f32=6-ish).
        for prec in ("BF16_BF16_F32_X3", "float32"):
            with jax.default_matmul_precision(prec):
                timeit(lambda: pyr_only(img1, cfg, mats), f"pyr[{prec}]")
    if want("sample"):
        import dataclasses as _dc

        offsets, subs = frontend.atlas_layout(img1.shape, cfg)
        atlas, dets = frontend._detect_stage(img1, cfg, mats)
        jax.block_until_ready((atlas, dets))
        for cap in (0, 2048, 1024):
            c = _dc.replace(cfg, sample_cap=cap)
            timeit(
                lambda c=c: frontend._sample_stage(
                    atlas, offsets, subs, dets, c, True
                ),
                f"sample[cap={cap or 'off'}]",
            )
    if want("extract2"):
        timeit(lambda: (frontend.extract_sift(img1, cfg),
                        frontend.extract_sift(img2, cfg)), "extract2", n=6)
    if want("scaling"):
        # Pyramid cost vs octave count: linear-in-octaves => fixed
        # per-op overhead dominates (small octaves cost like big ones).
        for no in (1, 2, 3, 5):
            c = SiftConfig(max_pts_per_octave=1024, num_octaves=no)
            m = frontend._mats_for(img1.shape, c)
            timeit(lambda c=c, m=m: pyr_only(img1, c, m), f"pyr[oct={no}]")
        # Raw octave-0 matmul pair (the irreducible MXU work).
        Bc, Br = mats[0][:2]
        @jax.jit
        def raw(img):
            t = jnp.einsum("bij,jw->biw", Bc, img)
            return jnp.einsum("bhw,bxw->bhx", t, Br)
        timeit(lambda: raw(img1), "raw-oct0-matmuls")
        # And the scale_down chain alone.
        @functools.partial(jax.jit, static_argnames=("no",))
        def sd_chain(img, no):
            outs = [img]
            for _ in range(no - 1):
                outs.append(pyramid.imops.scale_down(outs[-1], 0.5)
                            if hasattr(pyramid, "imops") else None)
            return outs[-1]
        from sfm_tpu.ops import image as imops
        @jax.jit
        def sd4(img):
            x = img
            for _ in range(4):
                x = imops.scale_down(x, 0.5)
            return x
        timeit(lambda: sd4(img1), "scaledown-chain")
    if want("quality"):
        # TPU-vs-reference sanity: keypoint counts along the real paths.
        for name, c in (
            ("matmul+pallas", cfg),
            ("conv+pallas", SiftConfig(max_pts_per_octave=1024, blur_matmul=False)),
        ):
            r = frontend.extract_sift(img1, c)
            print(f"quality[{name}]: {int(np.asarray(r.keypoints.valid).sum())} kps",
                  flush=True)


if __name__ == "__main__":
    main()
