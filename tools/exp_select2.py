"""Select-tail decomposition: top-k vs aux gathers vs page_atlas (r5).

exp_select measured the pure 2-level top-k at 0.79 ms all-octave while
the detect-stage decomposition charges ~3.9 ms to the select delta —
the rest must be the [11, H*W] aux gathers (jnp.take of 45k random
scalars per octave), the post-top-k refine_from_coeffs, and
page_atlas.  Times each piece scan-chained on real maps.

Usage: python tools/exp_select2.py [--cpu]
"""

from __future__ import annotations

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
    from sfm_tpu.sift import frontend, detect as detect_mod, pyramid
    from sfm_tpu.ops import pallas_detect, pallas_sample
    from sfm_tpu.utils.timing import measure_rtt

    img = jnp.asarray(load_gray("/root/reference/CudaSift/data/left.pgm"))
    cfg = SiftConfig(
        num_octaves=5, max_pts_per_octave=4096, sample_cap=16384,
        octave_caps=(4096, 4096, 2048, 1024, 512),
        thresh=2.0, up_scale=True, init_blur=1.0,
    )
    interp = jax.default_backend() == "cpu"
    mats = frontend._mats_for(img.shape, cfg)
    bases = pyramid.base_chain_pallas(img, cfg, interpret=interp) \
        if frontend._use_pallas_pyramid(cfg) else \
        pyramid.base_chain(img, cfg, mats if mats else None)
    atlas_raw, _ = frontend._build_atlas(bases)
    maps = []
    for o in range(cfg.num_octaves):
        taps = pyramid.octave_kernel_bank(cfg, o)
        taps_t = tuple(tuple(float(v) for v in row) for row in np.asarray(taps))
        maps.append(pallas_detect.detect_maps(
            bases[o], taps=taps_t, n_scales=cfg.num_scales,
            thresh=float(cfg.thresh), edge_limit=float(cfg.edge_limit),
            scale_gate=0.0, interpret=interp, lean=True,
        ))
    jax.block_until_ready((atlas_raw, maps))
    print("maps ready", flush=True)

    def scan8(fn):
        # maps/atlas must flow in as ARGUMENTS: closure-captured device
        # arrays are baked into the HLO as literals (the 236 MB aux
        # constant blew the remote-compile request: HTTP 413).
        @jax.jit
        def run_(maps_, atlas_):
            def body(c, _):
                out = fn(c, maps_, atlas_)
                return jnp.minimum(jnp.abs(out), 0.0), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=8)
            return c

        return lambda: run_(maps, atlas_raw)

    def topk_only(c, maps_, atlas_):
        tot = jnp.float32(0.0)
        for resp, aux in maps_:
            s, i = detect_mod._topk_2level(
                (resp + c).reshape(-1), cfg.max_pts_per_octave,
                block=cfg.topk_block)
            tot = tot + s[0] + i[0]
        return tot

    def full_select(c, maps_, atlas_):
        tot = jnp.float32(0.0)
        for resp, aux in maps_:
            d = detect_mod.select_from_maps(resp + c, aux, cfg)
            tot = tot + d.x[0] + d.sharpness[0]
        return tot

    def gathers_only(c, maps_, atlas_):
        tot = jnp.float32(0.0)
        for resp, aux in maps_:
            s, idx = detect_mod._topk_2level(
                (resp + c).reshape(-1), cfg.max_pts_per_octave,
                block=cfg.topk_block)
            nc = aux.shape[0]
            vals = jnp.take(aux.reshape(nc, -1), idx, axis=1)
            tot = tot + jnp.sum(vals[:, 0])
        return tot

    def page_only(c, maps_, atlas_):
        a = pallas_sample.page_atlas(atlas_ + c)
        return jnp.sum(a[0, 0, :1])

    def gathers_sorted(c, maps_, atlas_):
        # Sort the indices before the big gather (HBM locality), unsort
        # the result on the small [11, K] array.
        tot = jnp.float32(0.0)
        for resp, aux in maps_:
            s, idx = detect_mod._topk_2level(
                (resp + c).reshape(-1), cfg.max_pts_per_octave,
                block=cfg.topk_block)
            nc = aux.shape[0]
            order = jnp.argsort(idx)
            vals_s = jnp.take(aux.reshape(nc, -1), idx[order], axis=1)
            inv = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0], dtype=order.dtype))
            vals = jnp.take(vals_s, inv, axis=1)
            tot = tot + jnp.sum(vals[:, 0])
        return tot

    def gathers_blockmm(c, maps_, atlas_):
        # Two-level extraction: gather whole 32-wide aux BLOCK rows
        # (large contiguous slices), then extract the within-block
        # element with a one-hot matmul + strided fold — no scalar
        # gathers at all after the block gather.
        tot = jnp.float32(0.0)
        block = cfg.topk_block
        for resp, aux in maps_:
            flat = (resp + c).reshape(-1)
            n = flat.shape[0]
            k = min(cfg.max_pts_per_octave, n)
            nb = n // block
            nc = aux.shape[0]
            if k > nb or nb * block != n:
                s2, idx2 = jax.lax.top_k(flat, k)
                vals2 = jnp.take(aux.reshape(nc, -1), idx2, axis=1)
                tot = tot + jnp.sum(vals2[:, 0]) + s2[0]
                continue
            blocks = flat.reshape(nb, block)
            bscore = jnp.max(blocks, axis=1)
            _, bidx = jax.lax.top_k(bscore, k)
            cand = blocks[bidx].reshape(-1)
            scores, ci = jax.lax.top_k(cand, k)
            rj = ci // block
            cj = ci % block
            auxb = jnp.take(
                aux.reshape(nc, nb, block), bidx, axis=1
            )  # [nc, k, block] contiguous block rows
            # One-hot row-selection matmul: G[j, r] = (r == rj[j]).
            G = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
                 == rj[:, None]).astype(jnp.float32)
            sel_rows = jnp.einsum(
                "jr,crb->cjb", G, auxb,
                precision=jax.lax.Precision.HIGHEST,
            )  # [nc, k, block]
            colmask = (jax.lax.broadcasted_iota(jnp.int32, (k, block), 1)
                       == cj[:, None]).astype(jnp.float32)
            vals = jnp.sum(sel_rows * colmask[None], axis=2)  # [nc, k]
            tot = tot + jnp.sum(vals[:, 0]) + scores[0]
        return tot

    variants = {
        "topk_only": scan8(topk_only),
        "gathers": scan8(gathers_only),
        "full_select": scan8(full_select),
        "page_atlas": scan8(page_only),
        "gathers_sorted": scan8(gathers_sorted),
        "gathers_blockmm": scan8(gathers_blockmm),
    }
    for name, fn in variants.items():
        t0 = time.time()
        jax.block_until_ready(fn())
        print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)
    best = {k: float("inf") for k in variants}
    for rep in range(4):
        for name, fn in variants.items():
            t0 = time.time()
            _ = float(fn())
            best[name] = min(
                best[name], max(0.0, (time.time() - t0) * 1000 - rtt) / 8
            )
            print(f"  rep {rep} {name}: {best[name]:.2f} ms", flush=True)
    print("--- summary (ms per rep) ---", flush=True)
    for name, ms in best.items():
        print(f"{name}: {ms:.2f}", flush=True)


if __name__ == "__main__":
    main()
