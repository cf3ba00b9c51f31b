"""Phase profile of the fused sampling kernel on device (dev tool).

The up-scale sample stage sits at ~8.8 ms for ~11.7k keypoints
(~0.75 us/kp) and neither the windowed-DMA patch loads nor the batched
descriptor post moved it (r4 A/Bs) — this strips the kernel phase by
phase to find where the time actually goes:

  load    patch loads only (roll + crop + checksum)
  orient  + orientation sampling dots + histogram post (phases 1-2)
  desc    + descriptor dots + post at fixed orientation (no dual peaks)
  full    the shipped kernel
  fullhi  full with orientation dots at HIGH instead of HIGHEST

Usage: python tools/exp_sample_phase.py [--config up_t2.0|dino]
"""

from __future__ import annotations

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sfm_tpu.config import SiftConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.ops import pallas_sample as ps
    from sfm_tpu.sift import frontend
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
        cfg = SiftConfig(num_octaves=5, max_pts_per_octave=4096,
                         sample_cap=16384, thresh=2.0, up_scale=True)

    offsets, subs = frontend.atlas_layout(img.shape, cfg)
    mats = frontend._mats_for(img.shape, cfg)
    atlas, dets = frontend._detect_stage(img, cfg, mats)

    # Compact exactly like _sample_stage does.
    x_a = jnp.concatenate([d.x for d in dets])
    y_a = jnp.concatenate([d.y for d in dets])
    sc_a = jnp.concatenate([d.scale for d in dets])
    sharp_a = jnp.concatenate([d.sharpness for d in dets])
    valid_a = jnp.concatenate([d.valid for d in dets])
    cap = cfg.sample_cap
    if cap and cap < valid_a.shape[0]:
        strength = jnp.where(valid_a, jnp.abs(sharp_a), -1.0)
        _, order = jax.lax.top_k(strength, cap)
    else:
        from sfm_tpu.ops.compact import compaction_order

        order = compaction_order(valid_a)
    x_a, y_a, sc_a, valid_a = (a[order] for a in (x_a, y_a, sc_a, valid_a))
    count = jnp.sum(valid_a, dtype=jnp.int32)
    n = int(np.asarray(count))
    print(f"{which}: atlas {atlas.shape}, {n} keypoints "
          f"in {x_a.shape[0]} slots", flush=True)

    P = ps.DESC_P
    img_p = ps._pad_for_kernel(atlas, P)
    Hp, Wp = img_p.shape
    x0 = jnp.clip(jnp.floor(x_a).astype(jnp.int32) - P // 2 + 1, 0,
                  max(Wp - P, 0))
    y0 = jnp.clip(jnp.floor(y_a).astype(jnp.int32) - P // 2 + 1, 0,
                  max(Hp - P, 0))
    fx = x_a - x0.astype(jnp.float32)
    fy = y_a - y0.astype(jnp.float32)
    inv2s2 = -1.0 / (2.0 * (1.5 * sc_a) ** 2)
    cnt = count.reshape(1)

    BK = 8
    K = x_a.shape[0]

    def make_kernel(mode):
        def kernel(count_ref, x0_ref, y0_ref, fx_ref, fy_ref, sc_ref,
                   i2_ref, img_ref, w2d_ref, wsp_ref, perm_ref, out_ref):
            kb = pl.program_id(0)
            out_ref[:, :] = jnp.zeros_like(out_ref)

            @pl.when(kb * BK < count_ref[0])
            def _():
                patches, fxs, fys = [], [], []
                for k in range(BK):
                    i = kb * BK + k
                    patch, dy_off = ps._load_patch(
                        img_ref, x0_ref[i], y0_ref[i], P)
                    patches.append(patch)
                    fxs.append(fx_ref[i])
                    fys.append(fy_ref[i] + dy_off)
                if mode == "load":
                    tot = patches[0][:, :40]
                    for k in range(1, BK):
                        tot = tot + patches[k][:, :40]
                    out_ref[:, :] = jnp.full(
                        out_ref.shape, jnp.sum(tot), jnp.float32)
                    return
                if mode in ("orient", "orienthi"):
                    prec = (jax.lax.Precision.HIGHEST if mode == "orient"
                            else None)
                    orows = [
                        ps._sample_matmul_wide(
                            patches[k],
                            *_ori_coords(fxs[k], fys[k]), P,
                            precision=prec)
                        for k in range(BK)
                    ]
                    ovals = jnp.concatenate(orows, axis=0)
                    i2r = jnp.concatenate(
                        [jnp.full((1, 1), i2_ref[kb * BK + k], jnp.float32)
                         for k in range(BK)], axis=0)
                    h = ps._orient_post_wide(ovals, i2r)
                    out_ref[:, :] = jnp.concatenate(
                        [h, jnp.zeros((BK, 96), jnp.float32)], axis=1)
                    return
                if mode == "desc":
                    vrows = []
                    one = jnp.ones((1, 1), jnp.float32)
                    zero = jnp.zeros((1, 1), jnp.float32)
                    for k in range(BK):
                        i = kb * BK + k
                        vrows.append(ps._desc_sample_wide(
                            patches[k], fxs[k], fys[k], one, zero,
                            sc_ref[i]))
                    vals = jnp.concatenate(vrows, axis=0)
                    out_ref[:, :] = ps._desc_post_wide(
                        vals, w2d_ref, wsp_ref, perm_ref)
                    return
                if mode == "desc16":
                    # bf16 tent builds: positions + both tent matrices
                    # in packed bf16 (2x VPU rate where native), bf16
                    # MXU inputs, f32 accumulate.
                    vrows = []
                    for k in range(BK):
                        i = kb * BK + k
                        P_ = ps.DESC_P
                        sc = (12.0 / 16.0) * sc_ref[i]
                        s_idx = jax.lax.broadcasted_iota(
                            jnp.int32, (1, 1024), 1)
                        i_f = (s_idx % 16).astype(jnp.float32) - 7.5
                        j_f = ((s_idx // 16) % 16).astype(jnp.float32) - 7.5
                        grp = s_idx // 256
                        bx = fxs[k] + sc * i_f
                        by = fys[k] + sc * j_f
                        gx = jnp.where(grp == 0, 1.0,
                                       jnp.where(grp == 1, -1.0, 0.0))
                        gy = jnp.where(grp == 2, 1.0,
                                       jnp.where(grp == 3, -1.0, 0.0))
                        px = jnp.clip(bx + gx, 0.0, P_ - 1.0)
                        py = jnp.clip(by + gy, 0.0, P_ + 7.0)
                        pxh = px.astype(jnp.bfloat16)
                        pyh = py.astype(jnp.bfloat16)
                        rn = P_ + 8
                        idx_r = jax.lax.broadcasted_iota(
                            jnp.int32, (rn, 1024), 0).astype(jnp.bfloat16)
                        idx_c = jax.lax.broadcasted_iota(
                            jnp.int32, (P_, 1024), 0).astype(jnp.bfloat16)
                        half = jnp.bfloat16(1.0)
                        A = jnp.maximum(
                            jnp.bfloat16(0.0), half - jnp.abs(pyh - idx_r))
                        B = jnp.maximum(
                            jnp.bfloat16(0.0), half - jnp.abs(pxh - idx_c))
                        tmp = jax.lax.dot_general(
                            patches[k].astype(jnp.bfloat16), A,
                            ps._DN_ROWS,
                            preferred_element_type=jnp.float32)
                        vrows.append(jnp.sum(
                            tmp * B.astype(jnp.float32), axis=0,
                            keepdims=True))
                    vals = jnp.concatenate(vrows, axis=0)
                    out_ref[:, :] = ps._desc_post_wide(
                        vals, w2d_ref, wsp_ref, perm_ref)
                    return

        def _ori_coords(fx_, fy_):
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 484), 1)
            xd = ((s_idx % 121) % 11).astype(jnp.float32) - 5.0
            yd = ((s_idx % 121) // 11).astype(jnp.float32) - 5.0
            grp = s_idx // 121
            gx = jnp.where(grp == 0, 1.0, jnp.where(grp == 1, -1.0, 0.0))
            gy = jnp.where(grp == 2, 1.0, jnp.where(grp == 3, -1.0, 0.0))
            return fx_ + xd + gx, fy_ + yd + gy

        return kernel

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run_mode(mode, x0, y0, fx, fy, sc, i2, cnt):
        return pl.pallas_call(
            make_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((K, 128), jnp.float32),
            grid=(K // BK,),
            in_specs=[smem] * 7 + [vmem] * 4,
            out_specs=pl.BlockSpec((BK, 128), lambda kb: (kb, 0),
                                   memory_space=pltpu.VMEM),
        )(cnt, x0, y0, fx, fy, sc, i2, img_p,
          jnp.asarray(ps._W2D_ROW), jnp.asarray(ps._WSP16),
          jnp.asarray(ps._PERM_A16))

    def run_full():
        return ps.fused_orient_descriptor(atlas, x_a, y_a, sc_a,
                                          count=count)[0]

    variants = {
        "orient(HIGHEST)": lambda: run_mode("orient", x0, y0, fx, fy, sc_a,
                                            inv2s2, cnt),
        "orient(default)": lambda: run_mode("orienthi", x0, y0, fx, fy,
                                            sc_a, inv2s2, cnt),
        "desc": lambda: run_mode("desc", x0, y0, fx, fy, sc_a, inv2s2, cnt),
        "desc16": lambda: run_mode("desc16", x0, y0, fx, fy, sc_a, inv2s2,
                                   cnt),
        "load": lambda: run_mode("load", x0, y0, fx, fy, sc_a, inv2s2, cnt),
        "full": run_full,
    }
    for name, fn in variants.items():
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)

    rtt = measure_rtt()
    print(f"rtt {rtt:.1f} ms", flush=True)
    N = 8
    best = {k: float("inf") for k in variants}
    for rep in range(3):
        for name, fn in variants.items():
            t0 = time.time()
            outs = [fn() for _ in range(N)]
            _ = float(sum(jnp.sum(o[:1, :1]) for o in outs))
            best[name] = min(
                best[name], max(0.0, (time.time() - t0) * 1000 - rtt) / N)
            print(f"  rep {rep} {name}: {best[name]:.2f} ms", flush=True)
    print("--- phase profile ---", flush=True)
    for name in variants:
        print(f"{name}: {best[name]:.2f} ms  "
              f"({best[name]*1000/max(n,1):.2f} us/kp)", flush=True)


if __name__ == "__main__":
    main()
