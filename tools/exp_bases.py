"""Device decomposition of the pyramid base chain (dev tool).

Scan-chained prefixes of base_chain_pallas at the up-scale config:

  up    ops/image.scale_up interleave only
  lp    + blur9 lowpass
  sd1   + first scale_down
  all   + remaining scale_downs (== bases)

Usage: python tools/exp_bases.py [--cpu]
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
    from sfm_tpu.ops import image as imops
    from sfm_tpu.ops import pallas_pyramid as pp
    from sfm_tpu.utils.timing import measure_rtt

    img = jnp.asarray(load_gray("/root/reference/CudaSift/data/left.pgm"))
    cfg = SiftConfig(num_octaves=5, up_scale=True, thresh=2.0)
    interp = jax.default_backend() == "cpu"
    sigma = max(cfg.init_blur, 1e-3)
    lp = tuple(float(t)
               for t in imops.gaussian_kernel(cfg.lowpass_radius,
                                              sigma * sigma))
    sd = tuple(float(t) for t in imops.gaussian_kernel(2, 0.5))

    def f_up(img_):
        return pp.scale_up(img_, interpret=interp)

    def f_lp(img_):
        return pp.blur9(f_up(img_), taps=lp, interpret=interp)

    def f_sd1(img_):
        return pp.scale_down(f_lp(img_), taps=sd, interpret=interp)

    def f_all(img_):
        b = f_lp(img_)
        outs = [b]
        for _ in range(cfg.num_octaves - 1):
            b = pp.scale_down(b, taps=sd, interpret=interp)
            outs.append(b)
        return sum(jnp.sum(x[:1, :1]) for x in outs)

    def to_scalar(x):
        if isinstance(x, (tuple, list)):
            x = x[0]
        return x if x.ndim == 0 else jnp.sum(x[:1, :1])

    NSCAN = 8

    def scanner(fn):
        @jax.jit
        def scanN(img_):
            def body(c, _):
                return jnp.minimum(jnp.abs(to_scalar(fn(img_ + c))), 0.0), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=NSCAN)
            return c

        return scanN

    variants = {
        "up": scanner(f_up),
        "lp": scanner(f_lp),
        "sd1": scanner(f_sd1),
        "all": scanner(f_all),
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
    print("--- bases prefixes ---", flush=True)
    prev = 0.0
    for name in variants:
        print(f"{name}: {best[name]:.2f} ms (delta {best[name]-prev:+.2f})",
              flush=True)
        prev = best[name]


if __name__ == "__main__":
    main()
