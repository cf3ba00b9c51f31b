"""Benchmark: dino-pair end-to-end two-view SfM on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's ~47 ms/pair on a GTX 1080 Ti (BASELINE.md,
sum of img/time.PNG stage bars).  vs_baseline is the speedup factor
(baseline_ms / our_ms; > 1 means faster than the reference).

Extra per-stage timings and quality metrics go to stderr.
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the full-pipeline first compile
    # through the relay measured 339 s in r1; cached reruns skip it.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - old jax
        log(f"compilation cache unavailable: {e}")

    from sfm_tpu.config import SiftConfig, PipelineConfig, RansacConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.models import two_view
    from sfm_tpu.sift import frontend, match as match_mod

    # The relay-backed TPU backend can be transiently unavailable
    # (observed: init hangs then raises Unavailable); retry with the
    # backend cache cleared rather than dying on the first attempt.
    for attempt in range(6):
        try:
            log(f"devices: {jax.devices()}")
            break
        except RuntimeError as e:
            log(f"backend init failed (attempt {attempt + 1}/6): {e}")
            if attempt == 5:
                raise
            try:
                import jax.extend  # noqa: F401 (not re-exported by jax)

                jax.extend.backend.clear_backends()
            except Exception:
                pass
            time.sleep(90)

    img1 = jnp.asarray(load_gray("/root/reference/data/dino/viff.000.ppm"))
    img2 = jnp.asarray(load_gray("/root/reference/data/dino/viff.001.ppm"))
    h, w = img1.shape
    K = jnp.asarray(
        np.array([[2360.0, 0, w / 2], [0, 2360.0, h / 2], [0, 0, 1]], np.float32)
    )
    # n_hyps=1536: the r5 bad-seed root cause was the 1024-hypothesis
    # bank lacking a good-basin draw on ~2/8 seeds (replay_geometry,
    # NOTES_R5); 1536 rescues every seed on both the CPU and device
    # match sets.  tvote_rounds=0: with the probe multi-start + the
    # bigger bank, the translation re-vote buys nothing on this pair
    # (device 8-seed A/B: min valid 1022 vs 1026) and costs 0.86 ms.
    cfg = PipelineConfig(
        sift=SiftConfig(max_pts_per_octave=1024),
        ransac=RansacConfig(n_hyps=1536, threshold=3e-6, chunk=256),
        tvote_rounds=0,
    )
    jax.block_until_ready((img1, img2, K))

    keys = [jax.random.PRNGKey(i) for i in range(16)]

    def run(i):
        return two_view.two_view_pipeline(img1, img2, K, keys[i % 16], cfg)

    t0 = time.time()
    res = run(0)
    jax.block_until_ready(res)
    _ = float(res.reproj_err)  # true sync (relay round trip)
    log(f"compile+first run: {time.time()-t0:.1f} s")
    # Quality over several RANSAC seeds (the draw moves the valid-point
    # count by ~20%; a single seed is noise-hostage), reported as the
    # median.  Floors sit under the r4 measured config (8-seed device
    # study NOTES_R4: valid 957-1067, px 0.34-0.62 with f32 geometry
    # precision + top-K restart + tight scoring + tvote) so regressions
    # are loud (r2 lost 33% of valid points to slot caps unnoticed —
    # VERDICT r2 weak item 1; r1-r3 ran bf16-noisy inlier gates
    # unnoticed — NOTES_R4).
    qs = []
    for s in range(8):
        r = run(s)
        qs.append((int(r.num_matches), int(r.num_inliers),
                   int(r.point_valid.sum()),
                   math.sqrt(float(r.reproj_err) / 2) * 2360.0))
    n_matches, n_inliers, n_valid, reproj_px = (
        float(np.median([q[i] for q in qs])) for i in range(4)
    )
    log("per-seed (matches, inliers, valid, px): " + repr(qs))
    log(
        f"median: matches={n_matches:.0f} inliers={n_inliers:.0f} "
        f"valid_points={n_valid:.0f} reproj_px={reproj_px:.3f}"
    )
    # Quality gates are BLOCKING (VERDICT r4 weak item 2: stderr
    # warnings with rc=0 let the seed-0 regression ship inside a green
    # BENCH_r04.json).  Every violation is collected, embedded in the
    # headline JSON as machine-readable fields, and the process exits
    # non-zero — this class of regression can never ship green again.
    gate_failures = []

    def gate(cond, msg):
        if not cond:
            gate_failures.append(msg)
            log(f"GATE FAIL: {msg}")

    gate(n_matches >= 1100, f"median matches={n_matches:.0f} < 1100")
    gate(n_inliers >= 950, f"median inliers={n_inliers:.0f} < 950")
    gate(n_valid >= 950, f"median valid_points={n_valid:.0f} < 950")
    gate(reproj_px <= 0.7, f"median reproj_px={reproj_px:.3f} > 0.7")
    # Per-seed gates (VERDICT r3 weak item 3: median-only gating let a
    # 1.23 px seed ship silently): EVERY seed must clear the tail
    # floors, not just the middle of the distribution.
    for s, (qm, qi, qv, qpx) in enumerate(qs):
        gate(qv >= 900,
             f"seed {s} valid_points={qv} below per-seed floor 900 — "
             "bad-seed tail regression")
        gate(qpx <= 0.75,
             f"seed {s} reproj_px={qpx:.3f} above per-seed 0.75 px "
             "ceiling — bad-seed tail regression")

    # Amortized throughput: N chained dispatches, one sync.  The dev
    # tunnel to the TPU has a ~28.5 ms round-trip latency per synced
    # call (measured: a trivial add costs the same as a 17-GFLOP
    # matmul); chaining amortizes it away, matching the production
    # pattern of streaming frame pairs.  The single relay round-trip of
    # the final scalar read is measured in-process and subtracted per
    # the project measurement convention (CLAUDE.md).
    one = jnp.float32(1.0) + 0.0
    _ = float(one)
    rtt = float("inf")
    for i in range(5):
        t0 = time.time()
        _ = float(one + jnp.float32(i))  # trivial dispatch + D2H sync
        rtt = min(rtt, (time.time() - t0) * 1000.0)
    log(f"relay rtt: {rtt:.1f} ms")
    N = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [run(i).reproj_err for i in range(N)]
        _ = float(sum(outs))
        best = min(best, max(0.0, (time.time() - t0) * 1000.0 - rtt) / N)
    ms = best

    # TPU-side Pallas parity: the interpret-mode tests prove kernel
    # semantics on CPU; this run proves the MOSAIC-COMPILED kernels
    # agree with the XLA gather path on the real device (r1 verdict
    # weak item 7).  Detection is shared, so keypoints are matched by
    # (x, y, scale) and each Pallas keypoint is compared against the
    # NEAREST-ORIENTATION XLA twin at that position: near-tie histogram
    # peaks may legitimately swap order between slot i and its dual-
    # peak duplicate slot (both orientations exist in both sets), and a
    # slot-by-slot comparison misreads that swap as divergence
    # (diagnosed r2, tools/diag_parity.py / diag_hist.py).
    try:
        import dataclasses

        s_p = frontend.extract_sift(img1, cfg.sift)  # pallas (auto on TPU)
        s_x = frontend.extract_sift(
            img1, dataclasses.replace(cfg.sift, use_pallas=False)
        )

        def fields(s):
            kp = s.keypoints
            v = np.array(kp.valid)
            return (np.array(kp.x)[v], np.array(kp.y)[v],
                    np.array(kp.scale)[v], np.array(kp.orientation)[v],
                    np.array(s.descriptors)[v])

        xp, yp, sp_, op, dp = fields(s_p)
        xx, yx, sx_, ox, dx = fields(s_x)
        bypos = {}
        for j in range(len(xx)):
            bypos.setdefault(
                (round(float(xx[j]), 2), round(float(yx[j]), 2),
                 round(float(sx_[j]), 3)), []).append(j)
        corr, ori_d = [], []
        for i in range(len(xp)):
            js = bypos.get(
                (round(float(xp[i]), 2), round(float(yp[i]), 2),
                 round(float(sp_[i]), 3)), [])
            if not js:
                continue
            dd = np.abs((op[i] - ox[js] + 180.0) % 360.0 - 180.0)
            j = js[int(dd.argmin())]
            ori_d.append(dd.min())
            corr.append(float(dp[i] @ dx[j]))
        corr = np.asarray(corr)
        ori_d = np.asarray(ori_d)
        coverage = len(corr) / max(len(xp), 1)
        if len(corr) == 0:
            log(
                "WARNING: pallas parity probe matched ZERO keypoints by "
                f"position ({len(xp)} pallas vs {len(xx)} xla valid) — "
                "detection paths diverge on device"
            )
        else:
            frac = float((corr > 0.999).mean())
            log(
                f"pallas-vs-xla parity on device (pos+nearest-ori matched): "
                f"n={len(corr)} coverage={coverage:.3f} "
                f"corr_min={corr.min():.5f} "
                f"corr>0.999 frac={frac:.4f} orient_max_deg={ori_d.max():.3f}"
            )
            if frac < 0.99:
                log("WARNING: compiled Pallas kernels diverge from XLA path")
            if coverage < 0.95:
                log(
                    "WARNING: only "
                    f"{coverage:.1%} of Pallas keypoints have a positional "
                    "XLA twin — positional match coverage is poor"
                )
    except Exception as e:  # pragma: no cover
        log(f"pallas parity check failed to run: {e}")

    # Opt-in profiler trace (SURVEY.md §5 tracing equivalent): set
    # SFM_TPU_PROFILE=/some/dir to capture a jax.profiler trace of one
    # amortized batch for TensorBoard / xprof.
    trace_dir = os.environ.get("SFM_TPU_PROFILE")
    if trace_dir:
        try:
            with jax.profiler.trace(trace_dir):
                outs = [run(i).reproj_err for i in range(N)]
                _ = float(sum(outs))
            log(f"profiler trace written to {trace_dir}")
        except Exception as e:
            log(f"profiler trace failed: {e}")

    baseline_ms = 47.0
    print(
        json.dumps(
            {
                "metric": "dino_pair_e2e_ms",
                "value": round(ms, 2),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ms, 3),
                "gates": "fail" if gate_failures else "pass",
                "gate_failures": gate_failures,
            }
        )
    )
    if gate_failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
