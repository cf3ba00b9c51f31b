"""Scaling-efficiency benchmark for the distributed layer
(BASELINE.md north star: >= 0.8 frames/s scaling efficiency 1 -> N).

NO reference counterpart (the reference is single-GPU,
src/main.cpp:175); this measures the framework's own distribution
layer (parallel/dist_match.py, parallel/dist_ba.py).

Three complementary measurements, because real multi-chip hardware is
not reachable from this sandbox (one TPU chip behind a relay):

1. WEAK SCALING on the virtual CPU mesh: fixed per-device work
   (dist_match shards N2, dist_BA shards points+observations), 1 vs 2
   vs 4 shards.  Virtual devices SHARE the host's cores, so this
   wall-clock efficiency is a pessimistic LOWER bound: it charges the
   full compute contention of co-located shards plus the true
   collective cost, yet sees none of the parallel speedup real chips
   provide.
2. COMMUNICATION VOLUME extracted from the compiled HLO: every
   all-reduce/all-gather in the sharded program, with operand bytes —
   checked against the analytic model (dist_ba.py docstring: ONE [M,6]
   psum per CG matvec, so O(M*6*4*cg_iters) bytes per LM iteration,
   independent of the point count).
3. ICI PROJECTION: efficiency = t_compute / (t_compute + t_comm) with
   t_comm = measured collective bytes / ICI bandwidth (and a per-step
   latency term), using the real-chip compute time measured by
   tools/bench_ba.py.  This is the number that transfers to real
   multi-chip hardware, where per-device compute stays at the 1-shard
   level while the collectives ride ICI.

Usage:
  python tools/bench_scaling.py [--shards 1,2,4] [--device-ms-per-lm N]
      [--ici-gbps 45] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# HLO collective accounting


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "f64": 8, "s8": 1, "u8": 1, "pred": 1}


def collective_sites(stablehlo_text: str):
    """Collective SITES (per-execution payload shapes) from the
    pre-optimization StableHLO.  Post-optimization HLO is unstable for
    this (XLA merges/sinks all-reduces differently per shape class),
    and sites inside scan/while bodies appear once regardless of trip
    count — dynamic volume is computed analytically from the design
    contract (dist_ba.py docstring), which these sites verify."""
    sites = []
    op_pat = re.compile(r'"stablehlo\.(all_reduce|all_gather|'
                        r"reduce_scatter|collective_permute|all_to_all)\"")
    shape_pat = re.compile(r"->\s*\(?tensor<([^>]+)>")
    for m in op_pat.finditer(stablehlo_text):
        tail = stablehlo_text[m.end():m.end() + 2000]
        sm = shape_pat.search(tail)
        if not sm:
            continue
        spec = sm.group(1)  # e.g. "32x6xf32"
        parts = spec.split("x")
        dt = parts[-1]
        elems = 1
        for d in parts[:-1]:
            elems *= int(d)
        sites.append(
            {"op": m.group(1), "shape": spec,
             "bytes": elems * _DTYPE_BYTES.get(dt, 4)}
        )
    return sites


# ---------------------------------------------------------------------------
# Workloads: fixed per-device shapes


def make_ba_problem(n_shards, rng, M=32, pts_per_shard=4096,
                    obs_per_cam_per_shard=256):
    from sfm_tpu.models import bundle_adjust as ba
    from sfm_tpu.parallel import dist_ba

    Pn = pts_per_shard * n_shards
    obs_per_cam = obs_per_cam_per_shard * n_shards
    X_gt = rng.uniform([-1, -1, 4], [1, 1, 7], size=(Pn, 3)).astype(np.float32)
    R_gt = np.broadcast_to(np.eye(3, dtype=np.float32), (M, 3, 3)).copy()
    t_gt = np.stack(
        [np.array([0.1 * i, 0, 0], np.float32) for i in range(M)]
    )
    cam_idx = np.repeat(np.arange(M), obs_per_cam).astype(np.int32)
    pt_idx = np.concatenate(
        [rng.choice(Pn, obs_per_cam, replace=False) for _ in range(M)]
    ).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", R_gt[cam_idx], X_gt[pt_idx]) + t_gt[cam_idx]
    uv = (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)
    fixed = np.zeros(M, bool)
    fixed[0] = True
    prob = ba.BAProblem(
        jnp.asarray(cam_idx), jnp.asarray(pt_idx), jnp.asarray(uv),
        jnp.ones(M * obs_per_cam, bool), jnp.asarray(fixed),
    )
    X0 = (X_gt + rng.normal(scale=0.01, size=X_gt.shape)).astype(np.float32)
    return dist_ba.partition_problem(prob, X0, n_shards) + (
        jnp.asarray(R_gt), jnp.asarray(t_gt),
    )


def time_compiled(fn, args, reps=3, inner=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", default="1,2,4")
    ap.add_argument("--lm-iters", type=int, default=4)
    ap.add_argument("--cg-iters", type=int, default=16)
    ap.add_argument("--cams", type=int, default=32)
    ap.add_argument(
        "--device-ms-per-lm", type=float, default=None,
        help="real-chip ms per LM iteration at the 1-shard workload "
             "(from tools/bench_ba.py) for the ICI projection",
    )
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="per-link ICI bandwidth, GB/s (v5e: ~45)")
    ap.add_argument("--ici-us-per-step", type=float, default=1.0,
                    help="per-collective latency, microseconds")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    shard_list = [int(s) for s in args.shards.split(",")]

    from sfm_tpu.parallel import mesh as meshmod, dist_ba, dist_match

    rng = np.random.default_rng(0)
    results = {"match": {}, "ba": {}, "collectives": {}}

    # --- dist match weak scaling: N1 fixed, N2 = 2048 * shards ---
    n1, n2_per = 2048, 2048
    d1 = rng.normal(size=(n1, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    for D in shard_list:
        mesh = meshmod.make_mesh(D)
        n2 = n2_per * D
        d2 = rng.normal(size=(n2, 128)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        a = (jnp.asarray(d1), jnp.asarray(d2), jnp.ones((n2,), bool))
        fn = lambda x, y, v: dist_match.dist_match_top2(
            x, y, v, mesh, chunk=512
        )
        ms = time_compiled(fn, a)
        results["match"][D] = ms
        log(f"dist_match  D={D}: N2={n2}  {ms:8.2f} ms "
            f"(per-device work fixed at {n1}x{n2_per}x128)")
        # Collective accounting for the sharded matcher (VERDICT r3
        # item 9 — dist_BA got this in r3, dist_match only had the
        # docstring model): the design contract is ONE all_gather of
        # the per-device [N1, 3] (best, second, idx) candidate tuple —
        # O(D * N1 * 12 B) landing per device — and nothing else; the
        # N1 x N2 x 128 correlation never crosses ICI.
        if D == shard_list[-1]:
            lowered = jax.jit(
                dist_match.dist_match_top2,
                static_argnames=("mesh", "chunk", "axis", "use_pallas",
                                 "bf16"),
            ).lower(a[0], a[1], a[2], mesh, chunk=512)
            sites = collective_sites(lowered.as_text())
            results["match_collective_sites"] = sites
            log(f"dist_match collective sites (D={D}): "
                + ", ".join(f"{s['op']}[{s['shape']}]={s['bytes']}B"
                            for s in sites))
            gathers = [s for s in sites if s["op"] == "all_gather"]
            model_bytes = D * n1 * 3 * 4
            ok = (
                len(gathers) == 1
                and gathers[0]["bytes"] == model_bytes
                and not [s for s in sites if s["op"] != "all_gather"]
            )
            results["match_per_call_bytes"] = model_bytes
            results["match_sites_match_model"] = ok
            log(f"dist_match gather payload per call (model "
                f"{'OK' if ok else 'MISMATCH'}): {model_bytes} B "
                f"({model_bytes/1024:.1f} KiB) = D*N1*12 — independent "
                f"of N2, the axis that scales")

    # --- dist BA weak scaling: points/obs scale with shards, M fixed ---
    for D in shard_list:
        mesh = meshmod.make_mesh(D)
        X_sh, prob_sh, R0, t0_ = make_ba_problem(D, rng, M=args.cams)
        fn = lambda R, t, X, c, p, u, m, f: dist_ba.run_dist_ba(
            R, t, X,
            type(prob_sh)(c, p, u, m, f), mesh,
            iters=args.lm_iters, solver="cg", cg_iters=args.cg_iters,
        )
        a = (R0, t0_, X_sh, prob_sh.cam_idx, prob_sh.pt_idx, prob_sh.uv,
             prob_sh.mask, prob_sh.fixed)
        ms = time_compiled(fn, a, reps=3, inner=2)
        results["ba"][D] = ms
        log(f"dist_ba     D={D}: P={X_sh.shape[0]} "
            f"O={prob_sh.cam_idx.shape[0]}  {ms:8.2f} ms "
            f"/{args.lm_iters} LM iters")
        # Collective accounting from the compiled HLO (largest mesh only
        # is representative; per-LM-iteration division below).
        if D == shard_list[-1]:
            lowered = jax.jit(
                dist_ba.run_dist_ba,
                static_argnames=("mesh", "iters", "solver", "cg_iters"),
            ).lower(
                R0, t0_, X_sh, prob_sh, mesh,
                iters=args.lm_iters, solver="cg", cg_iters=args.cg_iters,
            )
            sites = collective_sites(lowered.as_text())
            results["collective_sites"] = sites
            log(f"collective sites (D={D}): "
                + ", ".join(f"{s['op']}[{s['shape']}]={s['bytes']}B"
                            for s in sites))
            # Dynamic volume per LM iteration (design contract,
            # dist_ba.py): 1 [M,6,6] U psum + 1 [M,6] gc psum + 1 [M,6]
            # Schur-rhs psum + cg_iters [M,6] matvec psums + 1 scalar
            # cost psum.  The sites above verify exactly these payloads
            # exist in the program (scan-body sites execute once per
            # trip).
            m6 = args.cams * 6 * 4
            per_lm = (
                args.cams * 36 * 4 + m6 + m6 + args.cg_iters * m6 + 4
            )
            results["per_lm_bytes"] = per_lm
            # Shape cross-check: the program must contain the [M,6,6]
            # and [M,6] psum sites the model charges for.
            shapes = {s["shape"] for s in sites}
            ok = (f"{args.cams}x6x6xf32" in shapes
                  and f"{args.cams}x6xf32" in shapes)
            results["sites_match_model"] = ok
            log(f"psum payload per LM iter (analytic, site-verified "
                f"{'OK' if ok else 'MISMATCH'}): {per_lm} B "
                f"({per_lm/1024:.1f} KiB), independent of point count")

    base = shard_list[0]
    for name in ("match", "ba"):
        for D in shard_list[1:]:
            eff = results[name][base] / results[name][D]
            results[f"{name}_eff_{base}to{D}"] = eff
            log(f"weak-scaling efficiency {name} {base}->{D}: {eff:.3f} "
                "(virtual mesh, shards share cores: LOWER bound)")

    # --- ICI projection for real chips ---
    if args.device_ms_per_lm is not None:
        per_lm = results.get("per_lm_bytes", 0.0)
        n_coll_per_lm = args.cg_iters + 4.0
        t_comm_ms = (
            per_lm / (args.ici_gbps * 1e9) * 1e3
            + n_coll_per_lm * args.ici_us_per_step * 1e-3
        )
        eff = args.device_ms_per_lm / (args.device_ms_per_lm + t_comm_ms)
        results["ici_projection"] = {
            "device_ms_per_lm": args.device_ms_per_lm,
            "comm_ms_per_lm": t_comm_ms,
            "efficiency": eff,
        }
        log(
            f"ICI projection: compute {args.device_ms_per_lm:.3f} ms/LM, "
            f"comm {t_comm_ms:.4f} ms/LM "
            f"({per_lm:.0f} B + {n_coll_per_lm:.0f} steps) -> "
            f"efficiency {eff:.4f}"
        )

    print(json.dumps(results, default=float))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, default=float)


if __name__ == "__main__":
    main()
