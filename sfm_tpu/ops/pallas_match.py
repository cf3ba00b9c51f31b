"""Pallas TPU kernel: brute-force descriptor matching, fused top-2.

TPU-native equivalent of FindMaxCorr10 (reference
CudaSift/matching.cu:289-397): the N1 x N2 x 128 correlation runs as
bf16 MXU tiles; the running (best, second, index) reduction lives in a
VMEM scratch accumulator that persists across the N2 grid axis, so the
score matrix NEVER touches HBM (the XLA scan in sift.match materializes
[N1, chunk] scores per step).  bf16 inputs halve the streaming traffic
and quadruple MXU throughput; accumulation is f32
(preferred_element_type), and the top-2 merge is exact given the bf16
scores.

Grid: (N1/BM, N2/BN), N2 minor — each N1 block's accumulator is
initialized at j == 0 and flushed to the output at j == N2/BN - 1.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -2.0  # correlations of unit vectors live in [-1, 1]


def _make_kernel_lanes(bm: int, bn: int, n2_blocks: int):
    """Per-LANE running top-2: the accumulator keeps (best, second,
    idx) PER LANE-COLUMN ([BM, 128] each), so each 128-wide group of a
    score tile merges with ~5 elementwise passes instead of the ~9
    cross-lane reduction passes of the tile-top-2 kernel — the kernel
    is VPU-bound (NOTES_R2 speed-of-light accounting), so pass count is
    the cost.  One exact cross-lane top-2 merge happens at the last N2
    block: the global second-best is either the second of the lane
    holding the global best or the best of the runner-up lane, both of
    which the per-lane accumulator preserves.

    (r4 note: bf16-accumulator and dual-chain ILP variants were built
    and device-A/B'd — bf16 accumulators fail to compile on the
    current Mosaic and the dual chain measured slower, 3.80 vs
    3.64 ms at 16K; both removed, results in NOTES_R4.)
    """
    g = bn // 128

    def kernel(d1_ref, d2_ref, v2_ref, out_ref, b_ref, s_ref, i_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            b_ref[:, :] = jnp.full_like(b_ref, _NEG)
            s_ref[:, :] = jnp.full_like(s_ref, _NEG)
            i_ref[:, :] = jnp.zeros_like(i_ref)

        scores = jax.lax.dot_general(
            d1_ref[:, :], d2_ref[:, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
        )  # [BM, BN]
        scores = scores + (v2_ref[:, :] - 1.0) * 1e3

        for gi in range(g):
            s = scores[:, gi * 128:(gi + 1) * 128]
            # The lane is implicit in the accumulator position, so only
            # the 128-wide BLOCK id is stored (one fewer VPU pass than
            # adding a lane iota per group); the final merge
            # reconstructs col = block*128 + lane.
            blk = jnp.float32(0.0) + (j * g + gi).astype(jnp.float32)
            b = b_ref[:, :]
            take = s > b
            s_ref[:, :] = jnp.maximum(s_ref[:, :], jnp.where(take, b, s))
            b_ref[:, :] = jnp.where(take, s, b)
            i_ref[:, :] = jnp.where(take, blk, i_ref[:, :])

        @pl.when(j == n2_blocks - 1)
        def _():
            b = b_ref[:, :]
            s = s_ref[:, :]
            i = i_ref[:, :]
            ilane = jax.lax.broadcasted_iota(jnp.int32, (bm, 128), 1)
            gb = jnp.max(b, axis=1, keepdims=True)
            garg = jnp.min(
                jnp.where(b == gb, ilane, np.int32(2 ** 30)),
                axis=1, keepdims=True,
            )
            at_arg = ilane == garg
            runner = jnp.max(jnp.where(at_arg, _NEG, b), axis=1,
                             keepdims=True)
            sec_at = jnp.max(jnp.where(at_arg, s, _NEG), axis=1,
                             keepdims=True)
            gsec = jnp.maximum(runner, sec_at)
            gblk = jnp.max(jnp.where(at_arg, i, -1.0), axis=1,
                           keepdims=True)
            gidx = gblk * 128.0 + garg.astype(jnp.float32)
            olane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
            out_ref[:, :] = (
                jnp.where(olane == 0, gb, 0.0)
                + jnp.where(olane == 1, gsec, 0.0)
                + jnp.where(olane == 2, gidx, 0.0)
            )

    return kernel


def _make_kernel_lanes_pair(bm: int, bn: int, n2_blocks: int):
    """Pairwise-group variant of the per-lane kernel (r5): two 128-col
    groups are first sorted against each other (p1 = max, p2 = min —
    2 VPU passes for 2 groups), then ONE (best, second) accumulator
    merge absorbs the pair:

        b' = max(b, p1)
        s' = max(max(s, p2), min(b, p1))
        i' = select(p1 > b, idx(p1), i)

    ~4.5 VPU passes per group vs ~5.5 for the per-group merge — the
    kernel is VPU-issue-bound, so pass count is the cost (NOTES_R2/R5
    accounting).  Exact: top-2 of a union of sorted pairs.
    """
    g = bn // 128
    assert g % 2 == 0, "pair variant needs an even group count per tile"

    def kernel(d1_ref, d2_ref, v2_ref, out_ref, b_ref, s_ref, i_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            b_ref[:, :] = jnp.full_like(b_ref, _NEG)
            s_ref[:, :] = jnp.full_like(s_ref, _NEG)
            i_ref[:, :] = jnp.zeros_like(i_ref)

        scores = jax.lax.dot_general(
            d1_ref[:, :], d2_ref[:, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
        )  # [BM, BN]
        scores = scores + (v2_ref[:, :] - 1.0) * 1e3

        for gi in range(0, g, 2):
            sA = scores[:, gi * 128:(gi + 1) * 128]
            sB = scores[:, (gi + 1) * 128:(gi + 2) * 128]
            blkA = jnp.float32(0.0) + (j * g + gi).astype(jnp.float32)
            blkB = jnp.float32(0.0) + (j * g + gi + 1).astype(jnp.float32)
            a_wins = sA >= sB
            p1 = jnp.where(a_wins, sA, sB)
            p2 = jnp.where(a_wins, sB, sA)
            i1 = jnp.where(a_wins, blkA, blkB)
            b = b_ref[:, :]
            take = p1 > b
            s_ref[:, :] = jnp.maximum(
                jnp.maximum(s_ref[:, :], p2), jnp.where(take, b, p1)
            )
            b_ref[:, :] = jnp.where(take, p1, b)
            i_ref[:, :] = jnp.where(take, i1, i_ref[:, :])

        @pl.when(j == n2_blocks - 1)
        def _():
            b = b_ref[:, :]
            s = s_ref[:, :]
            i = i_ref[:, :]
            ilane = jax.lax.broadcasted_iota(jnp.int32, (bm, 128), 1)
            gb = jnp.max(b, axis=1, keepdims=True)
            garg = jnp.min(
                jnp.where(b == gb, ilane, np.int32(2 ** 30)),
                axis=1, keepdims=True,
            )
            at_arg = ilane == garg
            runner = jnp.max(jnp.where(at_arg, _NEG, b), axis=1,
                             keepdims=True)
            sec_at = jnp.max(jnp.where(at_arg, s, _NEG), axis=1,
                             keepdims=True)
            gsec = jnp.maximum(runner, sec_at)
            gblk = jnp.max(jnp.where(at_arg, i, -1.0), axis=1,
                           keepdims=True)
            gidx = gblk * 128.0 + garg.astype(jnp.float32)
            olane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
            out_ref[:, :] = (
                jnp.where(olane == 0, gb, 0.0)
                + jnp.where(olane == 1, gsec, 0.0)
                + jnp.where(olane == 2, gidx, 0.0)
            )

    return kernel


def _make_kernel(bm: int, bn: int, n2_blocks: int):
    def kernel(d1_ref, d2_ref, v2_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:, :] = jnp.full_like(acc_ref, _NEG)
            # idx column starts at 0
            lane = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1)
            acc_ref[:, :] = jnp.where(lane == 2, 0.0, acc_ref[:, :])

        scores = jax.lax.dot_general(
            d1_ref[:, :], d2_ref[:, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
        )  # [BM, BN]
        # Invalid right-side points score -1000 (v2 is 1.0/0.0).
        scores = scores + (v2_ref[:, :] - 1.0) * 1e3

        iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        loc_best = jnp.max(scores, axis=1, keepdims=True)        # [BM,1]
        loc_arg = jnp.min(
            jnp.where(scores == loc_best, iota, np.int32(2**30)),
            axis=1, keepdims=True,
        )                                                         # [BM,1]
        loc_second = jnp.max(
            jnp.where(iota == loc_arg, _NEG, scores), axis=1, keepdims=True
        )
        loc_idx = (loc_arg + j * bn).astype(jnp.float32)

        lane = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1)
        best = jnp.sum(jnp.where(lane == 0, acc_ref[:, :], 0.0), axis=1,
                       keepdims=True)
        second = jnp.sum(jnp.where(lane == 1, acc_ref[:, :], 0.0), axis=1,
                         keepdims=True)
        bidx = jnp.sum(jnp.where(lane == 2, acc_ref[:, :], 0.0), axis=1,
                       keepdims=True)

        take = loc_best > best
        new_best = jnp.maximum(best, loc_best)
        new_idx = jnp.where(take, loc_idx, bidx)
        new_second = jnp.where(
            take, jnp.maximum(best, loc_second), jnp.maximum(second, loc_best)
        )
        acc_ref[:, :] = (
            jnp.where(lane == 0, new_best, 0.0)
            + jnp.where(lane == 1, new_second, 0.0)
            + jnp.where(lane == 2, new_idx, 0.0)
        )

        @pl.when(j == n2_blocks - 1)
        def _():
            out_ref[:, :] = acc_ref[:, :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bf16", "interpret", "variant")
)
def match_top2_pallas(desc1, desc2, valid2=None, *, bm: int | None = None,
                      bn: int | None = None, bf16: bool = True,
                      interpret: bool = False, variant: str = "lanes_pair"):
    """Running top-2 correlation of [N1,128] vs [N2,128] (Pallas).

    Returns (best [N1] f32, second [N1] f32, index [N1] i32) — the
    same contract as sift.match.match_descriptors_top2.  N1/N2 are
    padded to the block sizes internally.

    variant="lanes_pair" (default, r5): per-lane-column running top-2
    with a pairwise group pre-sort — two 128-col groups sort against
    each other first, then one (best, second) merge absorbs the pair,
    HALVING the serial accumulator chain per tile (same-process A/B at
    16K x 16K: 3.81 vs 3.99 ms for "lanes"; reference kernel
    10.53 ms).  variant="lanes": the r3/r4 per-group merge.
    variant="tile": per-tile exact top-2 folded into a [BM, 8]
    accumulator.  Same results up to tie-breaking — "tile" keeps the
    lowest column index on EXACTLY equal scores, the lane variants the
    lowest lane.

    bm/bn default to a size-adaptive sweep winner (tools/bench_match.py
    r3): bigger tiles amortize per-tile fixed VPU passes once the
    problem is large enough to fill them — 512x1024 at 16K x 16K
    (3.66 ms), 512x2048 at 32K x 32K (5.01 ms, 54.9 TFLOP/s; the r2
    defaults measured 21.4 ms there); small pipeline-shape problems
    (~2.5K) keep 256x512.
    """
    n1, d = desc1.shape
    n2 = desc2.shape[0]
    if bm is None:
        bm = 512 if n1 >= 8192 else 256
    if bn is None:
        # Thresholds chosen so pipeline-shape problems (dino config:
        # N2 = 5120 slots) keep the full-pipeline-A/B'd 512 tile; only
        # capacity-class problems switch to the sweep winners.
        bn = 2048 if n2 > 16384 else (1024 if n2 > 6144 else 512)
    if variant not in ("lanes", "lanes_pair", "tile"):
        raise ValueError(f"unknown matcher variant {variant!r}")
    lanes_like = variant in ("lanes", "lanes_pair")
    if lanes_like and (bn % 128 != 0 or bn < 128):
        raise ValueError(
            f"lanes variant needs bn to be a positive multiple of 128 "
            f"(got bn={bn}); columns beyond the last full 128-group "
            "would silently drop from the top-2 merge"
        )
    if valid2 is None:
        valid2 = jnp.ones((n2,), bool)
    n1p = -(-n1 // bm) * bm
    n2p = -(-n2 // bn) * bn
    if n1p != n1:
        desc1 = jnp.pad(desc1, ((0, n1p - n1), (0, 0)))
    if n2p != n2:
        desc2 = jnp.pad(desc2, ((0, n2p - n2), (0, 0)))
        valid2 = jnp.pad(valid2, (0, n2p - n2))
    dt = jnp.bfloat16 if bf16 else jnp.float32
    d1 = desc1.astype(dt)
    d2 = desc2.astype(dt)
    v2row = valid2.astype(jnp.float32)[None, :]  # [1, N2]
    n2_blocks = n2p // bn

    if lanes_like:
        pair = variant == "lanes_pair" and (bn // 128) % 2 == 0
        mk = _make_kernel_lanes_pair if pair else _make_kernel_lanes
        kernel = mk(bm, bn, n2_blocks)
        scratch = [pltpu.VMEM((bm, 128), jnp.float32) for _ in range(3)]
    else:
        kernel = _make_kernel(bm, bn, n2_blocks)
        scratch = [pltpu.VMEM((bm, 8), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n1p, 8), jnp.float32),
        grid=(n1p // bm, n2_blocks),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 8), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(d1, d2, v2row)
    out = out[:n1]
    return out[:, 0], out[:, 1], out[:, 2].astype(jnp.int32)
