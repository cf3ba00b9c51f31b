"""Brute-force descriptor matching with running top-2 + ratio test.

TPU-native replacement for MatchSiftData / FindMaxCorr10
(reference CudaSift/matching.cu:1090-1206, 289-397): the N1 x N2 x 128
correlation is an MXU matmul; instead of the reference's shared-memory
tiles with skewed float4 layout and per-thread best/second-best
registers, we scan over N2 tiles keeping a running (best, second-best,
index) carry, so the full score matrix is never materialized — the
same fusion the CUDA kernel achieves, expressed as lax.scan.

Contract parity (matching.cu:381-396): per left point — match index =
argmax correlation, score = best correlation, ambiguity = second_best /
(best + 1e-6) where second-best excludes the best index.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.config import MatchConfig


class Matches(NamedTuple):
    index: jnp.ndarray      # [N1] int32 best match in set 2
    score: jnp.ndarray      # [N1] best correlation
    ambiguity: jnp.ndarray  # [N1] second_best / best
    valid: jnp.ndarray      # [N1] passes masks + thresholds


_NEG = -2.0  # correlations of unit vectors are in [-1, 1]


@functools.partial(jax.jit, static_argnames=("chunk",))
def match_descriptors_top2(desc1, desc2, valid2=None, *, chunk: int = 2048):
    """Running top-2 correlation of [N1,128] vs [N2,128].

    Returns (best, second, index).  Invalid right-side points are
    excluded via `valid2`.
    """
    n1 = desc1.shape[0]
    n2 = desc2.shape[0]
    if valid2 is None:
        valid2 = jnp.ones((n2,), bool)
    n_chunks = -(-n2 // chunk)
    pad = n_chunks * chunk - n2
    d2 = jnp.pad(desc2, ((0, pad), (0, 0)))
    v2 = jnp.pad(valid2, (0, pad))
    d2 = d2.reshape(n_chunks, chunk, -1)
    v2 = v2.reshape(n_chunks, chunk)
    base = jnp.arange(chunk, dtype=jnp.int32)

    def step(carry, inp):
        best, second, bidx = carry
        d2c, v2c, off = inp
        scores = jnp.dot(
            desc1, d2c.T, preferred_element_type=jnp.float32
        )  # [N1, chunk]
        scores = jnp.where(v2c[None, :], scores, _NEG)
        loc_best = jnp.max(scores, axis=1)
        loc_arg = jnp.argmax(scores, axis=1).astype(jnp.int32)
        masked = jnp.where(base[None, :] == loc_arg[:, None], _NEG, scores)
        loc_second = jnp.max(masked, axis=1)
        loc_idx = loc_arg + off
        # Merge local top2 into carry.
        new_best = jnp.maximum(best, loc_best)
        take_loc = loc_best > best
        new_idx = jnp.where(take_loc, loc_idx, bidx)
        new_second = jnp.where(
            take_loc,
            jnp.maximum(best, loc_second),
            jnp.maximum(second, loc_best),
        )
        return (new_best, new_second, new_idx), None

    # Carry stays f32 regardless of descriptor dtype (scores accumulate
    # on the MXU in f32 via preferred_element_type).
    init = (
        jnp.full((n1,), _NEG, jnp.float32),
        jnp.full((n1,), _NEG, jnp.float32),
        jnp.zeros((n1,), jnp.int32),
    )
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best, second, idx), _ = jax.lax.scan(step, init, (d2, v2, offsets))
    return best, second, idx


def _use_pallas(cfg: MatchConfig) -> bool:
    if cfg.use_pallas is not None:
        return cfg.use_pallas
    return jax.default_backend() != "cpu"


def _top2(desc1, desc2, valid2, cfg: MatchConfig, chunk: int):
    if _use_pallas(cfg):
        from sfm_tpu.ops import pallas_match

        return pallas_match.match_top2_pallas(
            desc1, desc2, valid2, bf16=cfg.bf16,
            interpret=jax.default_backend() == "cpu",
        )
    return match_descriptors_top2(desc1, desc2, valid2, chunk=chunk)


@functools.partial(jax.jit, static_argnames=("cfg", "chunk"))
def match(desc1, desc2, valid1=None, valid2=None,
          cfg: MatchConfig = MatchConfig(), *, chunk: int = 2048) -> Matches:
    n1 = desc1.shape[0]
    if valid1 is None:
        valid1 = jnp.ones((n1,), bool)
    best, second, idx = _top2(desc1, desc2, valid2, cfg, chunk)
    ambiguity = second / (best + 1e-6)
    ok = valid1 & (best > cfg.min_score) & (ambiguity < cfg.max_ambiguity)
    if cfg.mutual:
        rbest, _, ridx = _top2(desc2, desc1, valid1, cfg, chunk)
        ok = ok & (ridx[idx] == jnp.arange(n1, dtype=jnp.int32))
    return Matches(index=idx, score=best, ambiguity=ambiguity, valid=ok)
