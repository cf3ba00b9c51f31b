"""Sharded pairwise descriptor matching across the device mesh.

NO reference counterpart (single-GPU matcher,
reference CudaSift/matching.cu).  Strategy: replicate the left
descriptor set, shard the right set over devices; each device runs the
running-top-2 matcher against its shard; the global top-2 merge is an
all_gather of the tiny [N1]-sized candidate tuples followed by a
branchless merge — O(D * N1) bytes over ICI vs O(N1 * N2) compute kept
local.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sfm_tpu.config import MatchConfig
from sfm_tpu.sift.match import Matches, match_descriptors_top2, _NEG
from sfm_tpu.parallel.mesh import DATA_AXIS


@functools.partial(jax.jit, static_argnames=("mesh", "chunk", "axis"))
def dist_match_top2(desc1, desc2_sh, valid2_sh, mesh: Mesh, *,
                    chunk: int = 2048, axis: str = DATA_AXIS):
    """Distributed top-2 matching.

    Args:
      desc1: [N1, 128] replicated.
      desc2_sh: [N2, 128] sharded on the leading dim (N2 divisible by
        the mesh size; pad + mask otherwise).
      valid2_sh: [N2] sharded validity.

    Returns replicated (best, second, index) with global indices.
    """

    def body(d1, d2_loc, v2_loc):
        n2_loc = d2_loc.shape[0]
        me = jax.lax.axis_index(axis)
        best, second, idx = match_descriptors_top2(
            d1, d2_loc, v2_loc, chunk=min(chunk, n2_loc)
        )
        idx = idx + me * n2_loc  # globalize
        # Gather all devices' candidates and merge.
        cands = jax.lax.all_gather(
            jnp.stack([best, second, idx.astype(d1.dtype)], axis=-1), axis
        )  # [D, N1, 3]
        b = cands[..., 0]
        s = cands[..., 1]
        ix = cands[..., 2]
        order = jnp.argsort(-b, axis=0)  # [D, N1] best device first
        b_sorted = jnp.take_along_axis(b, order, axis=0)
        ix_sorted = jnp.take_along_axis(ix, order, axis=0)
        s_sorted = jnp.take_along_axis(s, order, axis=0)
        g_best = b_sorted[0]
        g_idx = ix_sorted[0].astype(jnp.int32)
        # Global second best: max(second of winning device, best of
        # runner-up device).
        d = b.shape[0]
        runner = b_sorted[1] if d > 1 else jnp.full_like(g_best, _NEG)
        g_second = jnp.maximum(s_sorted[0], runner)
        return g_best, g_second, g_idx

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(desc1, desc2_sh, valid2_sh)


@functools.partial(jax.jit, static_argnames=("mesh", "cfg", "chunk", "axis"))
def dist_match(desc1, desc2, valid1=None, valid2=None,
               cfg: MatchConfig = MatchConfig(), *, mesh: Mesh,
               chunk: int = 2048, axis: str = DATA_AXIS) -> Matches:
    """Mesh-sharded drop-in for sift.match.match (same Matches contract:
    ratio test, score threshold).  N2 must divide by the mesh size —
    the fixed keypoint capacities are chosen to (frontend capacity =
    num_octaves * 2 * max_pts_per_octave, a multiple of typical mesh
    sizes); otherwise pad + mask desc2 before calling.
    """
    n1 = desc1.shape[0]
    if valid1 is None:
        valid1 = jnp.ones((n1,), bool)
    if valid2 is None:
        valid2 = jnp.ones((desc2.shape[0],), bool)
    best, second, idx = dist_match_top2(
        desc1, desc2, valid2, mesh, chunk=chunk, axis=axis
    )
    ambiguity = second / (best + 1e-6)
    ok = valid1 & (best > cfg.min_score) & (ambiguity < cfg.max_ambiguity)
    return Matches(index=idx, score=best, ambiguity=ambiguity, valid=ok)
