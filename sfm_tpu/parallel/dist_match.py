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


def _use_pallas(use_pallas):
    if use_pallas is not None:
        return use_pallas
    return jax.default_backend() != "cpu"


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "chunk", "axis", "use_pallas", "bf16"),
)
def dist_match_top2(desc1, desc2_sh, valid2_sh, mesh: Mesh, *,
                    chunk: int = 2048, axis: str = DATA_AXIS,
                    use_pallas: bool | None = None, bf16: bool = True):
    """Distributed top-2 matching.

    Args:
      desc1: [N1, 128] replicated.
      desc2_sh: [N2, 128] sharded on the leading dim (N2 divisible by
        the mesh size; pad + mask otherwise).
      valid2_sh: [N2] sharded validity.
      use_pallas: per-shard kernel choice; None = auto (the fused
        Pallas top-2 on TPU — same 3.66 ms/16K speed as the local
        matcher — interpret-mode/XLA scan on CPU).

    Returns replicated (best, second, index) with global indices.
    """
    pallas = _use_pallas(use_pallas)

    # Global indices ride the all_gather as float32 alongside the
    # scores (one [D, N1, 3] gather instead of two); f32 represents
    # integers exactly only up to 2^24, so the global N2 must stay
    # under it (ADVICE r4).  16.7M descriptors ~ 8.6 GB — far beyond
    # any per-pair capacity here, but guard it statically.
    assert desc2_sh.shape[0] < (1 << 24), (
        "dist_match merges indices through float32; global N2 >= 2^24 "
        "would corrupt them — gather indices separately at this scale"
    )

    def body(d1, d2_loc, v2_loc):
        n2_loc = d2_loc.shape[0]
        me = jax.lax.axis_index(axis)
        if pallas:
            from sfm_tpu.ops import pallas_match

            best, second, idx = pallas_match.match_top2_pallas(
                d1, d2_loc, v2_loc, bf16=bf16,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            best, second, idx = match_descriptors_top2(
                d1, d2_loc, v2_loc, chunk=min(chunk, n2_loc)
            )
        idx = idx + me * n2_loc  # globalize
        # Gather all devices' candidates and merge: O(D * N1 * 12 B)
        # over ICI.  The merge is branchless max/second arithmetic
        # (same math as the Pallas kernel's cross-lane merge) — the
        # previous argsort over D cost a bitonic sort per column.
        cands = jax.lax.all_gather(
            jnp.stack([best, second, idx.astype(jnp.float32)], axis=-1),
            axis,
        )  # [D, N1, 3]
        b = cands[..., 0]
        s = cands[..., 1]
        ix = cands[..., 2]
        d = b.shape[0]
        diota = jnp.arange(d, dtype=jnp.int32)[:, None]  # [D, 1]
        g_best = jnp.max(b, axis=0)                      # [N1]
        garg = jnp.min(
            jnp.where(b == g_best[None, :], diota, jnp.int32(2 ** 30)),
            axis=0,
        )                                                # [N1]
        at = diota == garg[None, :]                      # [D, N1]
        # Global second-best = max(second of the winning device, best
        # of any other device); exact because each device's (best,
        # second) are its true local top-2.
        runner = jnp.max(jnp.where(at, _NEG, b), axis=0)
        sec_at = jnp.max(jnp.where(at, s, _NEG), axis=0)
        g_second = jnp.maximum(runner, sec_at)
        g_idx = jnp.max(jnp.where(at, ix, -1.0), axis=0).astype(jnp.int32)
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
        desc1, desc2, valid2, mesh, chunk=chunk, axis=axis,
        use_pallas=cfg.use_pallas, bf16=cfg.bf16,
    )
    ambiguity = second / (best + 1e-6)
    ok = valid1 & (best > cfg.min_score) & (ambiguity < cfg.max_ambiguity)
    return Matches(index=idx, score=best, ambiguity=ambiguity, valid=ok)
