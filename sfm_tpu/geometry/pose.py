"""Pose recovery from an essential matrix.

TPU-native replacement for the reference's ``computePosecandidates`` +
``choosePose`` (reference SfM/sfm.cu:238-307): the reference copies E to
the host, runs a CPU 3x3 SVD, builds 4 candidate poses in a kernel, then
does 4 *serial* host-side triangulate/invert/readback iterations testing
cheirality on a SINGLE point.  Here everything stays on device: batched
3x3 SVD, all 4 candidates triangulate ALL correspondences in one vmapped
solve, and the winner is an argmax over positive-depth counts — far more
robust than the reference's one-point test, and jit-fusable end to end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sfm_tpu.ops import linalg
from sfm_tpu.geometry import triangulate as tri

# W = Rz(+90deg), the twist used in E = [t]_x R factorization
# (reference SfM/kernels.h:357-385 builds the same four candidates).
_W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def pose_candidates(E, *, sweeps: int = 8):
    """Four candidate (R, t) from E.

    Returns (Rs [..., 4, 3, 3], ts [..., 4, 3]).
    """
    U, _, V = linalg.svd3x3(E, sweeps=sweeps)
    # Enforce proper rotations: flip the last column where det < 0
    # (reference negates V on det(U V^T) < 0, SfM/sfm.cu:241-245).
    dU = jnp.linalg.det(U)
    dV = jnp.linalg.det(V)
    U = U.at[..., :, 2].multiply(jnp.where(dU < 0, -1.0, 1.0)[..., None])
    V = V.at[..., :, 2].multiply(jnp.where(dV < 0, -1.0, 1.0)[..., None])
    W = _W.astype(E.dtype)
    R1 = jnp.einsum("...ik,kl,...jl->...ij", U, W, V)
    R2 = jnp.einsum("...ik,lk,...jl->...ij", U, W, V)
    u3 = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([u3, -u3, u3, -u3], axis=-2)
    return Rs, ts


@functools.partial(jax.jit, static_argnames=("sweeps",))
def align_candidates(E, R_ref, t_ref, *, sweeps: int = 8):
    """Pick the (R, t) candidate of E closest to a reference pose.

    Used after on-manifold refinement: the Sampson objective cannot see
    the 4-fold (R, t) ambiguity, so the branch must be preserved from
    the pre-refinement cheirality vote — re-voting on the refined E can
    flip to the wrong branch when votes are marginal (observed on the
    dino's near-forward motion).
    """
    Rs, ts = pose_candidates(E, sweeps=sweeps)
    rot_score = jnp.einsum("cij,ij->c", Rs, R_ref)  # trace(R_c R_ref^T)
    t_score = ts @ t_ref
    best = jnp.argmax(rot_score + t_score)
    return Rs[best], ts[best]


@functools.partial(jax.jit, static_argnames=("sweeps",))
def recover_pose(E, x1, x2, weights=None, *, sweeps: int = 8):
    """Pick the cheirality-correct (R, t) among the 4 candidates of E.

    Args:
      E: [3, 3] essential matrix.
      x1, x2: [N, 3] normalized homogeneous correspondences.
      weights: optional [N] mask/weights (e.g. RANSAC inliers) for voting.

    Returns dict with R [3,3], t [3], index of winning candidate, and the
    per-candidate positive-depth vote counts [4].
    """
    Rs, ts = pose_candidates(E, sweeps=sweeps)  # [4,3,3], [4,3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=E.dtype), Rs.shape)
    zero = jnp.zeros_like(ts)
    P1 = tri.make_projection(eye, zero)  # [4,3,4] identity cams
    P2 = tri.make_projection(Rs, ts)
    X, w, finite = tri.triangulate(
        x1[None], x2[None], P1, P2, sweeps=sweeps
    )  # [4, N, 3]
    z1 = X[..., 2]
    z2 = tri.depths(X, Rs, ts)  # [4, N]
    good = (z1 > 0) & (z2 > 0)
    if weights is None:
        votes = jnp.sum(good, axis=-1).astype(jnp.float32)
    else:
        votes = jnp.sum(good * weights[None, :], axis=-1)
    best = jnp.argmax(votes)
    return {
        "R": Rs[best],
        "t": ts[best],
        "index": best,
        "votes": votes,
        "points": X[best],
        "front": good[best],
        "finite": finite[best],
    }
