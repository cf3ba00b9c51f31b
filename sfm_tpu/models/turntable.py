"""Turntable-constrained reconstruction (circular-motion SfM).

NO reference counterpart — the reference is strictly two-view and its
canonical dino data (/root/reference/data/dino/, 37 frames) is the
classic turntable sequence. Round-2 investigation (NOTES_R2.md)
established that on this data the UNCONSTRAINED maximum-likelihood
reconstruction collapses along the bas-relief ridge: the object
subtends ~5 deg of a ~17 deg FOV, the rotation/translation-separating
parallax is a second-order ~1 px signal, and free bundle adjustment
prefers ~4.5 deg/step at 0.5 px reprojection no matter how it is
initialized (per-segment re-collapse, with the 360 deg loop dumped
into one seam). Two model-free measurements pin the truth instead:

  * the sequence closes a full loop (viff.036 is byte-identical to
    viff.000, and the wrap pair matches as strongly as any adjacent
    pair), so the total rotation is 360 deg;
  * SIFT match survival is symmetric in frame gap (dies at gap ~4-5
    everywhere around the ring), so the angular spacing is uniform.

Those two facts fix the per-frame phases at i * 2pi/n — the classical
circular-motion constraint used on this very dataset in the
structure-from-motion literature. This module fits the remaining
turntable parameters (axis direction, axis position) plus the point
cloud to the image observations.

TPU-first shape: the pose chain is GENERATED from a 5-parameter model,
points are variable-projected out by one batched multiview DLT
(triangulate_tracks — segment-sum + vmapped 3x3 solves), and the
5-parameter Gauss-Newton step uses forward-mode autodiff through the
pose construction over ALL observations at once. Everything is one
jitted fixed-iteration program; no data-dependent host control flow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.geometry import lie, triangulate as tri


class TurntableModel(NamedTuple):
    axis: jax.Array    # [3] unit rotation axis (world frame)
    center: jax.Array  # [3] a point on the axis
    R0: jax.Array      # [3, 3] base camera world->cam rotation (gauge)
    C0: jax.Array      # [3] base camera center (gauge)
    sign: jax.Array    # [] +1/-1 phase direction


def _rodrigues(axis, ang):
    return lie.so3_exp(axis / jnp.linalg.norm(axis) * ang)


def turntable_poses(model: TurntableModel, phases):
    """Generate [n] camera poses from the model at the given phases.

    R_i = R0 Rot_axis(sign*phi_i)^T, C_i = c + Rot(sign*phi_i)(C0 - c).
    """
    ang = model.sign * phases
    Rots = jax.vmap(lambda a: _rodrigues(model.axis, a))(ang)  # [n,3,3]
    R = jnp.einsum("ij,njk->nik", model.R0, jnp.swapaxes(Rots, -1, -2))
    C = model.center + jnp.einsum("nij,j->ni", Rots, model.C0 - model.center)
    t = -jnp.einsum("nij,nj->ni", R, C)
    return R, t


def fit_turntable(R, t, *, close_loop: bool = True) -> TurntableModel:
    """Fit the turntable model to a chain reconstruction.

    Axis = mean relative-rotation axis; axis position = circle fit of
    the camera centers in the plane normal to it. With `close_loop`,
    the circle radius is rescaled chord-preservingly so the fitted
    mean step TH_OLD maps onto 2pi/n (the collapsed chain measures
    chords — translation scale — more reliably than angles).
    Camera 0 is kept exactly (gauge).
    """
    n = R.shape[0]
    C = -jnp.einsum("mij,mi->mj", R, t)
    dR = jnp.einsum("mji,mjk->mik", R[:-1], R[1:])    # R_{i-1}^T R_i
    rv = jax.vmap(lie.so3_log)(dR)                     # [n-1, 3]
    angs = jnp.linalg.norm(rv, axis=1)
    axes = rv / jnp.maximum(angs[:, None], 1e-12)
    axis = jnp.sum(axes, axis=0)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    th_old = jnp.mean(angs)

    # Circle fit in the plane normal to axis.
    cm = jnp.mean(C, axis=0)
    d = (C - cm) @ axis
    Pp = C - d[:, None] * axis[None, :]
    ref = jnp.where(jnp.abs(axis[0]) < 0.9,
                    jnp.array([1.0, 0.0, 0.0], axis.dtype),
                    jnp.array([0.0, 1.0, 0.0], axis.dtype))
    b1 = jnp.cross(axis, ref)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(axis, b1)
    Q = (Pp - jnp.mean(Pp, axis=0)) @ jnp.stack([b1, b2]).T      # [n, 2]
    A2 = jnp.concatenate([2 * Q, jnp.ones((n, 1), Q.dtype)], axis=1)
    rhs = jnp.sum(Q * Q, axis=1)
    sol = jnp.linalg.lstsq(A2, rhs)[0]
    cc = sol[:2]
    rad = jnp.sqrt(jnp.maximum(sol[2] + cc @ cc, 1e-18))
    center = jnp.mean(Pp, axis=0) + cc[0] * b1 + cc[1] * b2 \
        + jnp.mean(d) * axis

    th_new = 2.0 * jnp.pi / n
    if close_loop:
        rad_new = rad * jnp.sin(th_old / 2.0) / jnp.sin(th_new / 2.0)
    else:
        rad_new = rad
    C0 = C[0]
    u = center - C0
    u = u - (u @ axis) * axis
    center = C0 + u * (rad_new / jnp.maximum(jnp.linalg.norm(u), 1e-12))

    # Phase direction: which sign of one step moves C0 toward C1.
    step = th_old
    p_pos = center + _rodrigues(axis, step) @ (C0 - center)
    p_neg = center + _rodrigues(axis, -step) @ (C0 - center)
    sign = jnp.where(
        jnp.sum((p_pos - C[1]) ** 2) <= jnp.sum((p_neg - C[1]) ** 2),
        1.0, -1.0,
    ).astype(R.dtype)
    return TurntableModel(axis=axis, center=center, R0=R[0], C0=C[0],
                          sign=sign)


def _params_to_model(p, base: TurntableModel):
    """5-vector -> model: axis rotated by 2 tangent angles, center + dc."""
    dax = p[:2]
    dR = lie.so3_exp(jnp.concatenate([dax, jnp.zeros((1,), p.dtype)]))
    # Rotate the axis by a small rotation expressed in a frame where
    # the current axis is the z-axis.
    ref = jnp.where(jnp.abs(base.axis[0]) < 0.9,
                    jnp.array([1.0, 0.0, 0.0], p.dtype),
                    jnp.array([0.0, 1.0, 0.0], p.dtype))
    b1 = jnp.cross(base.axis, ref)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(base.axis, b1)
    B = jnp.stack([b1, b2, base.axis], axis=1)        # world <- axis-frame
    axis = B @ (dR @ jnp.array([0.0, 0.0, 1.0], p.dtype))
    return base._replace(axis=axis, center=base.center + p[2:5])


@functools.partial(
    jax.jit, static_argnames=("n_frames", "n_points", "iters", "tri_rounds")
)
def refine_turntable(
    model: TurntableModel,
    cam_idx, pt_idx, uv_n, mask,
    *,
    n_frames: int,
    n_points: int,
    iters: int = 12,
    tri_rounds: int = 3,
    huber: float = 1.2e-3,
    prune: float = 3e-3,
):
    """Alternating Gauss-Newton on the 5 turntable parameters with
    variable-projected structure.

    Per outer round: (1) triangulate all tracks under the current
    poses, (2) prune observations beyond `prune` (normalized units),
    (3) `iters` IRLS-GN steps on (axis, center) with Huber weights.
    Phases are pinned at i*2pi/n (see module docstring). Returns
    (model, R [n], t [n], X [P], obs_mask, rms_norm).
    """
    phases = (2.0 * jnp.pi / n_frames) * jnp.arange(
        n_frames, dtype=uv_n.dtype
    )

    def residuals(p, X, base):
        m = _params_to_model(p, base)
        R, t = turntable_poses(m, phases)
        Xc = jnp.einsum("oij,oj->oi", R[cam_idx], X[pt_idx]) + t[cam_idx]
        z = Xc[..., 2:3]
        z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        return Xc[..., :2] / z - uv_n                  # [O, 2]

    def gn_round(carry, _):
        base, keep = carry
        R, t = turntable_poses(base, phases)
        X, ok = tri.triangulate_tracks(
            R, t, cam_idx, pt_idx, uv_n, keep, n_points
        )
        r0 = residuals(jnp.zeros((5,), uv_n.dtype), X, base)
        rn = jnp.linalg.norm(r0, axis=1)
        keep = mask & ok[pt_idx] & (rn < prune)

        def gn_step(p, _):
            r = residuals(p, X, base)                  # [O, 2]
            J = jax.jacfwd(residuals)(p, X, base)      # [O, 2, 5]
            rn2 = jnp.sum(r * r, axis=1)
            w = jnp.where(
                rn2 <= huber * huber, 1.0,
                huber / jnp.sqrt(jnp.maximum(rn2, 1e-24)),
            ) * keep
            Jw = J * w[:, None, None]
            G = jnp.einsum("oki,okj->ij", Jw, J)
            g = jnp.einsum("oki,ok->i", Jw, r)
            dp = -jnp.linalg.solve(
                G + 1e-9 * jnp.eye(5, dtype=uv_n.dtype), g
            )
            return p + dp, None

        p, _ = jax.lax.scan(gn_step, jnp.zeros((5,), uv_n.dtype),
                            None, length=iters)
        return (_params_to_model(p, base), keep), None

    (model, keep), _ = jax.lax.scan(
        gn_round, (model, mask), None, length=tri_rounds
    )
    R, t = turntable_poses(model, phases)
    X, ok = tri.triangulate_tracks(R, t, cam_idx, pt_idx, uv_n, keep,
                                   n_points)
    r = residuals(jnp.zeros((5,), uv_n.dtype), X, model)
    rn = jnp.linalg.norm(r, axis=1)
    keep = keep & ok[pt_idx] & (rn < prune)
    rms = jnp.sqrt(
        jnp.sum(jnp.where(keep, rn * rn, 0.0))
        / jnp.maximum(jnp.sum(keep), 1)
    )
    return model, R, t, X, keep, rms
