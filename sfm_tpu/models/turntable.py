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
from sfm_tpu.models import tracks as tracks_mod
from sfm_tpu.utils.precision import f32_matmul


class TurntableModel(NamedTuple):
    axis: jax.Array    # [3] unit rotation axis (world frame)
    center: jax.Array  # [3] a point on the axis
    R0: jax.Array      # [3, 3] base camera world->cam rotation (gauge)
    C0: jax.Array      # [3] base camera center (gauge)
    sign: jax.Array    # [] +1/-1 phase direction


def _rodrigues(axis, ang):
    return lie.so3_exp(axis / jnp.linalg.norm(axis) * ang)


@f32_matmul
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


@f32_matmul
def fit_turntable(R, t, *, close_loop: bool = True,
                  n_ring: int | None = None) -> TurntableModel:
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

    th_new = 2.0 * jnp.pi / (n_ring if n_ring is not None else n)
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


@f32_matmul
def undistort_pixels(uv_pix, c, f, k1, k2, *, fp_iters: int = 5):
    """Observed pixels -> normalized coords under (f, c, k1, k2).

    Fixed-point inversion of xd = xn * (1 + k1 r^2 + k2 r^4); exact in
    the k=0 limit, <1e-3 px residual at dino-class distortion.
    """
    xd = (uv_pix - c) / f
    xn = xd
    for _ in range(fp_iters):
        r2 = jnp.sum(xn * xn, axis=-1, keepdims=True)
        den = 1.0 + k1 * r2 + k2 * r2 * r2
        den = jnp.where(jnp.abs(den) < 0.25, 0.25, den)
        xn = xd / den
    return xn


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_frames", "n_points", "iters", "tri_rounds",
        "estimate_intrinsics", "estimate_k2",
    ),
)
@f32_matmul
def refine_turntable(
    model: TurntableModel,
    cam_idx, pt_idx, uv_pix, mask, K,
    *,
    n_frames: int,
    n_points: int,
    iters: int = 15,
    tri_rounds: int = 4,
    huber_px: float = 2.0,
    prune_px: float = 8.0,
    estimate_intrinsics: bool = True,
    estimate_k2: bool = False,
):
    """Alternating Levenberg-Marquardt on the turntable + intrinsics
    parameters with variable-projected structure.

    Pixel-space residuals under a shared (f, k1, k2) camera: the
    rigid circular-motion constraint leaves the unmodeled radial
    distortion of real footage (the dino frames measure ~6 px rms
    pinhole-only, r2) nowhere to hide, so intrinsics must be free.
    Parameter vector p[8]: axis tangent (2), axis-point shift (3),
    log focal scale, k1, k2.

    Per outer round: (1) undistort + triangulate all tracks under the
    current model, (2) staged prune on pixel residuals, (3) `iters`
    accept/reject LM steps on p with X fixed. Phases are pinned at
    i*2pi/n (see module docstring). Returns
    (model, (f, k1, k2), R [n], t [n], X [P], obs_mask, rms_px).
    """
    dt = uv_pix.dtype
    K = jnp.asarray(K, dt)
    f0 = 0.5 * (K[0, 0] + K[1, 1])
    c = jnp.stack([K[0, 2], K[1, 2]])
    phases = (2.0 * jnp.pi / n_frames) * jnp.arange(n_frames, dtype=dt)
    n_par = 8
    free = jnp.ones((n_par,), dt)
    if not estimate_intrinsics:
        free = free.at[5:].set(0.0)
    if not estimate_k2:
        # k2 trades off against f/k1 on narrow-FOV data and runs away
        # (|k2| > 100 measured on the dino ring, r2): frozen by default.
        free = free.at[7].set(0.0)

    def intr_of(p):
        return f0 * jnp.exp(p[5]), p[6], p[7]

    def residuals(p, X, base):
        m = _params_to_model(p[:5], base)
        R, t = turntable_poses(m, phases)
        f, k1, k2 = intr_of(p)
        Xc = jnp.einsum("oij,oj->oi", R[cam_idx], X[pt_idx]) + t[cam_idx]
        z = Xc[..., 2:3]
        z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        xn = Xc[..., :2] / z
        r2 = jnp.sum(xn * xn, axis=-1, keepdims=True)
        xd = xn * (1.0 + k1 * r2 + k2 * r2 * r2)
        return xd * f + c - uv_pix                     # [O, 2] pixels

    def undistort(p):
        f, k1, k2 = intr_of(p)
        return undistort_pixels(uv_pix, c, f, k1, k2)

    def robust_cost(p, X, base, keep):
        r = residuals(p, X, base)
        rn = jnp.sqrt(jnp.maximum(jnp.sum(r * r, axis=1), 1e-24))
        cst = jnp.where(rn <= huber_px, 0.5 * rn * rn,
                        huber_px * (rn - 0.5 * huber_px))
        return jnp.sum(jnp.where(keep, cst, 0.0))

    def gn_round(carry, round_i):
        base, intr_p, keep = carry
        R, t = turntable_poses(base, phases)
        uv_n = undistort(intr_p)
        X, ok = tri.triangulate_tracks(
            R, t, cam_idx, pt_idx, uv_n, keep, n_points
        )
        r0 = residuals(intr_p, X, base)
        rn = jnp.linalg.norm(r0, axis=1)
        # Staged prune: generous on the first round (the chain-fitted
        # init has tens-of-px residuals on real data), tight after.
        thr = jnp.where(round_i == 0, 6.0 * prune_px, prune_px)
        keep = mask & ok[pt_idx] & (rn < thr)

        def lm_step(carry, _):
            p, lam, cost = carry
            r = residuals(p, X, base)                  # [O, 2]
            J = jax.jacfwd(residuals)(p, X, base)      # [O, 2, 8]
            J = J * free[None, None, :]
            rn2 = jnp.sum(r * r, axis=1)
            w = jnp.where(
                rn2 <= huber_px * huber_px, 1.0,
                huber_px / jnp.sqrt(jnp.maximum(rn2, 1e-24)),
            ) * keep
            Jw = J * w[:, None, None]
            G = jnp.einsum("oki,okj->ij", Jw, J)
            G = G + jnp.diag(1.0 - free)
            g = jnp.einsum("oki,ok->i", Jw, r)
            D = jnp.diag(jnp.maximum(jnp.diag(G), 1e-12))
            dp = -jnp.linalg.solve(G + lam * D, g) * free
            dp = jnp.where(jnp.isfinite(dp), dp, 0.0)
            c_new = robust_cost(p + dp, X, base, keep)
            good = c_new < cost
            p = jnp.where(good, p + dp, p)
            cost = jnp.where(good, c_new, cost)
            lam = jnp.clip(jnp.where(good, lam * 0.3, lam * 6.0),
                           1e-8, 1e8)
            return (p, lam, cost), None

        p0 = intr_p  # pose deltas restart at 0, intrinsics carry over
        p0 = p0.at[:5].set(0.0)
        c0 = robust_cost(p0, X, base, keep)
        (p, _, _), _ = jax.lax.scan(
            lm_step, (p0, jnp.asarray(1e-3, dt), c0), None, length=iters
        )
        return (_params_to_model(p[:5], base), p.at[:5].set(0.0), keep), None

    intr0 = jnp.zeros((n_par,), dt)
    (model, intr_p, keep), _ = jax.lax.scan(
        gn_round, (model, intr0, mask), jnp.arange(tri_rounds),
        length=tri_rounds,
    )
    R, t = turntable_poses(model, phases)
    uv_n = undistort(intr_p)
    X, ok = tri.triangulate_tracks(R, t, cam_idx, pt_idx, uv_n, keep,
                                   n_points)
    r = residuals(intr_p, X, model)
    rn = jnp.linalg.norm(r, axis=1)
    keep = keep & ok[pt_idx] & (rn < prune_px)
    rms = jnp.sqrt(
        jnp.sum(jnp.where(keep, rn * rn, 0.0))
        / jnp.maximum(jnp.sum(keep), 1)
    )
    f, k1, k2 = intr_of(intr_p)
    return model, (f, k1, k2), R, t, X, keep, rms


class TurntableResult(NamedTuple):
    model: TurntableModel   # fitted parametric circular-motion model
    f: float                # recovered shared focal length (px)
    k1: float               # recovered radial distortion
    k2: float
    R: jax.Array            # [n, 3, 3] final (BA-polished) poses
    t: jax.Array            # [n, 3]
    X: jax.Array            # [P, 3] triangulated tracks
    keep: jax.Array         # [O] surviving observations
    tracks: "tracks_mod.TrackSet"
    rms_px: float
    step_deg: jax.Array     # [n-1] relative rotation per ring step
    total_deg: float        # total swept rotation incl. the wrap step


def _steps_deg_np(R):
    import math as _math
    import numpy as _np

    R = _np.asarray(R)
    out = []
    for i in range(1, len(R)):
        tr = _np.clip((_np.trace(R[i] @ R[i - 1].T) - 1) / 2, -1, 1)
        out.append(_math.degrees(_math.acos(tr)))
    return _np.array(out)


def _anneal_free_ba(R, t, cam_idx, pt_idx, uv_n, mask, n_tracks, f_px,
                    schedule, iters):
    """Annealed unconstrained LM-BA over the trackset: per stage,
    re-triangulate, prune at the stage threshold, run_ba at the stage
    Huber width.  No camera is held fixed — the gauge null space is
    handled by LM damping, and pinning a camera whose init is off the
    true ring leaves a permanent seam at that camera (measured r2:
    16-21 deg first ring step with camera 0 fixed, 10.0 +- 0.1 deg
    everywhere without)."""
    import numpy as _np
    import jax.numpy as _jnp

    from sfm_tpu.geometry import triangulate as _tri
    from sfm_tpu.models import bundle_adjust as _ba

    n = len(_np.asarray(R))
    mask_np = _np.asarray(mask)
    pt_idx_np = _np.asarray(pt_idx)
    fixed = _jnp.zeros((n,), bool)

    def resid_px(R, t, X):
        Xc = _jnp.einsum("oij,oj->oi", _jnp.asarray(R)[cam_idx],
                         X[pt_idx]) + _jnp.asarray(t)[cam_idx]
        z = _jnp.where(_jnp.abs(Xc[:, 2:3]) < 1e-8, 1e-8, Xc[:, 2:3])
        return _np.linalg.norm(
            _np.asarray((Xc[:, :2] / z - uv_n) * f_px), axis=1
        )

    keep = mask_np
    X = None
    r = None
    for hub, pru in schedule:
        X, ok = _tri.triangulate_tracks(
            _jnp.asarray(R), _jnp.asarray(t), cam_idx, pt_idx, uv_n,
            _jnp.asarray(keep), n_tracks,
        )
        r = resid_px(R, t, X)
        okm = mask_np & _np.asarray(ok)[pt_idx_np]
        m = _jnp.asarray(okm & (r < pru))
        prob = _ba.BAProblem(cam_idx, pt_idx, uv_n, m, fixed)
        st, _costs = _ba.run_ba(
            _jnp.asarray(R), _jnp.asarray(t), X, prob, iters=iters,
            huber_delta=hub / f_px,
        )
        R, t, X = st.R, st.t, st.X
        r = resid_px(R, t, X)
        keep = okm & (r < pru)
    return R, t, X, keep, r


@f32_matmul
def reconstruct_turntable(
    feats,
    R_chain,
    t_chain,
    K,
    cfg,
    *,
    axis_hint=(0.0, 1.0, 0.0),
    gaps=(1, 2),
    wrap: bool = True,
    estimate_intrinsics: bool = True,
    min_track_len: int = 2,
    pose_valid=None,
    ba_iters: int = 20,
    snap_rounds: int = 1,
) -> TurntableResult:
    """Productized turntable pipeline (host driver).

    Decorated with f32_matmul (r5): the driver's EAGER einsums (axis
    fits, residual pruning, snap projections) otherwise hit the MXU at
    default bf16 on device, outside every jitted f32 scope — the
    device 36-frame drive measured 9.92 +- 2.22 deg/step where the CPU
    run gives 10.00 +- 0.11 (NOTES_R5).

    The r2 investigation (NOTES_R2.md) established that on
    turntable-through-object data the chain reconstruction collapses
    along the bas-relief ridge so badly that neither its rotations nor
    its camera circle survive as an initializer (per-step rotation axes
    flip to the OPTICAL axis on the dino ring).  The chain is therefore
    used ONLY for its gauge (camera-0 pose) and for the bootstrap
    pair's triangulated scene depth (the scale gauge).  Everything else
    is model-free:

      1. ring tracks from descriptor matches incl. the wrap
         loop-closure edges (tracks.build_tracks);
      2. uniform-phase init: phases pinned at i*2pi/n (the loop closes
         360 deg and match survival is gap-symmetric => uniform), axis
         init = `axis_hint` in CAMERA-0 frame (image-vertical: the
         generic turntable viewing geometry; the LM absorbs the true
         tilt), center = camera-0 look-at point at the bootstrap depth;
      3. annealed variable-projected LM on (axis, center) over BOTH
         phase directions, keeping the better (refine_turntable);
      4. a final LM round with shared (f, k1) estimation;
      5. annealed UNCONSTRAINED bundle adjustment (the turntable
         solution is the basin entry; free BA is the accuracy) —
         measured on the 36-frame dino ring: 10.0 +- 0.1 deg/step,
         360.1 deg total, 1.2 px rms over 26k observations;
      6. `snap_rounds` x (fit_turntable -> snap to uniform ring ->
         free BA): projecting onto the constraint manifold and
         re-polishing removes residual seams.
    """
    import math as _math
    import numpy as _np
    import jax.numpy as _jnp

    from sfm_tpu.geometry import triangulate as _tri

    n = len(feats)
    K = _np.asarray(K, _np.float32)
    f0 = 0.5 * float(K[0, 0] + K[1, 1])
    c_xy = _np.array([K[0, 2], K[1, 2]], _np.float32)
    R_chain = _np.asarray(R_chain)
    t_chain = _np.asarray(t_chain)
    if pose_valid is not None:
        pv = _np.asarray(pose_valid)
        if not (pv[0] and pv[1]):
            raise ValueError(
                "turntable init needs the bootstrap pair (frames 0, 1) "
                "registered in the chain"
            )

    pairs = tracks_mod.ring_pairs(n, gaps=gaps, wrap=wrap)
    ts = tracks_mod.build_tracks(feats, pairs, cfg, min_len=min_track_len)
    cam_idx_np = _np.asarray(ts.cam_idx)
    pt_idx_np = _np.asarray(ts.pt_idx)
    uv_n0 = _jnp.asarray((_np.asarray(ts.uv_pix) - c_xy) / f0)

    # --- scene depth from the bootstrap pair (scale gauge only) ---
    in0 = _np.isin(pt_idx_np, pt_idx_np[cam_idx_np == 0])
    in1 = _np.isin(pt_idx_np, pt_idx_np[cam_idx_np == 1])
    sel01 = in0 & in1 & ((cam_idx_np == 0) | (cam_idx_np == 1))
    keep01 = _jnp.asarray(_np.asarray(ts.mask) & sel01)
    X01, ok01 = _tri.triangulate_tracks(
        _jnp.asarray(R_chain[:2]), _jnp.asarray(t_chain[:2]),
        ts.cam_idx, ts.pt_idx, uv_n0, keep01, ts.n_tracks,
    )
    pts01 = _np.unique(pt_idx_np[_np.asarray(keep01)])
    pts01 = pts01[_np.asarray(ok01)[pts01]]
    if len(pts01) < 8:
        raise ValueError(
            f"only {len(pts01)} bootstrap-pair tracks triangulated — "
            "cannot establish the turntable scale gauge"
        )
    Xc0 = _np.asarray(X01)[pts01] @ R_chain[0].T + t_chain[0]
    d_scene = float(_np.median(Xc0[:, 2]))

    C0 = -R_chain[0].T @ t_chain[0]
    viewdir = R_chain[0].T @ _np.array([0.0, 0.0, 1.0])

    def init_model(sign):
        axis = R_chain[0].T @ _np.asarray(axis_hint, _np.float64)
        axis = axis / _np.linalg.norm(axis)
        u = d_scene * viewdir
        u_perp = u - (u @ axis) * axis
        return TurntableModel(
            axis=_jnp.asarray(axis.astype(_np.float32)),
            center=_jnp.asarray((C0 + u_perp).astype(_np.float32)),
            R0=_jnp.asarray(R_chain[0]),
            C0=_jnp.asarray(C0.astype(_np.float32)),
            sign=_jnp.asarray(_np.float32(sign)),
        )

    # --- annealed pinned LM, both phase directions ---
    anneal = [(64.0, 4000.0), (16.0, 64.0), (4.0, 16.0)]
    best = None
    for sign in (1.0, -1.0):
        model = init_model(sign)
        for hub, pru in anneal:
            model, intr, R, t, X, keep, rms = refine_turntable(
                model, ts.cam_idx, ts.pt_idx, ts.uv_pix, ts.mask, K,
                n_frames=n, n_points=ts.n_tracks, iters=12, tri_rounds=2,
                huber_px=hub, prune_px=pru, estimate_intrinsics=False,
            )
        score = int(_np.asarray(keep).sum())
        if best is None or score > best[0]:
            best = (score, model)
    model = best[1]

    import os as _os

    def _dbg(tag, R_, r_px_=None, keep_=None):
        # SFM_TPU_TT_DEBUG=1: per-stage step spread to stderr — the
        # device/CPU divergence forensics hook (NOTES_R5).
        if not _os.environ.get("SFM_TPU_TT_DEBUG"):
            return
        import sys as _sys

        st = _steps_deg_np(R_)
        msg = f"[tt] {tag}: step {st.mean():.3f} +- {st.std():.3f} deg"
        if r_px_ is not None and keep_ is not None:
            k_ = _np.asarray(keep_)
            if k_.any():
                rms_ = float(_np.sqrt((_np.asarray(r_px_)[k_] ** 2).mean()))
                msg += f", rms {rms_:.3f} px ({int(k_.sum())} obs)"
        print(msg, file=_sys.stderr, flush=True)

    # --- final pinned LM with shared-intrinsics estimation ---
    model, intr, R, t, X, keep, rms = refine_turntable(
        model, ts.cam_idx, ts.pt_idx, ts.uv_pix, ts.mask, K,
        n_frames=n, n_points=ts.n_tracks, iters=15, tri_rounds=3,
        huber_px=2.0, prune_px=8.0,
        estimate_intrinsics=estimate_intrinsics,
    )
    f_est, k1, k2 = (float(intr[0]), float(intr[1]), float(intr[2]))
    _dbg("pinned LM", R)

    # --- annealed free BA from the turntable basin ---
    if estimate_intrinsics:
        uv_nd = undistort_pixels(
            ts.uv_pix, _jnp.asarray(c_xy), f_est, k1, k2
        )
    else:
        uv_nd = uv_n0
    dump = _os.environ.get("SFM_TPU_TT_DUMP")
    if dump:
        _np.savez(dump, R=_np.asarray(R), t=_np.asarray(t),
                  cam_idx=_np.asarray(ts.cam_idx),
                  pt_idx=_np.asarray(ts.pt_idx),
                  uv_nd=_np.asarray(uv_nd), mask=_np.asarray(ts.mask),
                  n_tracks=ts.n_tracks, f0=f0)
    R, t, X, keep, r_px = _anneal_free_ba(
        R, t, ts.cam_idx, ts.pt_idx, uv_nd, ts.mask, ts.n_tracks, f0,
        [(8.0, 64.0), (2.0, 12.0)], ba_iters,
    )
    _dbg("free BA", R, r_px, keep)
    # --- snap to the fitted uniform ring and re-polish ---
    for _ in range(snap_rounds):
        model = fit_turntable(_jnp.asarray(R), _jnp.asarray(t), n_ring=n)
        phases = (2.0 * _np.pi / n) * _jnp.arange(n, dtype=_jnp.float32)
        R_s, t_s = turntable_poses(model, phases)
        R, t, X, keep, r_px = _anneal_free_ba(
            R_s, t_s, ts.cam_idx, ts.pt_idx, uv_nd, ts.mask, ts.n_tracks,
            f0, [(4.0, 24.0), (2.0, 8.0)], ba_iters,
        )
        _dbg("snap+BA", R, r_px, keep)
    model = fit_turntable(_jnp.asarray(R), _jnp.asarray(t), n_ring=n)

    steps = _steps_deg_np(R)
    Rn = _np.asarray(R)
    tr_w = _np.clip((_np.trace(Rn[0] @ Rn[-1].T) - 1) / 2, -1, 1)
    total = float(steps.sum() + _math.degrees(_math.acos(tr_w)))
    rms_px = float(_np.sqrt((r_px[keep] ** 2).mean())) if keep.any() else 0.0
    return TurntableResult(
        model=model, f=f_est, k1=k1, k2=k2,
        R=R, t=t, X=X, keep=_jnp.asarray(keep), tracks=ts, rms_px=rms_px,
        step_deg=_jnp.asarray(steps.astype(_np.float32)), total_deg=total,
    )
