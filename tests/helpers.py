"""Shared synthetic-scene fixtures for geometry tests."""

import numpy as np


def rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def synthetic_two_view(
    rng,
    n_points=500,
    noise=5e-4,
    n_outliers=0,
    R=None,
    t=None,
    depth_range=(4.0, 8.0),
):
    """Random scene seen by identity cam and (R, t) cam.

    Returns dict with f32 arrays: x1, x2 [N,3] homogeneous normalized
    coords, X [N,3] ground-truth points, R, t, E (unit Frobenius).
    """
    if R is None:
        R = rot([0.1, 1.0, 0.05], 0.15)
    if t is None:
        t = np.array([0.5, 0.1, 0.05])
        t = t / np.linalg.norm(t)
    X = rng.uniform(
        [-1, -1, depth_range[0]], [1, 1, depth_range[1]], size=(n_points, 3)
    )
    x1 = X / X[:, 2:3]
    Xc2 = X @ R.T + t
    x2 = Xc2 / Xc2[:, 2:3]
    if noise:
        x1 = x1.copy()
        x2 = x2.copy()
        x1[:, :2] += rng.normal(scale=noise, size=(n_points, 2))
        x2[:, :2] += rng.normal(scale=noise, size=(n_points, 2))
    if n_outliers:
        x2[:n_outliers, :2] = rng.uniform(-0.3, 0.3, size=(n_outliers, 2))
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    E = E / np.linalg.norm(E)
    f32 = lambda a: np.asarray(a, np.float32)
    return {
        "x1": f32(x1),
        "x2": f32(x2),
        "X": f32(X),
        "R": f32(R),
        "t": f32(t),
        "E": f32(E),
        "n_outliers": n_outliers,
    }


def e_error(E_est, E_gt):
    """Scale/sign-invariant essential-matrix error."""
    E_est = np.asarray(E_est, np.float64)
    E_est = E_est / np.linalg.norm(E_est)
    E_gt = np.asarray(E_gt, np.float64)
    E_gt = E_gt / np.linalg.norm(E_gt)
    return min(np.abs(E_est - E_gt).max(), np.abs(E_est + E_gt).max())


def rot_angle_error(R_est, R_gt):
    """Geodesic angle between two rotations (radians)."""
    Rd = np.asarray(R_est, np.float64) @ np.asarray(R_gt, np.float64).T
    c = np.clip((np.trace(Rd) - 1) / 2, -1, 1)
    return float(np.arccos(c))


def t_dir_error(t_est, t_gt):
    """Angle between translation directions, sign-invariant (radians)."""
    a = np.asarray(t_est, np.float64)
    a = a / np.linalg.norm(a)
    b = np.asarray(t_gt, np.float64)
    b = b / np.linalg.norm(b)
    c = np.clip(abs(a @ b), -1, 1)
    return float(np.arccos(c))
