"""Tests for sfm_tpu.ops.linalg — the batched small-matrix solvers.

Parity model: the reference validated its solver primitives with
hand-run printf tests (reference SfM/sfm.cu:386-510, e.g. testSVD at
:424); here every primitive is checked against numpy f64.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sfm_tpu.ops import linalg


def test_jacobi_eigh_matches_numpy(rng):
    A = rng.normal(size=(64, 9, 9)).astype(np.float32)
    A = A + A.transpose(0, 2, 1)
    w, V = linalg.jacobi_eigh(jnp.asarray(A))
    w_np = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.array(w), w_np, atol=2e-4)
    # Eigen-equation residual A v = w v
    res = np.einsum("bij,bjk->bik", A, np.array(V)) - np.array(w)[:, None, :] * np.array(V)
    assert np.abs(res).max() < 5e-4
    # Orthonormal V
    I = np.einsum("bki,bkj->bij", np.array(V), np.array(V))
    assert np.abs(I - np.eye(9)).max() < 1e-5


@pytest.mark.parametrize("n", [3, 4, 9])
def test_jacobi_eigh_sizes(rng, n):
    A = rng.normal(size=(8, n, n)).astype(np.float32)
    A = A + A.transpose(0, 2, 1)
    w, _ = linalg.jacobi_eigh(jnp.asarray(A))
    np.testing.assert_allclose(np.array(w), np.linalg.eigvalsh(A), atol=2e-4)


def test_eigh3x3_matches_numpy(rng):
    A = rng.normal(size=(256, 3, 3)).astype(np.float32)
    A = A + A.transpose(0, 2, 1)
    w, V = linalg.eigh3x3(jnp.asarray(A))
    w, V = np.array(w), np.array(V)
    np.testing.assert_allclose(w, np.linalg.eigvalsh(A), atol=3e-5)
    res = np.einsum("bij,bjk->bik", A, V) - w[:, None, :] * V
    assert np.abs(res).max() < 2e-4
    I = np.einsum("bki,bkj->bij", V, V)
    assert np.abs(I - np.eye(3)).max() < 2e-5


def test_eigh3x3_degenerate():
    # The spectra the pipeline actually produces: essential (1,1,0),
    # rotation Gram (1,1,1), rank-1, zero, plus scaled variants.
    rng = np.random.default_rng(7)
    Q, _ = np.linalg.qr(rng.normal(size=(6, 3, 3)))
    spectra = np.array([
        [1.0, 1.0, 0.0],
        [1.0, 1.0, 1.0],
        [1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
        [100.0, 100.0, 1e-4],
        [3.0, 2.9999, 1.0],
    ], np.float32)
    A = np.einsum("bik,bk,bjk->bij", Q, spectra, Q).astype(np.float32)
    w, V = linalg.eigh3x3(jnp.asarray(A))
    w, V = np.array(w), np.array(V)
    np.testing.assert_allclose(
        w, np.sort(spectra, axis=1), atol=1e-4, rtol=1e-4
    )
    # Orthonormality always holds; reconstruction A = V w V^T is the
    # subspace-invariant correctness check for degenerate pairs.
    I = np.einsum("bki,bkj->bij", V, V)
    assert np.abs(I - np.eye(3)).max() < 2e-5
    rec = np.einsum("bik,bk,bjk->bij", V, w, V)
    assert np.abs(rec - A).max() < 2e-3


def test_eigh3x3_scale_invariant(rng):
    # Cross-product eigenvector norms are quartic in ||A||: without
    # input normalization the solver overflowed at ||A|| >= 1e9 and
    # denormalized below 1e-18 (V collapsed to zero, ortho error 1.0).
    A0 = rng.normal(size=(32, 3, 3)).astype(np.float64)
    A0 = A0 + A0.transpose(0, 2, 1)
    for scale in (1e-18, 1e-9, 1.0, 1e9, 1e15):
        A = (A0 * scale).astype(np.float32)
        w, V = linalg.eigh3x3(jnp.asarray(A))
        w, V = np.array(w), np.array(V)
        wn = np.linalg.eigvalsh(A.astype(np.float64))
        assert np.abs(w - wn).max() <= 1e-5 * max(np.abs(wn).max(), 1e-30), scale
        I = np.einsum("bki,bkj->bij", V, V)
        assert np.abs(I - np.eye(3)).max() < 1e-5, scale


def test_svd3x3_analytic_vs_jacobi(rng):
    M = rng.normal(size=(64, 3, 3)).astype(np.float32)
    Ua, sa, Va = linalg.svd3x3(jnp.asarray(M))
    Uj, sj, Vj = linalg.svd3x3(jnp.asarray(M), method="jacobi")
    np.testing.assert_allclose(np.array(sa), np.array(sj), atol=1e-4)
    ra = np.einsum("bik,bk,bjk->bij", np.array(Ua), np.array(sa), np.array(Va))
    rj = np.einsum("bik,bk,bjk->bij", np.array(Uj), np.array(sj), np.array(Vj))
    assert np.abs(ra - M).max() < 5e-5
    assert np.abs(rj - M).max() < 5e-5


def test_gram_nullvec4_adj(rng):
    # Near-singular 4-column systems like DLT triangulation produces:
    # A = B (I - v v^T) + eps * noise, null direction v.
    v = rng.normal(size=(64, 4))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    B = rng.normal(size=(64, 4, 4))
    P = np.eye(4)[None] - np.einsum("bi,bj->bij", v, v)
    A = (np.einsum("bmi,bij->bmj", B, P)
         + 1e-4 * rng.normal(size=(64, 4, 4))).astype(np.float32)
    nv = np.array(linalg.gram_nullvec4_adj(jnp.asarray(A)))
    np.testing.assert_allclose(np.linalg.norm(nv, axis=-1), 1.0, atol=1e-5)
    dots = np.abs(np.einsum("bi,bi->b", nv, v))
    np.testing.assert_allclose(dots, 1.0, atol=1e-2)
    # Zero system: canonical w-axis fallback.
    z = np.array(linalg.gram_nullvec4_adj(jnp.zeros((1, 4, 4))))
    np.testing.assert_allclose(z[0], [0, 0, 0, 1])


def test_gram_nullvec4_adj_scale_invariant(rng):
    # Cofactors are cubic in G (~||A||^6): without normalization this
    # overflows f32 at row scale ~1e3 and underflows at ~1e-3 (r2
    # review finding — returned garbage with |dot| = 0, no NaN).
    v = rng.normal(size=(32, 4))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    B = rng.normal(size=(32, 4, 4))
    P = np.eye(4)[None] - np.einsum("bi,bj->bij", v, v)
    A0 = np.einsum("bmi,bij->bmj", B, P) + 1e-5 * rng.normal(size=(32, 4, 4))
    for scale in (1e-4, 1e-3, 1.0, 1e3, 1e4):
        A = (A0 * scale).astype(np.float32)
        nv = np.array(linalg.gram_nullvec4_adj(jnp.asarray(A)))
        dots = np.abs(np.einsum("bi,bi->b", nv, v))
        assert dots.min() > 0.99, (scale, dots.min())


def test_smallest_eigvec(rng):
    # Construct matrices with a known small eigenpair.
    Q, _ = np.linalg.qr(rng.normal(size=(16, 5, 5)))
    w = rng.uniform(1.0, 10.0, size=(16, 5))
    w[:, 2] = 1e-4  # the known smallest
    A = np.einsum("bik,bk,bjk->bij", Q, w, Q).astype(np.float32)
    v = np.array(linalg.smallest_eigvec(jnp.asarray(A)))
    dots = np.abs(np.einsum("bi,bi->b", v, Q[:, :, 2]))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_gram_nullvec(rng):
    # A [m, n] with exact null vector v: A = B (I - v v^T)
    v = rng.normal(size=(12, 9))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    B = rng.normal(size=(12, 8, 9))
    P = np.eye(9)[None] - np.einsum("bi,bj->bij", v, v)
    A = np.einsum("bmi,bij->bmj", B, P).astype(np.float32)
    nv = np.array(linalg.gram_nullvec(jnp.asarray(A)))
    dots = np.abs(np.einsum("bi,bi->b", nv, v))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_svd3x3(rng):
    M = rng.normal(size=(32, 3, 3)).astype(np.float32)
    U, s, V = linalg.svd3x3(jnp.asarray(M))
    U, s, V = np.array(U), np.array(s), np.array(V)
    rec = np.einsum("bik,bk,bjk->bij", U, s, V)
    assert np.abs(rec - M).max() < 5e-5
    np.testing.assert_allclose(s, np.linalg.svd(M, compute_uv=False), atol=1e-4)
    assert np.all(s[:, 0] >= s[:, 1]) and np.all(s[:, 1] >= s[:, 2] - 1e-6)
    for Q in (U, V):
        I = np.einsum("bik,bjk->bij", Q, Q)
        assert np.abs(I - np.eye(3)).max() < 1e-5


def test_project_to_essential(rng):
    M = rng.normal(size=(16, 3, 3)).astype(np.float32)
    E = np.array(linalg.project_to_essential(jnp.asarray(M)))
    s = np.linalg.svd(E, compute_uv=False)
    np.testing.assert_allclose(s[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(s[:, 1], 1.0, atol=1e-5)
    np.testing.assert_allclose(s[:, 2], 0.0, atol=1e-5)


def test_so3_project(rng):
    from helpers import rot

    R = np.stack([rot(rng.normal(size=3), a) for a in rng.uniform(0, 3, 8)])
    M = (R + rng.normal(scale=0.05, size=R.shape)).astype(np.float32)
    Rp = np.array(linalg.so3_project(jnp.asarray(M)))
    dets = np.linalg.det(Rp)
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)
    I = np.einsum("bik,bjk->bij", Rp, Rp)
    assert np.abs(I - np.eye(3)).max() < 1e-4
    # Close to the original rotation
    assert np.abs(Rp - R).max() < 0.1


def test_cross_matrix(rng):
    t = rng.normal(size=(7, 3)).astype(np.float32)
    K = np.array(linalg.cross_matrix(jnp.asarray(t)))
    v = rng.normal(size=(7, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", K, v), np.cross(t, v), atol=1e-6
    )
