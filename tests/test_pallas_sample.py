"""Parity tests: Pallas sampling kernels (interpret mode) vs the XLA
gather implementations.  On CPU the kernels run interpreted; the same
code path compiles via Mosaic on TPU."""

import numpy as np
import jax.numpy as jnp

from sfm_tpu.ops import pallas_sample
from sfm_tpu.sift import describe, orient


def _setup(rng, K=16, H=128, W=160):
    img = (rng.normal(size=(H, W)).astype(np.float32) * 30 + 100)
    x = rng.uniform(25, W - 30, K).astype(np.float32)
    y = rng.uniform(25, H - 30, K).astype(np.float32)
    sc = rng.uniform(0.8, 1.9, K).astype(np.float32)
    ori = rng.uniform(0, 360, K).astype(np.float32)
    return map(jnp.asarray, (img, x, y, sc, ori))


def test_descriptor_kernel_matches_gather_path(rng):
    img, x, y, sc, ori = _setup(rng)
    raw = pallas_sample.descriptor_sample(img, x, y, sc, ori, interpret=True)
    d1 = np.array(describe.normalize_descriptors(raw))
    d_ref = np.array(describe.extract_descriptors(img, x, y, sc, ori))
    corr = (d1 * d_ref).sum(1)
    assert corr.min() > 0.9999, corr.min()


def test_orientation_kernel_matches_gather_path(rng):
    img, x, y, sc, _ = _setup(rng)
    h = np.array(
        pallas_sample.orientation_histogram_sample(img, x, y, sc, interpret=True)
    )
    h_ref = np.array(orient.orientation_histograms(img, x, y, sc))
    rel = np.abs(h - h_ref) / (np.abs(h_ref) + 1e-3)
    assert rel.max() < 1e-3, rel.max()


def test_descriptor_kernel_border_keypoints(rng):
    # Keypoints hugging the borders must not crash or produce NaN.
    img = jnp.asarray(rng.normal(size=(96, 96)).astype(np.float32) * 50)
    x = jnp.asarray(np.array([1.0, 94.0, 48.0, 2.5], np.float32))
    y = jnp.asarray(np.array([1.0, 2.0, 94.0, 93.5], np.float32))
    sc = jnp.asarray(np.full(4, 1.5, np.float32))
    ori = jnp.asarray(np.array([0.0, 90.0, 180.0, 270.0], np.float32))
    raw = pallas_sample.descriptor_sample(img, x, y, sc, ori, interpret=True,
                                          block_k=4)
    assert np.isfinite(np.array(raw)).all()


def test_atan2_polynomial_accuracy(rng):
    y = jnp.asarray(rng.normal(size=(64, 1)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(64, 1)).astype(np.float32))
    ref = np.arctan2(np.array(y), np.array(x))
    got = np.array(pallas_sample._atan2(y, x))
    assert np.abs(got - ref).max() < 1e-5


def test_small_octave_image(rng):
    # Octave images smaller than the patch (36x45) must be handled by
    # the padding wrapper.
    img = jnp.asarray(rng.normal(size=(36, 45)).astype(np.float32) * 50)
    x = jnp.asarray(np.array([10.0, 30.0, 22.0, 5.0], np.float32))
    y = jnp.asarray(np.array([10.0, 20.0, 30.0, 18.0], np.float32))
    sc = jnp.asarray(np.full(4, 1.2, np.float32))
    ori = jnp.asarray(np.full(4, 45.0, np.float32))
    raw = pallas_sample.descriptor_sample(img, x, y, sc, ori, interpret=True,
                                          block_k=4)
    assert np.isfinite(np.array(raw)).all()
    h = pallas_sample.orientation_histogram_sample(img, x, y, sc,
                                                   interpret=True, block_k=4)
    assert np.isfinite(np.array(h)).all()


def test_partial_count_zero_fills_tail():
    rng = np.random.default_rng(7)
    # Slots with i >= count must come back EXACTLY zero (the kernel
    # zero-fills its block before the count-gated writes) — r1 advisor
    # finding: uninitialized VMEM could leak NaN garbage on real TPU.
    img, x, y, sc, ori = _setup(rng)
    raw = np.array(
        pallas_sample.descriptor_sample(img, x, y, sc, ori, count=5,
                                        interpret=True)
    )
    assert np.isfinite(raw).all()
    assert (raw[5:] == 0.0).all()
    assert np.abs(raw[:5]).sum() > 0
    h = np.array(
        pallas_sample.orientation_histogram_sample(img, x, y, sc, count=3,
                                                   interpret=True)
    )
    assert np.isfinite(h).all()
    assert (h[3:] == 0.0).all()
    assert np.abs(h[:3]).sum() > 0
