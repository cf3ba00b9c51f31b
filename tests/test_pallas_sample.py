"""Parity tests: Pallas sampling kernels (interpret mode) vs the XLA
gather implementations.  On CPU the kernels run interpreted; the same
code path compiles via Mosaic on TPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from sfm_tpu.ops import pallas_sample
from sfm_tpu.sift import describe, orient


def _setup(rng, K=16, H=128, W=160):
    img = (rng.normal(size=(H, W)).astype(np.float32) * 30 + 100)
    x = rng.uniform(25, W - 30, K).astype(np.float32)
    y = rng.uniform(25, H - 30, K).astype(np.float32)
    sc = rng.uniform(0.8, 1.9, K).astype(np.float32)
    ori = rng.uniform(0, 360, K).astype(np.float32)
    return map(jnp.asarray, (img, x, y, sc, ori))


@pytest.mark.slow
def test_descriptor_kernel_matches_gather_path(rng):
    img, x, y, sc, ori = _setup(rng)
    raw = pallas_sample.descriptor_sample(img, x, y, sc, ori, interpret=True)
    d1 = np.array(describe.normalize_descriptors(raw))
    d_ref = np.array(describe.extract_descriptors(img, x, y, sc, ori))
    corr = (d1 * d_ref).sum(1)
    assert corr.min() > 0.9999, corr.min()


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_fused_kernel_matches_two_stage(rng):
    # The fused orientation+descriptor kernel must reproduce the
    # two-stage path: same dual peaks, same descriptors.
    img, x, y, sc, _ = _setup(rng, K=16)
    d1, d2, ori1, ori2, dup = pallas_sample.fused_orient_descriptor(
        img, x, y, sc, interpret=True)
    h_ref = orient.orientation_histograms(img, x, y, sc)
    o1_ref, o2_ref, v2_ref = orient.orientations_from_histograms(
        h_ref, jnp.ones(16, bool))
    assert np.allclose(np.array(ori1), np.array(o1_ref), atol=0.1), (
        np.abs(np.array(ori1) - np.array(o1_ref)).max())
    np.testing.assert_array_equal(np.array(dup), np.array(v2_ref))
    dn1 = np.array(describe.normalize_descriptors(d1))
    ref1 = np.array(describe.extract_descriptors(img, x, y, sc, ori1))
    corr = (dn1 * ref1).sum(1)
    assert corr.min() > 0.9999, corr.min()
    # duplicate descriptors only where dup, and match the ori2 ref
    dupm = np.array(dup)
    if dupm.any():
        dn2 = np.array(describe.normalize_descriptors(d2))
        ref2 = np.array(describe.extract_descriptors(img, x, y, sc, ori2))
        corr2 = (dn2 * ref2).sum(1)[dupm]
        assert corr2.min() > 0.9999, corr2.min()
    assert (np.array(d2)[~dupm] == 0).all()


@pytest.mark.slow
def test_fused_kernel_count_gating(rng):
    img, x, y, sc, _ = _setup(rng, K=16)
    d1, d2, ori1, ori2, dup = pallas_sample.fused_orient_descriptor(
        img, x, y, sc, count=4, interpret=True)
    assert (np.array(d1)[4:] == 0).all()
    assert (np.array(d2)[4:] == 0).all()
    assert not np.array(dup)[4:].any()


def test_pallas_matcher_matches_xla(rng):
    from sfm_tpu.ops import pallas_match
    from sfm_tpu.sift import match as match_mod
    import jax.numpy as jnp

    d1 = rng.normal(size=(300, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = rng.normal(size=(700, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    v2 = np.ones(700, bool)
    v2[::7] = False
    b_ref, s_ref, i_ref = match_mod.match_descriptors_top2(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v2))
    # f32: exact agreement
    b, s, i = pallas_match.match_top2_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v2),
        bm=8, bn=128, bf16=False, interpret=True)
    np.testing.assert_array_equal(np.array(i), np.array(i_ref))
    np.testing.assert_allclose(np.array(b), np.array(b_ref), atol=1e-5)
    np.testing.assert_allclose(np.array(s), np.array(s_ref), atol=1e-5)
    # bf16: random unit descriptors are the WORST case (all correlations
    # are near-ties at ~N(0, 1/sqrt(128))); real SIFT descriptors agree
    # far better (see test_frontend_pallas_path_matches_xla_path).
    b16, s16, i16 = pallas_match.match_top2_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v2),
        bm=8, bn=128, bf16=True, interpret=True)
    agree = (np.array(i16) == np.array(i_ref)).mean()
    assert agree > 0.95, agree
    assert v2[np.array(i)].all()    # winners always land on valid points
    assert v2[np.array(i16)].all()
    # Per-lane-accumulator variant: identical contract (exact in f32;
    # tie-break differences require exactly equal f32 dot products,
    # absent on random unit descriptors).
    for var in ("lanes", "lanes_pair"):
        bl, sl, il = pallas_match.match_top2_pallas(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v2),
            bm=8, bn=256, bf16=False, interpret=True, variant=var)
        np.testing.assert_array_equal(np.array(il), np.array(i_ref))
        np.testing.assert_allclose(np.array(bl), np.array(b_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.array(sl), np.array(s_ref),
                                   atol=1e-5)
    with pytest.raises(ValueError):
        pallas_match.match_top2_pallas(
            jnp.asarray(d1), jnp.asarray(d2), interpret=True,
            variant="lanes16")


@pytest.mark.slow
def test_fused_detect_maps_match_xla(rng):
    """ops/pallas_detect.detect_maps (interpret) vs the XLA dense
    detection composed from pyramid + detect internals: candidate sets
    and responses must agree up to f32 summation-order rounding (blur
    as 9-tap FMAs vs grouped conv) — a handful of near-tie NMS flips
    at most."""
    import pathlib

    import jax
    import jax.numpy as jnp
    import pytest

    from sfm_tpu.config import SiftConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.ops import pallas_detect
    from sfm_tpu.sift import pyramid, detect as detect_mod

    dino = pathlib.Path("/root/reference/data/dino/viff.000.ppm")
    if not dino.exists():
        pytest.skip("dino fixture not available")
    cfg = SiftConfig(max_pts_per_octave=256, num_octaves=1)
    img = jnp.asarray(np.asarray(load_gray(dino))[100:220, 100:400])
    octave = pyramid.build_pyramid(img, cfg, None)[0]
    dog, S = octave.dog, cfg.num_scales

    # XLA maps (mirrors detect.detect up to selection).
    center, maxv, minv = detect_mod._neighbor_extrema(dog, S)
    H, W = dog.shape[1:]
    is_max = center > jnp.maximum(jnp.float32(cfg.thresh), maxv)
    is_min = center < jnp.minimum(jnp.float32(-cfg.thresh), minv)
    border = jnp.zeros((H, W), bool).at[1:-1, 1:-1].set(True)
    cand = (is_max | is_min) & border[None]
    refined = detect_mod._refine_dense(dog, S)
    edge_ok = (refined[4] > 0.0) & (refined[4] < cfg.edge_limit)
    scale_d = jnp.exp2(
        (jax.lax.broadcasted_iota(jnp.float32, center.shape, 0) + refined[2])
        / S
    )
    cand = cand & edge_ok & (scale_d >= cfg.lowest_scale)
    resp = jnp.where(cand, jnp.abs(center), -1.0)
    resp_px = np.asarray(jnp.max(resp, axis=0))
    s_sel = np.asarray(jnp.argmax(resp, axis=0))

    taps = pyramid.octave_kernel_bank(cfg, 0)
    taps_t = tuple(tuple(float(v) for v in row) for row in np.asarray(taps))
    kresp, kaux = pallas_detect.detect_maps(
        octave.base, taps=taps_t, n_scales=S, thresh=float(cfg.thresh),
        edge_limit=float(cfg.edge_limit), scale_gate=0.0, interpret=True,
        lean=False,  # pin the in-kernel-refined aux layout this test reads
    )
    kresp = np.asarray(kresp)
    kaux = np.asarray(kaux)

    ca, cb = resp_px > 0, kresp > 0
    n_disagree = int(np.sum(ca != cb))
    assert ca.sum() > 30, "fixture produced too few candidates"
    assert n_disagree <= max(2, 0.005 * ca.sum()), (n_disagree, ca.sum())
    both = ca & cb
    np.testing.assert_allclose(kresp[both], resp_px[both], atol=1e-3)
    same_scale = both & (kaux[0] == s_sel)
    # aux values at agreeing (pixel, scale): refined offsets + metrics.
    ref5 = np.asarray(refined)  # [5, S, H, W]
    ys, xs = np.nonzero(same_scale)
    ss = s_sel[ys, xs]
    np.testing.assert_allclose(
        kaux[1][ys, xs], ref5[0, ss, ys, xs], atol=5e-2
    )  # pdx
    np.testing.assert_allclose(
        kaux[4][ys, xs], ref5[3, ss, ys, xs], atol=1e-2
    )  # sharpness
    assert same_scale.sum() >= 0.99 * both.sum()

    # LEAN kernel (refinement post-top-k, r4): must reproduce the full
    # kernel's Detections through the shared select tail.
    kresp_l, kaux_l = pallas_detect.detect_maps(
        octave.base, taps=taps_t, n_scales=S, thresh=float(cfg.thresh),
        edge_limit=float(cfg.edge_limit), scale_gate=0.0, interpret=True,
        lean=True,
    )
    d_full = detect_mod.select_from_maps(
        jnp.asarray(kresp), jnp.asarray(kaux), cfg)
    d_lean = detect_mod.select_from_maps(kresp_l, kaux_l, cfg)
    va, vb = np.asarray(d_full.valid), np.asarray(d_lean.valid)
    assert va.sum() == vb.sum()
    for f in ("x", "y", "scale", "sharpness"):
        fa = np.asarray(getattr(d_full, f))[va]
        fb = np.asarray(getattr(d_lean, f))[vb]
        np.testing.assert_allclose(fa, fb, atol=1e-4)


@pytest.mark.slow
def test_fused_detect_end_to_end_parity(rng):
    """extract_sift with fused_detect=True vs the XLA path on a real
    image: identical keypoint counts (up to near-tie reordering at the
    capacity boundary) and >= 95% position-set overlap."""
    import dataclasses
    import pathlib

    import jax.numpy as jnp
    import pytest

    from sfm_tpu.config import SiftConfig
    from sfm_tpu.io.image_io import load_gray
    from sfm_tpu.sift import frontend

    dino = pathlib.Path("/root/reference/data/dino/viff.000.ppm")
    if not dino.exists():
        pytest.skip("dino fixture not available")
    img = jnp.asarray(np.asarray(load_gray(dino))[:288, :360])
    cfg = SiftConfig(max_pts_per_octave=512, num_octaves=3)
    r_x = frontend.extract_sift(img, cfg)
    r_f = frontend.extract_sift(
        img, dataclasses.replace(cfg, fused_detect=True)
    )
    vx = np.asarray(r_x.keypoints.valid)
    vf = np.asarray(r_f.keypoints.valid)
    assert abs(int(vx.sum()) - int(vf.sum())) <= max(2, 0.01 * vx.sum())

    def posset(r, v):
        kp = r.keypoints
        return set(
            zip(
                np.round(np.asarray(kp.x)[v], 1),
                np.round(np.asarray(kp.y)[v], 1),
                np.round(np.asarray(kp.scale)[v], 2),
            )
        )

    sx, sf = posset(r_x, vx), posset(r_f, vf)
    inter = len(sx & sf)
    assert inter >= 0.95 * max(len(sx), len(sf)), (inter, len(sx), len(sf))


def test_pallas_pyramid_base_chain_parity(rng):
    """base_chain_pallas (interpret) vs the banded-matmul base_chain:
    identical octave bases up to f32 summation order, incl. up_scale."""
    import dataclasses
    from sfm_tpu.config import SiftConfig
    from sfm_tpu.sift import pyramid, frontend

    img = jnp.asarray(
        (rng.uniform(size=(96, 130)) * 255).astype(np.float32))
    for up in (False, True):
        cfg = SiftConfig(num_octaves=4, up_scale=up,
                         blur_matmul=True, fused_detect=True)
        mats = pyramid.pyramid_decim_mats(tuple(img.shape), cfg)
        ref = pyramid.base_chain(img, cfg, mats)
        got = pyramid.base_chain_pallas(img, cfg, interpret=True)
        assert len(ref) == len(got)
        for o, (a, b) in enumerate(zip(ref, got)):
            assert a.shape == b.shape, (o, a.shape, b.shape)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-3,
                err_msg=f"octave {o} up={up}")


def test_fused_blk_loader_parity(rng):
    """Paged-atlas (blk) loader vs the full-width roll loader:
    bit-identical outputs, both for the fused kernel and for the wide
    descriptor kernel, including a pre-paged 3D atlas."""
    from sfm_tpu.ops import pallas_sample as ps

    img = jnp.asarray(
        (rng.uniform(size=(300, 400)) * 255).astype(np.float32))
    K = 32
    x = jnp.asarray(rng.uniform(5, 395, K).astype(np.float32))
    y = jnp.asarray(rng.uniform(5, 295, K).astype(np.float32))
    sc = jnp.asarray(rng.uniform(1.0, 2.0, K).astype(np.float32))
    a = ps.fused_orient_descriptor(img, x, y, sc, count=K, interpret=True)
    b = ps.fused_orient_descriptor(img, x, y, sc, count=K, interpret=True,
                                   blk=True)
    img3 = ps.page_atlas(img)
    c = ps.fused_orient_descriptor(img3, x, y, sc, count=K, interpret=True,
                                   blk=True)
    for o in (b, c):
        for u, v in zip(a, o):
            np.testing.assert_array_equal(
                np.asarray(u, dtype=np.float32), np.asarray(v, np.float32))
    ori = np.asarray(a[2])
    d_n = ps.descriptor_sample(img, x, y, sc, jnp.asarray(ori), count=K,
                               interpret=True)
    d_w = ps.descriptor_sample(img3, x, y, sc, jnp.asarray(ori), count=K,
                               interpret=True, blk=True, wide=True)
    np.testing.assert_allclose(np.asarray(d_n), np.asarray(d_w), atol=2e-2)
