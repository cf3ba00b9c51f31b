"""Gaussian scale-space / DoG pyramid.

TPU-native equivalent of the reference's pyramid machinery:
  * LowPass prefilter (reference CudaSift/cudaSiftH.cu:406-435,
    cudaSiftD.cu:1986-2037)
  * per-octave 8-scale blur bank + adjacent differences
    (reference LaplaceMultiMem, cudaSiftD.cu:1753-1793, kernels from
    PrepareLaplaceKernels, cudaSiftH.cu:439-458)
  * ScaleDown octave descent (cudaSiftH.cu:146-167, cudaSiftD.cu:84-168)

Semantics reproduced exactly: blur sigma of plane i (i = 0..S+2) is
sqrt(max(2^(2(i-1)/S) - b_o^2, 0)) where b_o is the accumulated octave
base blur (0 at full resolution, then b' = sqrt(b^2 + 0.25)/2 per
octave), kernels are truncated at radius 4 and renormalized, and DoG
plane j = blur[j+1] - blur[j] (7 planes).  All 8 blurs of an octave run
as one grouped conv; octaves have static shapes so the whole pyramid
jits into a single XLA program.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import SiftConfig
from sfm_tpu.ops import image as imops


class Octave(NamedTuple):
    base: jnp.ndarray   # [H, W] octave base image (for gradients)
    dog: jnp.ndarray    # [S+2, H, W] difference-of-Gaussian planes
    subsampling: float  # coordinate scale back to input pixels


def octave_base_blurs(num_octaves: int) -> list:
    """Accumulated base blur per octave, index 0 = full resolution.

    Reference recursion: b_{k+1} = sqrt(b_k^2 + 0.5^2) / 2 with b_0 = 0
    (PrepareLaplaceKernels called with initBlur=0, cudaSiftH.cu:110;
    recursion at :441-443, ExtractSiftLoop :158).
    """
    blurs = [0.0]
    for _ in range(num_octaves - 1):
        b = blurs[-1]
        blurs.append(math.sqrt(b * b + 0.25) / 2.0)
    return blurs


def octave_kernel_bank(cfg: SiftConfig, octave_index: int) -> np.ndarray:
    """[S+3, 2r+1] blur taps for one octave (host-side constants)."""
    S = cfg.num_scales
    base_blur = octave_base_blurs(cfg.num_octaves)[octave_index]
    taps = []
    for i in range(S + 3):
        scale = 2.0 ** ((i - 1) / S)
        var = scale * scale - base_blur * base_blur
        taps.append(imops.gaussian_kernel(cfg.laplace_radius, max(var, 0.0)))
    return np.stack(taps)


def lowpass(img, cfg: SiftConfig):
    """Prefilter with sigma = init_blur (reference LowPass semantics:
    kernel exp(-j^2/(2*scale^2)) with scale = initBlur,
    cudaSiftH.cu:409-417)."""
    sigma = max(cfg.init_blur, 1e-3)
    taps = imops.gaussian_kernel(cfg.lowpass_radius, sigma * sigma)
    return imops.blur(img, taps)


def use_blur_matmul(cfg: SiftConfig) -> bool:
    if cfg.blur_matmul is not None:
        return cfg.blur_matmul
    return jax.default_backend() != "cpu"


@functools.lru_cache(maxsize=16)
def pyramid_band_mats(shape, cfg: SiftConfig):
    """Per-octave banded blur matrices as cached DEVICE arrays.

    Built host-side once per (image shape, config) and kept resident:
    they must flow into the jitted detect stage as ARGUMENTS — baking
    them in as multi-MB HLO literals made remote TPU compiles take
    >15 min (r2 measurement), and rebuilding them in-graph costs
    ~5 ms/image at runtime.  ~36 MB HBM for a 720x576 5-octave config.
    """
    import jax.numpy as jnp

    H, W = shape
    if cfg.up_scale:
        H, W = 2 * H, 2 * W
    sd_taps = imops.gaussian_kernel(2, 0.5).astype(np.float32)
    sd_key = sd_taps.tobytes()
    mats = []
    for o in range(cfg.num_octaves):
        bank = octave_kernel_bank(cfg, o)
        key = bank.astype(np.float32).tobytes()
        Bc = jnp.asarray(imops._band_matrix_cached(H, key, bank.shape[1]))
        Br = jnp.asarray(imops._band_matrix_cached(W, key, bank.shape[1]))
        # Decimating matrices producing the NEXT octave's base (unused
        # on the last octave but kept for a uniform pytree).
        Dc = jnp.asarray(imops._decim_matrix_cached(H, sd_key))
        Dr = jnp.asarray(imops._decim_matrix_cached(W, sd_key))
        if o == 0:
            # Lowpass prefilter as banded matmuls too: the grouped-conv
            # path costs ~0.5 ms/image of pure per-op overhead on this
            # backend (same lesson as the blur bank, r2).
            sigma = max(cfg.init_blur, 1e-3)
            lp = imops.gaussian_kernel(
                cfg.lowpass_radius, sigma * sigma
            ).astype(np.float32)[None]
            lp_key = lp.tobytes()
            Lc = jnp.asarray(
                imops._band_matrix_cached(H, lp_key, lp.shape[1])[0]
            )
            Lr = jnp.asarray(
                imops._band_matrix_cached(W, lp_key, lp.shape[1])[0]
            )
            mats.append((Bc, Br, Dc, Dr, Lc, Lr))
        else:
            mats.append((Bc, Br, Dc, Dr))
        H, W = H // 2, W // 2
    return tuple(mats)


@functools.lru_cache(maxsize=16)
def pyramid_decim_mats(shape, cfg: SiftConfig):
    """Lowpass + decimation matrices only (cached DEVICE arrays): the
    fused-Pallas dense stage (ops/pallas_detect.py) computes the blur
    bank in-kernel, so the multi-hundred-MB per-octave Bc/Br banded
    matrices of pyramid_band_mats are never built on that path.

    Returns ((Lc, Lr), (Dc0, Dr0), (Dc1, Dr1), ...) for num_octaves-1
    decimations.
    """
    import jax.numpy as jnp

    H, W = shape
    if cfg.up_scale:
        H, W = 2 * H, 2 * W
    sigma = max(cfg.init_blur, 1e-3)
    lp = imops.gaussian_kernel(cfg.lowpass_radius, sigma * sigma).astype(
        np.float32
    )[None]
    lp_key = lp.tobytes()
    out = [(
        jnp.asarray(imops._band_matrix_cached(H, lp_key, lp.shape[1])[0]),
        jnp.asarray(imops._band_matrix_cached(W, lp_key, lp.shape[1])[0]),
    )]
    sd_taps = imops.gaussian_kernel(2, 0.5).astype(np.float32)
    sd_key = sd_taps.tobytes()
    for _ in range(cfg.num_octaves - 1):
        out.append((
            jnp.asarray(imops._decim_matrix_cached(H, sd_key)),
            jnp.asarray(imops._decim_matrix_cached(W, sd_key)),
        ))
        H, W = H // 2, W // 2
    return tuple(out)


def base_chain_pallas(img, cfg: SiftConfig, interpret: bool = False) -> list:
    """base_chain via the Pallas pyramid kernels (ops/pallas_pyramid):
    bandwidth-bound lowpass + blur/decimate descent, no banded-matmul
    matrices at all.  Bit-compatible with base_chain's matmul path up
    to f32 summation order (interpret-mode parity test in
    tests/test_pallas_sample.py)."""
    from sfm_tpu.ops import pallas_pyramid as pp

    if cfg.up_scale:
        img = pp.scale_up(img, interpret=interpret)
    sigma = max(cfg.init_blur, 1e-3)
    lp = tuple(
        float(t)
        for t in imops.gaussian_kernel(cfg.lowpass_radius, sigma * sigma)
    )
    sd = tuple(float(t) for t in imops.gaussian_kernel(2, 0.5))
    base = pp.blur9(img, taps=lp, interpret=interpret)
    bases = [base]
    for _ in range(cfg.num_octaves - 1):
        base = pp.scale_down(base, taps=sd, interpret=interpret)
        bases.append(base)
    return bases


def base_chain(img, cfg: SiftConfig, decim_mats=None) -> list:
    """Octave base images only (no blur bank): lowpass prefilter then
    the scale-down descent — the inputs the fused-Pallas dense stage
    needs (it derives DoG in-kernel).  decim_mats: pyramid_decim_mats,
    or None for the grouped-conv path (CPU / blur_matmul=False).
    """
    if cfg.up_scale:
        img = imops.scale_up(img)
    if decim_mats is not None:
        if len(decim_mats[0]) != 2:
            raise ValueError(
                "base_chain expects pyramid_decim_mats (((Lc, Lr), (Dc, "
                "Dr), ...)); got a pyramid_band_mats tuple — the fused "
                "detect path and the banded-matmul path take different "
                "matrix pytrees (frontend._mats_for dispatches on cfg)."
            )
        Lc, Lr = decim_mats[0]
        hi = jax.lax.Precision.HIGH  # feeds the DoG threshold
        base = jnp.einsum(
            "hj,jw->hw", Lc, jnp.einsum("jw,xw->jx", img, Lr, precision=hi),
            precision=hi,
        )
    else:
        base = lowpass(img, cfg)
    bases = [base]
    for o in range(cfg.num_octaves - 1):
        if decim_mats is not None:
            base = imops.scale_down_matmul(base, decim_mats[1 + o])
        else:
            base = imops.scale_down(base, 0.5)
        bases.append(base)
    return bases


def build_octave(base, cfg: SiftConfig, octave_index: int, subsampling: float,
                 mats=None) -> Octave:
    bank = octave_kernel_bank(cfg, octave_index)
    if mats is not None and len(mats) < 4:
        raise ValueError(
            "build_octave expects pyramid_band_mats per-octave tuples "
            "(Bc, Br, Dc, Dr[, Lc, Lr]); got pyramid_decim_mats — see "
            "frontend._mats_for."
        )
    if mats is not None:
        blurred = imops.blur_bank_matmul(base, mats=mats[:2])  # [S+3, H, W]
    else:
        blurred = imops.blur_bank(base, bank)    # [S+3, H, W]
    dog = blurred[1:] - blurred[:-1]             # [S+2, H, W]
    # Force materialization: without the barrier XLA fuses the blur
    # bank into every one of the detector's ~14 shifted reads of the
    # DoG volume, recomputing the convolutions 14x (measured +26 ms on
    # the dino pair).
    base, dog = jax.lax.optimization_barrier((base, dog))
    return Octave(base=base, dog=dog, subsampling=subsampling)


def build_pyramid(img, cfg: SiftConfig, mats=None) -> list:
    """Full pyramid: list of Octave, finest (subsampling=1) first.

    The reference processes coarsest-first due to its recursion order
    (ExtractSiftLoop), but order is irrelevant for the set of outputs.
    mats: per-octave banded matmul pairs (pyramid_band_mats) or None
    for the grouped-conv path.
    """
    if cfg.up_scale:
        img = imops.scale_up(img)
    if mats and len(mats[0]) >= 6:
        Lc, Lr = mats[0][4:6]
        hi = jax.lax.Precision.HIGH  # feeds the DoG threshold
        base = jnp.einsum(
            "hj,jw->hw", Lc, jnp.einsum("jw,xw->jx", img, Lr, precision=hi),
            precision=hi,
        )
    else:
        base = lowpass(img, cfg)
    octaves = []
    sub = 1.0
    for o in range(cfg.num_octaves):
        octaves.append(
            build_octave(base, cfg, o, sub, mats[o] if mats else None)
        )
        if o + 1 < cfg.num_octaves:
            if mats is not None and len(mats[o]) >= 4:
                base = imops.scale_down_matmul(base, mats[o][2:4])
            else:
                base = imops.scale_down(base, 0.5)
            sub *= 2.0
    return octaves
