"""Dense image ops: separable Gaussian filtering, resampling, gradients.

TPU-native replacement for the reference's shared-memory convolution
kernels (reference CudaSift/cudaSiftD.cu:84-168 ScaleDown,
:1986-2037 LowPassBlock, :1753-1793 LaplaceMultiMem): images are
``[H, W]`` f32 arrays, filtering is expressed as XLA convolutions over
an edge-clamped pad (the reference clamps reads at borders), and the
multi-scale blur bank runs as ONE grouped convolution so all 8 scale
planes stream through the MXU/VPU together.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel(radius: int, variance: float) -> np.ndarray:
    """Truncated, normalized Gaussian taps [2r+1] (host-side constant).

    Matches the reference's kernel construction (truncate at radius,
    normalize by the truncated sum — reference CudaSift/cudaSiftH.cu:
    406-419 LowPass, :439-458 PrepareLaplaceKernels).
    """
    j = np.arange(-radius, radius + 1, dtype=np.float64)
    if variance <= 1e-12:
        k = (j == 0).astype(np.float64)
    else:
        k = np.exp(-(j * j) / (2.0 * variance))
    k = k / k.sum()
    return k.astype(np.float32)


def _sep_conv(img, taps_row, taps_col):
    """Separable filtering of [C, H, W] with per-channel taps.

    taps_row/taps_col: [C, K] applied along W and H respectively, with
    edge-clamped boundaries.  Precision.HIGH on TPU: these blurs feed
    the DoG difference-of-near-equals, where single-pass bf16 rounding
    injects phantom detections (same hazard as the matmul blur path —
    see NOTES_R3, the Precision.HIGH phantom fix).
    """
    C, H, W = img.shape
    K = taps_row.shape[-1]
    r = K // 2
    hi = jax.lax.Precision.HIGH
    x = jnp.pad(img, ((0, 0), (0, 0), (r, r)), mode="edge")
    # Depthwise conv along W: NCHW with feature_group_count=C
    x = jax.lax.conv_general_dilated(
        x[None],                       # [1, C, H, W+2r]
        taps_row[:, None, None, :],    # [C, 1, 1, K]
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
        precision=hi,
    )[0]
    x = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None],
        taps_col[:, None, :, None],    # [C, 1, K, 1]
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
        precision=hi,
    )[0]
    return x


def blur(img, taps):
    """Separable Gaussian blur of [H, W] with 1-D taps (jnp or np)."""
    taps = jnp.asarray(taps)
    return _sep_conv(img[None], taps[None], taps[None])[0]


def blur_bank(img, taps_bank):
    """Blur [H, W] with a bank of B kernels at once -> [B, H, W].

    The reference computes 8 blur scales of the octave base in one
    kernel (LaplaceMultiMem); here the bank is one grouped XLA conv.
    """
    taps_bank = jnp.asarray(taps_bank)  # [B, K]
    B = taps_bank.shape[0]
    rep = jnp.broadcast_to(img[None], (B,) + img.shape)
    return _sep_conv(rep, taps_bank, taps_bank)


def band_matrix_np(n: int, taps_bank: np.ndarray) -> np.ndarray:
    """[B, n, n] banded blur matrices with edge-clamp folding (numpy).

    Row y of matrix b holds taps_bank[b] centered at y; out-of-range
    taps accumulate onto the clamped border column, matching the
    reference's clamp-mode texture reads.  Built host-side and embedded
    as jit constants: building in-graph measured ~5 ms/image on TPU
    (XLA refuses to constant-fold the multi-MB iota/select chain).
    """
    taps_bank = np.atleast_2d(np.asarray(taps_bank, np.float32))
    B, K = taps_bank.shape
    r = K // 2
    M = np.zeros((B, n, n), np.float32)
    rows = np.arange(n)
    for k in range(K):
        src = np.clip(rows + (k - r), 0, n - 1)
        for b in range(B):
            np.add.at(M[b], (rows, src), taps_bank[b, k])
    return M


@functools.lru_cache(maxsize=64)
def _band_matrix_cached(n: int, taps_key: bytes, K: int) -> np.ndarray:
    bank = np.frombuffer(taps_key, np.float32).reshape(-1, K)
    return band_matrix_np(n, bank)


def blur_bank_matmul(img, taps_bank=None, mats=None, precision=None):
    """blur_bank as two banded MATMULS: [B,H,H] @ img @ [B,W,W]^T.

    On TPU the grouped-conv formulation is overhead-bound (~1.3 ms per
    octave for ~15 MFLOP, r1 NOTES lead #1); expressing the separable
    blur as dense banded matmuls trades ~80x redundant FLOPs for MXU
    ops big enough to saturate — a large net win on this backend.
    Numerically identical to blur_bank up to f32 summation order.

    mats: optional (Bc [B,H,H], Br [B,W,W]) DEVICE arrays (see
    pyramid.pyramid_band_mats).  Pass them as jit arguments rather
    than relying on this function's host-side construction: multi-MB
    literals baked into the HLO made remote compiles pathologically
    slow (>15 min, r2 measurement).
    """
    if mats is not None:
        Bc, Br = mats
    else:
        bank = np.atleast_2d(np.asarray(taps_bank, np.float32))
        H, W = img.shape
        key = bank.tobytes()
        Bc = jnp.asarray(_band_matrix_cached(H, key, bank.shape[1]))
        Br = jnp.asarray(_band_matrix_cached(W, key, bank.shape[1]))
    # Precision.HIGH (bf16x3 passes) on TPU: the DoG downstream is a
    # DIFFERENCE of near-equal blurs thresholded at ~2/255, and default
    # single-pass bf16 rounding (~0.4% of 255) injects thousands of
    # phantom detections at unsaturated capacities (r3 device A/B on
    # the 1280x960 stereo fixture: 11957 -> 5k-class features).  X3
    # measured the same speed as default bf16 in r2 (NOTES_R2).
    if precision is None:
        precision = jax.lax.Precision.HIGH
    tmp = jnp.einsum("bij,jw->biw", Bc, img, precision=precision)
    return jnp.einsum("bhw,bxw->bhx", tmp, Br, precision=precision)


def scale_down(img, variance: float = 0.5):
    """5-tap Gaussian blur + 2x decimation (reference ScaleDown,
    CudaSift/cudaSiftD.cu:84-168; taps from cudaSiftH.cu:315-325)."""
    taps = jnp.asarray(gaussian_kernel(2, variance))
    out = _sep_conv(img[None], taps[None], taps[None])[0]
    return out[0::2, 0::2]


def decimating_band_matrix_np(n: int, taps: np.ndarray) -> np.ndarray:
    """[n//2, n] blur+2x-decimate matrix (scale_down as one matmul).

    Row i holds `taps` centered at source 2*i with edge-clamp folding —
    identical semantics to scale_down's conv + [0::2] slice.  On this
    backend each tiny scale_down conv costs ~0.8 ms of per-op overhead
    (r2 measurement: the 4-step chain alone was 3.2 of the pyramid's
    5.9 ms); as matmuls the chain rides the same MXU path as the blur
    bank."""
    taps = np.asarray(taps, np.float32)
    K = taps.shape[0]
    r = K // 2
    m = n // 2
    M = np.zeros((m, n), np.float32)
    rows = np.arange(m)
    for k in range(K):
        src = np.clip(2 * rows + (k - r), 0, n - 1)
        np.add.at(M, (rows, src), taps[k])
    return M


@functools.lru_cache(maxsize=64)
def _decim_matrix_cached(n: int, taps_key: bytes) -> np.ndarray:
    return decimating_band_matrix_np(n, np.frombuffer(taps_key, np.float32))


def scale_down_matmul(img, mats):
    """scale_down as two decimating banded matmuls.

    mats: (Dc [H//2, H], Dr [W//2, W]) device arrays (see
    pyramid.pyramid_band_mats).  Precision.HIGH: octave bases feed the
    DoG threshold (see blur_bank_matmul)."""
    Dc, Dr = mats
    hi = jax.lax.Precision.HIGH
    return jnp.einsum(
        "hj,jw->hw", Dc,
        jnp.einsum("jw,xw->jx", img, Dr, precision=hi),
        precision=hi,
    )


def scale_up(img):
    """2x upsample with the reference's EXACT interleave semantics
    (reference ScaleUp, cudaSiftD.cu:170-190): out[2y, 2x] = v[y, x],
    odd rows/cols are clamped midpoints.  r4: replaced
    jax.image.resize(method="linear"), whose half-pixel-center
    convention shifts the whole grid by 0.25 px relative to the
    reference (out[2y, 2x] = 0.75 v[y] + 0.25 v[y-1]) — detection
    coordinates on up-scaled configs were systematically offset.
    Pure interleave ops: no gathers, no resize lowering.
    """
    vr = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    vd = jnp.concatenate([img[1:, :], img[-1:, :]], axis=0)
    vdr = jnp.concatenate([vd[:, 1:], vd[:, -1:]], axis=1)
    ee = img
    eo = 0.5 * (img + vr)
    oe = 0.5 * (img + vd)
    oo = 0.25 * (img + vr + vd + vdr)
    H, W = img.shape
    rows = jnp.stack([jnp.stack([ee, eo], -1), jnp.stack([oe, oo], -1)], 1)
    return rows.reshape(2 * H, 2 * W)


def bilinear_sample(img, x, y):
    """Bilinear sample [H, W] image at float coords (x, y), clamped.

    Coordinates follow pixel-center convention: (x, y) = (col, row) of
    the sample point; integer coords hit pixel centers exactly.  This is
    the TPU equivalent of the reference's clamp-mode linear texture
    fetches (reference CudaSift/cudaSiftH.cu:186-205) — note tex2D there
    carries a built-in half-texel offset the callers compensate for.
    """
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
