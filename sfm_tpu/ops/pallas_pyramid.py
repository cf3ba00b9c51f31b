"""Pallas TPU kernels for the pyramid base chain.

TPU-native equivalent of the reference's pyramid descent
(reference CudaSift/cudaSiftH.cu:406-435 LowPass, :146-167 ScaleDown;
cudaSiftD.cu:84-168 ScaleDown, :170-190 ScaleUp, :1986-2037 LowPass):
a 9-tap separable lowpass kernel and a 5-tap blur + 2x decimate kernel,
each reading an edge-padded image slab from HBM and writing one output
tile — bandwidth-bound, touching each pixel once.

Replaces the banded-matmul base chain on the fused-detect TPU path
(pyramid.base_chain): the [H, H] x [H, W] x [W, W] banded matmuls pay
~80x redundant FLOPs at Precision.HIGH to ride the MXU, which priced
the up-scale capacity class at ~8 ms/image of base-chain time alone
(r4 device profile, NOTES_R4) — ~20x over the bandwidth bound.

Boundary semantics parity: callers edge-pad by 8 (>= the 4-tap radius),
which is exactly equivalent to the XLA path's clamp-folded band
matrices (imops.band_matrix_np) and to the reference's clamp-mode
texture reads.  Interpret-mode parity vs the XLA path is tested in
tests/test_pallas_sample.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 8  # edge pad: covers the 4-tap lowpass and 2-tap decimate halos


def _make_blur9_kernel(TH: int, TW: int, taps):
    """9-tap separable blur over a pre-padded image."""
    K = len(taps)
    r = K // 2

    def kernel(img_hbm, out_ref, slab_ref, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            img_hbm.at[pl.ds(i * TH, TH + 16), pl.ds(j * TW, TW + 128)],
            slab_ref, sem,
        )
        cp.start()
        cp.wait()
        slab = slab_ref[...]
        colb = jnp.zeros((TH, TW + 128), jnp.float32)
        for k in range(K):
            colb = colb + np.float32(taps[k]) * jax.lax.slice(
                slab, (_PAD - r + k, 0), (_PAD - r + k + TH, TW + 128)
            )
        rowb = jnp.zeros((TH, TW), jnp.float32)
        for k in range(K):
            rowb = rowb + np.float32(taps[k]) * jax.lax.slice(
                colb, (0, _PAD - r + k), (TH, _PAD - r + k + TW)
            )
        out_ref[...] = rowb

    return kernel


def _decim_band(n_out: int, n_in: int, taps) -> np.ndarray:
    """[n_out, n_in] tile-local decimating band matrix:
    M[y', 2*y' + _PAD - r + k] = taps[k] (no clamp folding — the slab
    already covers the halo from the edge-padded source)."""
    K = len(taps)
    r = K // 2
    M = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    for k in range(K):
        M[rows, 2 * rows + _PAD - r + k] += np.float32(taps[k])
    return M


def _make_decim_kernel(TH: int, TW: int):
    """5-tap blur + 2x decimation: output tile [TH, TW] reads the
    padded source rows [2*i*TH, 2*TH + 16) x cols [2*j*TW, 2*TW + 128).
    Both decimating blurs run as ONE small matmul each against
    tile-local band matrices (Mosaic has no stride-2 vector slices):
    out = Dv [TH, 2TH+16] @ slab @ Dr^T [2TW+128, TW].  f32 MXU at
    HIGHEST — the result feeds the DoG threshold downstream.
    """
    hi = jax.lax.Precision.HIGHEST

    def kernel(img_hbm, dv_ref, dr_ref, out_ref, slab_ref, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            img_hbm.at[pl.ds(2 * i * TH, 2 * TH + 16),
                       pl.ds(2 * j * TW, 2 * TW + 128)],
            slab_ref, sem,
        )
        cp.start()
        cp.wait()
        tmp = jax.lax.dot_general(
            dv_ref[...], slab_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )  # [TH, 2TW+128]
        out_ref[...] = jax.lax.dot_general(
            tmp, dr_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )  # [TH, TW]

    return kernel


def _pad_to(img, ny, nx, TH, TW, extra_c=120):
    H, W = img.shape
    return jnp.pad(
        img,
        ((_PAD, ny * TH + _PAD - H), (_PAD, nx * TW + extra_c - W)),
        mode="edge",
    )


def _tiles(H, W, tile_rows, tile_cols):
    TH = min(tile_rows, max(8, -(-H // 8) * 8))
    TW = min(tile_cols, max(128, -(-W // 128) * 128))
    return TH, TW, -(-H // TH), -(-W // TW)


@functools.partial(
    jax.jit, static_argnames=("taps", "tile_rows", "tile_cols", "interpret")
)
def blur9(img, *, taps, tile_rows: int = 32, tile_cols: int = 1024,
          interpret: bool = False):
    """Separable edge-clamped blur of [H, W] with static taps (tuple)."""
    H, W = img.shape
    TH, TW, ny, nx = _tiles(H, W, tile_rows, tile_cols)
    imgp = _pad_to(img, ny, nx, TH, TW)
    out = pl.pallas_call(
        _make_blur9_kernel(TH, TW, taps),
        out_shape=jax.ShapeDtypeStruct((ny * TH, nx * TW), jnp.float32),
        grid=(ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((TH + 16, TW + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(imgp)
    return out[:H, :W]


@functools.partial(
    jax.jit, static_argnames=("taps", "tile_rows", "tile_cols", "interpret")
)
def scale_down(img, *, taps, tile_rows: int = 16, tile_cols: int = 512,
               interpret: bool = False):
    """5-tap blur + 2x decimation of [H, W] -> [H//2, W//2] (reference
    ScaleDown semantics: edge-clamped blur, then every 2nd pixel)."""
    H, W = img.shape
    Ho, Wo = H // 2, W // 2
    TH, TW, ny, nx = _tiles(Ho, Wo, tile_rows, tile_cols)
    # Source coverage: rows to 2*ny*TH + 16, cols to 2*nx*TW + 128.
    imgp = _pad_to(img, 2 * ny, 2 * nx, TH, TW, extra_c=2 * 120)
    dv = jnp.asarray(_decim_band(TH, 2 * TH + 16, taps))
    dr = jnp.asarray(_decim_band(TW, 2 * TW + 128, taps).T)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_decim_kernel(TH, TW),
        out_shape=jax.ShapeDtypeStruct((ny * TH, nx * TW), jnp.float32),
        grid=(ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), vmem, vmem],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((2 * TH + 16, 2 * TW + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(imgp, dv, dr)
    return out[:Ho, :Wo]
