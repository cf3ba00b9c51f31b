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


def _make_decim_kernel(TH: int, TW: int, taps):
    """5-tap blur + 2x decimation, polyphase.

    The decimated column filter out[x'] = sum_k taps[k] * P[2x'-2+k]
    touches only the even/odd column PHASES of the padded source at
    unit stride: with e[x] = P[2x], o[x] = P[2x+1] (phase planes split
    once in XLA — Mosaic has no stride-2 vector slices) it is
    t0*e[x'+3] + t2*e[x'+4] + t4*e[x'+5] + t1*o[x'+3] + t3*o[x'+4]
    (offsets include the 8-px edge pad).  Row decimation stays a small
    band matmul Dv [TH, 2TH+16] (K ~ 2TH — cheap on the MXU at
    HIGHEST; the result feeds the DoG threshold downstream).  The r4
    first cut decimated COLUMNS with a dense [2TW+128, TW] band matmul
    too: ~2300 redundant FLOPs per output pixel and a VMEM ceiling on
    TW — this form is ~10 VPU MACs + one K=144 matmul per pixel.
    """
    hi = jax.lax.Precision.HIGHEST
    t = [np.float32(v) for v in taps]

    def kernel(e_hbm, o_hbm, dv_ref, out_ref, eslab_ref, oslab_ref,
               sem_e, sem_o):
        i = pl.program_id(0)
        j = pl.program_id(1)
        rows = pl.ds(2 * i * TH, 2 * TH + 16)
        cols = pl.ds(j * TW, TW + 128)
        cpe = pltpu.make_async_copy(e_hbm.at[rows, cols], eslab_ref, sem_e)
        cpo = pltpu.make_async_copy(o_hbm.at[rows, cols], oslab_ref, sem_o)
        cpe.start()
        cpo.start()
        cpe.wait()
        re = jax.lax.dot_general(
            dv_ref[...], eslab_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )  # [TH, TW+128]
        cpo.wait()
        ro = jax.lax.dot_general(
            dv_ref[...], oslab_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )

        def c(a, off):
            return jax.lax.slice(a, (0, off), (TH, off + TW))

        out_ref[...] = (
            t[0] * c(re, 3) + t[2] * c(re, 4) + t[4] * c(re, 5)
            + t[1] * c(ro, 3) + t[3] * c(ro, 4)
        )

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
def blur9(img, *, taps, tile_rows: int = 128, tile_cols: int = 1024,
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


def _interleave_perms(TH: int, TW: int):
    """Permutation matrices for the 2x interleave: out = Pr @ X @ Pc
    where X = [[ee, eo], [oe, oo]] (block concat).  Pr[2r, r] =
    Pr[2r+1, TH/2+r] = 1 interleaves row halves; Pc[c, 2c] =
    Pc[TW/2+c, 2c+1] = 1 interleaves column halves."""
    TH2, TW2 = TH // 2, TW // 2
    Pr = np.zeros((TH, TH), np.float32)
    Pr[2 * np.arange(TH2), np.arange(TH2)] = 1.0
    Pr[2 * np.arange(TH2) + 1, TH2 + np.arange(TH2)] = 1.0
    Pc = np.zeros((TW, TW), np.float32)
    Pc[np.arange(TW2), 2 * np.arange(TW2)] = 1.0
    Pc[TW2 + np.arange(TW2), 2 * np.arange(TW2) + 1] = 1.0
    return Pr, Pc


def _make_upscale_kernel(TH: int, TW: int):
    """Bilinear 2x upsample with the reference's interleave semantics
    (ops/image.scale_up; reference ScaleUp cudaSiftD.cu:170-190):
    out[2y, 2x] = v[y, x], odd rows/cols are clamped midpoints.  The
    XLA stack/reshape formulation of the interleave measured 4.0 ms
    ALONE at the up-scale capacity class (r4 device decomposition,
    tools/exp_bases.py).  Mosaic rejects minor-dim interleave reshapes
    (vector<...x2xf32> -> vector<...>), so the interleave runs as two
    PERMUTATION matmuls on the MXU at HIGHEST — bit-exact for f32
    (bf16x3 splitting is exact over 24 mantissa bits and every output
    is a single 1.0*value product).
    """
    TH2, TW2 = TH // 2, TW // 2
    hi = jax.lax.Precision.HIGHEST

    def kernel(img_hbm, pr_ref, pc_ref, out_ref, slab_ref, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            img_hbm.at[pl.ds(i * TH2 + _PAD, TH2 + 8),
                       pl.ds(j * TW2, TW2 + 128)],
            slab_ref, sem,
        )
        cp.start()
        cp.wait()

        def sl(dy, dx):
            return jax.lax.slice(
                slab_ref[...], (dy, _PAD + dx), (dy + TH2, _PAD + dx + TW2)
            )

        v = sl(0, 0)
        vr = sl(0, 1)
        vd = sl(1, 0)
        vdr = sl(1, 1)
        ee = v
        eo = 0.5 * (v + vr)
        oe = 0.5 * (v + vd)
        oo = 0.25 * (v + vr + vd + vdr)
        x = jnp.concatenate(
            [jnp.concatenate([ee, eo], axis=1),
             jnp.concatenate([oe, oo], axis=1)], axis=0
        )  # [TH, TW]: quadrant layout
        t = jax.lax.dot_general(
            pr_ref[...], x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )
        out_ref[...] = jax.lax.dot_general(
            t, pc_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tile_rows", "tile_cols", "interpret")
)
def scale_up(img, *, tile_rows: int = 64, tile_cols: int = 512,
             interpret: bool = False):
    """[H, W] -> [2H, 2W] bilinear upsample (reference interleave
    semantics, bit-identical to ops/image.scale_up)."""
    H, W = img.shape
    Ho, Wo = 2 * H, 2 * W
    TH, TW, ny, nx = _tiles(Ho, Wo, tile_rows, tile_cols)
    assert TH % 2 == 0 and TW % 2 == 0 and TH % 16 == 0
    # Source coverage: rows to ny*TH/2 + 8 past the pad, cols to
    # nx*TW/2 + 128.
    imgp = _pad_to(img, ny, nx, TH // 2, TW // 2, extra_c=128)
    pr, pc = _interleave_perms(TH, TW)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_upscale_kernel(TH, TW),
        out_shape=jax.ShapeDtypeStruct((ny * TH, nx * TW), jnp.float32),
        grid=(ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), vmem, vmem],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((TH // 2 + 8, TW // 2 + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(imgp, jnp.asarray(pr), jnp.asarray(pc))
    return out[:Ho, :Wo]


@functools.partial(
    jax.jit, static_argnames=("taps", "tile_rows", "tile_cols", "interpret")
)
def scale_down(img, *, taps, tile_rows: int = 64, tile_cols: int = 1280,
               interpret: bool = False):
    """5-tap blur + 2x decimation of [H, W] -> [H//2, W//2] (reference
    ScaleDown semantics: edge-clamped blur, then every 2nd pixel)."""
    H, W = img.shape
    Ho, Wo = H // 2, W // 2
    TH, TW, ny, nx = _tiles(Ho, Wo, tile_rows, tile_cols)
    # Source coverage: rows to 2*ny*TH + 16; cols: the PHASE planes
    # need nx*TW + 128 columns each, so the padded width is
    # 2*nx*TW + 256 (extra_c = 248 on top of the 8 leading pad cols).
    imgp = _pad_to(img, 2 * ny, 2 * nx, TH, TW, extra_c=248)
    e = imgp[:, 0::2]
    o = imgp[:, 1::2]
    dv = jnp.asarray(_decim_band(TH, 2 * TH + 16, taps))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_decim_kernel(TH, TW, taps),
        out_shape=jax.ShapeDtypeStruct((ny * TH, nx * TW), jnp.float32),
        grid=(ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY), vmem],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((2 * TH + 16, TW + 128), jnp.float32),
            pltpu.VMEM((2 * TH + 16, TW + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(e, o, dv)
    return out[:Ho, :Wo]
