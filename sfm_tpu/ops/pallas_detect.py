"""Pallas TPU kernel: fused pyramid blur bank + DoG + NMS + refinement.

TPU-native replacement for the dense half of the reference's detection
path (reference CudaSift/cudaSiftD.cu:1753-1793 LaplaceMultiMem +
:1292-1431 FindPointsMultiNew): one kernel reads each octave base ONCE
from HBM and produces the per-pixel candidate response plus refined
sub-pixel quantities, keeping every intermediate — 8 blurred planes,
7 DoG planes, the 26-neighbor NMS bounds, the dense quadratic
refinement — in VMEM.

Why: the XLA formulation of the same math (banded-matmul blur bank ->
DoG -> ~14 shifted NMS passes -> ~20 refinement passes) streams the
full DoG volume through HBM many times; at the 2560x1920 up-scale
capacity class that dense stage measured 49.6 ms of which only ~8 ms
is the blur matmuls (NOTES_R3 sub-stage breakdown).  Here the per-tile
working set lives in VMEM, HBM traffic drops to one read of the base +
one write of the response/refined maps, and the blur runs as 9-tap f32
FMAs (more accurate than the Precision.HIGH bf16x3 matmuls — no
phantom-detection hazard at all).

Numerics match sift.detect's XLA path (same recursions, gates, and
selection rules; see tests/test_pallas_sample.py parity tests); blur
values differ only by f32 summation order vs the banded matmul.

Layout: 2D grid over [TH, TW] tiles of the octave base; each program
DMAs a [TH+16, TW+16] slab (8-aligned halo covering blur radius 4 +
the 1-pixel NMS/refine stencil on each side), computes 8 column+row
blurs, differences them into 7 DoG planes, runs the separable
26-neighbor extremum test and the closed-form 3D quadratic refinement
on the 5 center planes, and writes the strongest-scale-per-pixel
response + (s, dx, dy, ds, sharpness, edgeness) maps.  Candidate
selection stays in XLA — sift.detect.select_from_maps (hierarchical
exact top-k).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 4      # blur tap radius (LAPLACE_R, cudaSiftD.h:40)
_PAD = 8    # halo: radius 4 + NMS/refine 1, rounded to the sublane tile


def _make_kernel(TH: int, TW: int, W: int, H: int, S: int,
                 taps, thresh: float, edge_limit: float, scale_gate: float,
                 lean: bool = False):
    n_planes = S + 3

    def kernel(base_hbm, resp_ref, aux_ref, slab_ref, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            base_hbm.at[pl.ds(i * TH, TH + 16), pl.ds(j * TW, TW + 128)],
            slab_ref, sem,
        )
        cp.start()
        cp.wait()
        # [TH+16, TW+128]; padded px = image px + 8.  The slab is 112
        # columns wider than the halo needs: Mosaic requires DMA slice
        # shapes 128-aligned on the lane dimension.
        slab = slab_ref[...]

        # ROLLING blur bank + DoG (r5): only 3 DoG planes (and their
        # horizontal 3-extrema) are live at once instead of all 7 —
        # the all-planes form held ~28 MB live at TH=64 and OOM'd the
        # 16 MB scoped VMEM, pinning the tile height at 32.  Plane p's
        # blur is computed on demand; scale s is processed as soon as
        # dog[s+1] exists.  dog[p][y, x] covers image rows
        # (i*TH - 1 + y) and cols (j*TW - 1 + x): a one-pixel halo
        # around the tile for the NMS/refine stencils.
        def blur(p):
            colb = jnp.zeros((TH + 2, TW + 128), jnp.float32)
            for k in range(2 * _R + 1):
                colb = colb + np.float32(taps[p][k]) * jax.lax.slice(
                    slab, (3 + k, 0), (3 + k + TH + 2, TW + 128)
                )
            rowb = jnp.zeros((TH + 2, TW + 2), jnp.float32)
            for k in range(2 * _R + 1):
                rowb = rowb + np.float32(taps[p][k]) * jax.lax.slice(
                    colb, (0, 3 + k), (TH + 2, 3 + k + TW + 2)
                )
            return rowb

        def sub(a, dy, dx):
            """Center-tile view shifted by (dy, dx): [TH, TW]."""
            return jax.lax.slice(
                a, (1 + dy, 1 + dx), (1 + dy + TH, 1 + dx + TW)
            )

        def h3(a, agg):
            return agg(agg(a[:, : TW], a[:, 1 : TW + 1]), a[:, 2 :])

        def rows3(h, agg):
            return agg(agg(h[: TH], h[1 : TH + 1]), h[2 :])

        row_g = i * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
        col_g = j * TW + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
        inb = (
            (row_g >= 1) & (row_g <= H - 2) & (col_g >= 1) & (col_g <= W - 2)
        )

        best = jnp.full((TH, TW), -1.0, jnp.float32)
        sel = [jnp.zeros((TH, TW), jnp.float32)
               for _ in range(11 if lean else 6)]
        # Rolling window: dog/hmax/hmin hold planes [s-1, s, s+1].
        b_prev = blur(0)
        dog = []
        hmax = []
        hmin = []
        for p in range(1, n_planes):
            bp = blur(p)
            d = bp - b_prev
            b_prev = bp
            dog.append(d)
            hmax.append(h3(d, jnp.maximum))
            hmin.append(h3(d, jnp.minimum))
            if len(dog) > 3:
                dog.pop(0)
                hmax.pop(0)
                hmin.pop(0)
            if len(dog) < 3:
                continue
            s = p - 2  # center plane index into the 7 DoG planes
            c = dog[1]
            val = sub(c, 0, 0)
            inp_max = jnp.maximum(
                jnp.maximum(hmax[1][: TH], hmax[1][2 :]),
                jnp.maximum(sub(c, 0, -1), sub(c, 0, 1)),
            )
            inp_min = jnp.minimum(
                jnp.minimum(hmin[1][: TH], hmin[1][2 :]),
                jnp.minimum(sub(c, 0, -1), sub(c, 0, 1)),
            )
            maxv = jnp.maximum(
                jnp.maximum(rows3(hmax[0], jnp.maximum),
                            rows3(hmax[2], jnp.maximum)),
                inp_max,
            )
            minv = jnp.minimum(
                jnp.minimum(rows3(hmin[0], jnp.minimum),
                            rows3(hmin[2], jnp.minimum)),
                inp_min,
            )
            cand = (val > jnp.maximum(jnp.float32(thresh), maxv)) | (
                val < jnp.minimum(jnp.float32(-thresh), minv)
            )
            cand = cand & inb

            # Dense quadratic refinement (mirrors detect._refine_dense).
            xm = sub(c, 0, -1)
            xp = sub(c, 0, 1)
            ym = sub(c, -1, 0)
            yp = sub(c, 1, 0)
            sm = sub(dog[0], 0, 0)
            sp = sub(dog[2], 0, 0)
            dxx = 2.0 * val - xm - xp
            dyy = 2.0 * val - ym - yp
            dss = 2.0 * val - sm - sp
            dxy = 0.25 * (
                sub(c, 1, 1) + sub(c, -1, -1) - sub(c, -1, 1) - sub(c, 1, -1)
            )
            dxs = 0.25 * (
                sub(dog[2], 0, 1) + sub(dog[0], 0, -1)
                - sub(dog[0], 0, 1) - sub(dog[2], 0, -1)
            )
            dys = 0.25 * (
                sub(dog[2], 1, 0) + sub(dog[0], -1, 0)
                - sub(dog[2], -1, 0) - sub(dog[0], 1, 0)
            )
            dx = 0.5 * (xp - xm)
            dy = 0.5 * (yp - ym)
            ds = 0.5 * (sm - sp)

            if lean:
                # Division-free edge gate (equivalent to
                # 0 < tra^2/det < limit with the 1e-20 denominator
                # guard); the quadratic solve, its divisions, and the
                # exp2 scale computation run post-top-k in XLA on the
                # K gathered candidates (detect.select_from_maps) —
                # they were ~40% of this kernel's per-pixel VPU work.
                tra = dxx + dyy
                det = dxx * dyy - dxy * dxy
                t2 = tra * tra
                cand = cand & (det > 0.0) & (t2 > 0.0) & (
                    t2 < jnp.float32(edge_limit) * det
                )
                resp = jnp.where(cand, jnp.abs(val), -1.0)
                take = resp > best
                best = jnp.where(take, resp, best)
                for q, v in enumerate(
                    (jnp.full((TH, TW), np.float32(s - 1)), val, dx, dy,
                     ds, dxx, dyy, dss, dxy, dxs, dys)
                ):
                    sel[q] = jnp.where(take, v, sel[q])
                continue

            tra = dxx + dyy
            det = dxx * dyy - dxy * dxy
            edge = tra * tra / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)

            idxx = dyy * dss - dys * dys
            idxy = dys * dxs - dxy * dss
            idxs = dxy * dys - dyy * dxs
            idyy = dxx * dss - dxs * dxs
            idys = dxy * dxs - dxx * dys
            idss = dxx * dyy - dxy * dxy
            hdet = idxx * dxx + idxy * dxy + idxs * dxs
            idet = 1.0 / jnp.where(jnp.abs(hdet) < 1e-20, 1e-20, hdet)
            pdx = idet * (idxx * dx + idxy * dy + idxs * ds)
            pdy = idet * (idxy * dx + idyy * dy + idys * ds)
            pds = idet * (idxs * dx + idys * dy + idss * ds)
            off = jnp.maximum(jnp.maximum(jnp.abs(pdx), jnp.abs(pdy)),
                              jnp.abs(pds))
            safe = lambda num, den: num / jnp.where(
                jnp.abs(den) < 1e-20, 1e-20, den
            )
            fb = off > 0.5
            pdx = jnp.where(fb, safe(dx, dxx), pdx)
            pdy = jnp.where(fb, safe(dy, dyy), pdy)
            pds = jnp.where(fb, safe(ds, dss), pds)
            pdx = jnp.clip(pdx, -1.0, 1.0)
            pdy = jnp.clip(pdy, -1.0, 1.0)
            pds = jnp.clip(pds, -1.0, 1.0)
            sharp = val + 0.5 * (dx * pdx + dy * pdy + ds * pds)

            edge_ok = (edge > 0.0) & (edge < edge_limit)
            scale_d = jnp.exp2((np.float32(s - 1) + pds) * np.float32(1.0 / S))
            cand = cand & edge_ok & (scale_d >= scale_gate)

            resp = jnp.where(cand, jnp.abs(val), -1.0)
            take = resp > best  # strict: first-max wins, = jnp.argmax
            best = jnp.where(take, resp, best)
            for q, v in enumerate(
                (jnp.full((TH, TW), np.float32(s - 1)), pdx, pdy, pds,
                 sharp, edge)
            ):
                sel[q] = jnp.where(take, v, sel[q])

        resp_ref[...] = best
        for q in range(len(sel)):
            aux_ref[q, :, :] = sel[q]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_scales", "thresh", "edge_limit", "scale_gate", "taps",
        "tile_rows", "tile_cols", "interpret", "lean",
    ),
)
def detect_maps(base, *, taps, n_scales: int, thresh: float,
                edge_limit: float, scale_gate: float, tile_rows: int = 32,
                tile_cols: int = 1024, interpret: bool = False,
                lean: bool | None = None):
    """Fused dense detection maps for one octave base.

    base: [H, W] f32 octave base image.  taps: static nested tuple
    [S+3][9] of blur taps (pyramid.octave_kernel_bank as a tuple).

    Returns (resp [H, W], aux [C, H, W]) where resp is the candidate
    response (|DoG| at the strongest passing scale, -1 where no
    candidate).  lean=None (auto) picks the LEAN kernel when
    scale_gate <= 0: aux has C=11 raw refinement coefficients
    (s, val, dx, dy, ds, dxx, dyy, dss, dxy, dxs, dys) and the
    quadratic solve (divisions + exp2, ~40% of the dense per-pixel
    work) moves to the top-k tail (detect.select_from_maps).  With
    lean=False aux keeps the r3 layout: C=6
    (s, dx, dy, ds, sharpness, edgeness) refined in-kernel — required
    when scale_gate > 0 (the gate needs the refined scale densely).
    """
    H, W = base.shape
    S = n_scales
    if lean is None:
        lean = scale_gate <= 0.0
    if lean and scale_gate > 0.0:
        raise ValueError("lean detect kernel cannot apply scale_gate")
    C = 11 if lean else 6
    TH = tile_rows
    TW = min(tile_cols, -(-W // 128) * 128)
    ny = -(-H // TH)
    nx = -(-W // TW)
    basep = jnp.pad(
        base,
        ((_PAD, ny * TH + _PAD - H), (_PAD, nx * TW + 120 - W)),
        mode="edge",
    )
    kernel = _make_kernel(TH, TW, W, H, S, taps, thresh, edge_limit,
                          scale_gate, lean=lean)
    resp, aux = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ny * TH, nx * TW), jnp.float32),
            jax.ShapeDtypeStruct((C, ny * TH, nx * TW), jnp.float32),
        ),
        grid=(ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((TH, TW), lambda i, j: (i, j)),
            pl.BlockSpec((C, TH, TW), lambda i, j: (0, i, j)),
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 16, TW + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(basep)
    return resp[:H, :W], aux[:, :H, :W]
