"""Scale-space extremum detection, refinement, and fixed-capacity select.

TPU-native replacement for the reference's FindPointsMultiNew
(reference CudaSift/cudaSiftD.cu:1292-1431): instead of warp-shuffle
NMS with bit-packed candidate masks and an `atomicInc` append into a
global SiftPoint array (:1420), detection is a dense masked 3x3x3
extremum test over the whole DoG volume, candidates are compacted with
one `top_k` over the response map (fixed capacity, deterministic,
strongest-first — strictly better than the reference's arbitrary-order
append saturation), and sub-pixel refinement runs on the gathered
27-neighborhoods of the selected candidates only.

Behavioral parity with the reference kernel:
  * strict extremum vs all 26 neighbors and |DoG| > thresh (:1375-1400)
  * edge rejection tr^2 >= edgeLimit * det on the center plane (:1390)
  * 3D quadratic refinement with per-axis fallback when any offset
    leaves (-0.5, 0.5) (:1383-1415)
  * scale = 2^((s + ds)/S), filtered by lowestScale (:1416-1418)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.config import SiftConfig


class Detections(NamedTuple):
    x: jnp.ndarray          # [K] octave-local column (sub-pixel)
    y: jnp.ndarray          # [K] octave-local row (sub-pixel)
    scale: jnp.ndarray      # [K] blob scale relative to octave base
    sharpness: jnp.ndarray  # [K] interpolated DoG response
    edgeness: jnp.ndarray   # [K] tr^2/det curvature ratio
    valid: jnp.ndarray      # [K] bool


def _shift(a, dy, dx, fill):
    """Spatially shifted view of [P, H, W] with constant fill."""
    H, W = a.shape[-2:]
    p = jnp.pad(a, ((0, 0), (1, 1), (1, 1)), constant_values=fill)
    return p[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]


def _neighbor_extrema(dog, n_scales: int):
    """Max/min over the 26 neighbors for each of the S center planes.

    dog: [S+2, H, W].  Returns (center [S,H,W], maxv, minv).
    Separable decomposition (~14 shifted passes instead of 52): the
    horizontal 3-max feeds both the full-3x3 maxima of the adjacent
    planes and the in-plane 8-neighbor maxima.
    """
    S = n_scales
    center = dog[1 : S + 1]
    neg = jnp.float32(-3.4e38)
    pos = jnp.float32(3.4e38)

    hmax = jnp.maximum(jnp.maximum(_shift(dog, 0, -1, neg), dog),
                       _shift(dog, 0, 1, neg))
    hmin = jnp.minimum(jnp.minimum(_shift(dog, 0, -1, pos), dog),
                       _shift(dog, 0, 1, pos))
    full_max = jnp.maximum(jnp.maximum(_shift(hmax, -1, 0, neg), hmax),
                           _shift(hmax, 1, 0, neg))
    full_min = jnp.minimum(jnp.minimum(_shift(hmin, -1, 0, pos), hmin),
                           _shift(hmin, 1, 0, pos))
    # In-plane 8 neighbors: rows above/below via hmax/hmin, plus the
    # left/right neighbors in the same row.
    inp_max = jnp.maximum(
        jnp.maximum(_shift(hmax, -1, 0, neg), _shift(hmax, 1, 0, neg)),
        jnp.maximum(_shift(dog, 0, -1, neg), _shift(dog, 0, 1, neg)),
    )
    inp_min = jnp.minimum(
        jnp.minimum(_shift(hmin, -1, 0, pos), _shift(hmin, 1, 0, pos)),
        jnp.minimum(_shift(dog, 0, -1, pos), _shift(dog, 0, 1, pos)),
    )
    maxv = jnp.maximum(
        jnp.maximum(full_max[0:S], full_max[2 : S + 2]), inp_max[1 : S + 1]
    )
    minv = jnp.minimum(
        jnp.minimum(full_min[0:S], full_min[2 : S + 2]), inp_min[1 : S + 1]
    )
    return center, maxv, minv


def _refine_dense(dog, n_scales: int):
    """Dense closed-form 3D quadratic refinement over the whole DoG
    volume: returns [5, S, H, W] stacked (pdx, pdy, pds, sharpness,
    edge) maps, mirroring the reference's per-candidate finite
    differences and adjugate solve (CudaSift/cudaSiftD.cu:1383-1415).

    Dense-then-gather beats gather-then-compute on TPU: the 27-element
    neighborhood gather per candidate measured +18 ms/image, while
    these ~20 shifted elementwise passes cost ~1 ms and the final
    per-candidate lookup gathers only 5 values.
    """
    S = n_scales
    z = jnp.float32(0.0)
    c = dog[1 : S + 1]
    # Spatial / scale shifts of the center planes.
    xm = _shift(c, 0, -1, z)
    xp = _shift(c, 0, 1, z)
    ym = _shift(c, -1, 0, z)
    yp = _shift(c, 1, 0, z)
    sm = dog[0:S]
    sp = dog[2 : S + 2]
    val = c
    dxx = 2.0 * val - xm - xp
    dyy = 2.0 * val - ym - yp
    dss = 2.0 * val - sm - sp
    dxy = 0.25 * (
        _shift(c, 1, 1, z) + _shift(c, -1, -1, z)
        - _shift(c, -1, 1, z) - _shift(c, 1, -1, z)
    )
    dxs = 0.25 * (
        _shift(sp, 0, 1, z) + _shift(sm, 0, -1, z)
        - _shift(sm, 0, 1, z) - _shift(sp, 0, -1, z)
    )
    dys = 0.25 * (
        _shift(sp, 1, 0, z) + _shift(sm, -1, 0, z)
        - _shift(sp, -1, 0, z) - _shift(sm, 1, 0, z)
    )
    dx = 0.5 * (xp - xm)
    dy = 0.5 * (yp - ym)
    ds = 0.5 * (sm - sp)
    pdx, pdy, pds, sharp, edge = refine_from_coeffs(
        val, dx, dy, ds, dxx, dyy, dss, dxy, dxs, dys
    )
    return jnp.stack([pdx, pdy, pds, sharp, edge])  # [5, S, H, W]


def refine_from_coeffs(val, dx, dy, ds, dxx, dyy, dss, dxy, dxs, dys):
    """Closed-form 3D quadratic refinement from finite-difference
    coefficients (CudaSift/cudaSiftD.cu:1383-1415): returns (pdx, pdy,
    pds, sharpness, edge).  Shared by the dense XLA path and the lean
    fused-kernel path, where the dense kernel emits the coefficients
    and this runs on the top-k gathered candidates only."""
    tra = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge = tra * tra / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)

    # Adjugate of the 3x3 Hessian [[dxx,dxy,dxs],[dxy,dyy,dys],[dxs,dys,dss]]
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
    off = jnp.maximum(jnp.maximum(jnp.abs(pdx), jnp.abs(pdy)), jnp.abs(pds))
    safe = lambda num, den: num / jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
    fallback = off > 0.5
    pdx = jnp.where(fallback, safe(dx, dxx), pdx)
    pdy = jnp.where(fallback, safe(dy, dyy), pdy)
    pds = jnp.where(fallback, safe(ds, dss), pds)
    # The quadratic model is only valid within ~1 pixel/plane; clamping
    # also bounds keypoint scale to 2^(1/S + 1) so the Pallas sampling
    # kernels' static patch size covers every descriptor window.
    pdx = jnp.clip(pdx, -1.0, 1.0)
    pdy = jnp.clip(pdy, -1.0, 1.0)
    pds = jnp.clip(pds, -1.0, 1.0)
    dval = 0.5 * (dx * pdx + dy * pdy + ds * pds)
    return pdx, pdy, pds, val + dval, edge


def _topk_2level(flat_resp, k: int, block: int = 8):
    """EXACT top-k via a max-pool prefilter: top-k over per-block
    maxima, re-expand the winning blocks, top-k over the k*block
    gathered values.  Any block holding a true top-k element has
    block-max >= the kth value, so the k strongest blocks contain the
    k strongest elements (exact ties are interchangeable).  Cuts the
    O(n) top-k input 8x — the selection was 13.4 ms of the 49.6 ms
    dense stage at the 2560x1920 capacity class (NOTES_R3 breakdown).

    (r4: an exact 3-LEVEL scheme — 8x8 max-pool, two expand/top-k
    rounds, sorting 141k instead of 284k elements at the up-scale
    octave 0 — measured SLOWER on device, 10.16 vs 8.94 ms for the
    detect stage: the expand gathers cost more than the smaller sorts
    save.  Removed; NOTES_R4.)
    """
    n = flat_resp.shape[0]
    nb = n // block
    if k > nb or nb * block != n:
        return jax.lax.top_k(flat_resp, k)
    blocks = flat_resp.reshape(nb, block)
    bscore = jnp.max(blocks, axis=1)
    _, bidx = jax.lax.top_k(bscore, k)
    cand = blocks[bidx].reshape(-1)                       # [k*block]
    scores, ci = jax.lax.top_k(cand, k)
    flat_idx = bidx[ci // block] * block + ci % block
    return scores, flat_idx.astype(jnp.int32)


def select_from_maps(resp_px, aux, cfg: SiftConfig) -> Detections:
    """Top-k selection + gather from dense per-pixel candidate maps.

    resp_px: [H, W] candidate response (-1 where no candidate);
    aux: [6, H, W] stacking (s, dx, dy, ds, sharpness, edgeness) at the
    selected scale, OR [11, H, W] of raw refinement coefficients
    (s, val, dx, dy, ds, dxx, dyy, dss, dxy, dxs, dys) from the LEAN
    kernel — there the quadratic solve runs HERE on the K gathered
    candidates instead of densely at every pixel (r4: the dense
    divisions/exp2 were ~40% of the detect kernel's per-pixel work).
    Mirrors detect()'s selection tail; consumed by the fused Pallas
    dense stage (ops/pallas_detect.py) which produces the maps without
    materializing the DoG volume in HBM.
    """
    S = cfg.num_scales
    K = cfg.max_pts_per_octave
    H, W = resp_px.shape
    if cfg.select not in ("topk", "approx", "compact"):
        raise ValueError(f"detect: unknown select mode {cfg.select!r}")
    k_eff = min(K, H * W)
    flat_resp = resp_px.reshape(-1)
    if cfg.select == "compact":
        from sfm_tpu.ops.compact import compaction_order

        flat_idx = compaction_order(flat_resp > 0.0)[:k_eff]
        scores = flat_resp[flat_idx]
    elif cfg.select == "approx":
        scores, flat_idx = jax.lax.approx_max_k(flat_resp, k_eff)
    else:
        scores, flat_idx = _topk_2level(flat_resp, k_eff, block=cfg.topk_block)
    if k_eff < K:
        scores = jnp.pad(scores, (0, K - k_eff), constant_values=-1.0)
        flat_idx = jnp.pad(flat_idx, (0, K - k_eff))
    nc = aux.shape[0]
    vals = jnp.take(aux.reshape(nc, -1), flat_idx, axis=1)  # [nc, K]
    if nc == 11:
        s_sel = vals[0]
        pdx, pdy, pds, sharp, edge = refine_from_coeffs(*vals[1:])
    else:
        s_sel, pdx, pdy, pds, sharp, edge = vals
    y_idx = flat_idx // W
    x_idx = flat_idx % W
    return Detections(
        x=x_idx.astype(jnp.float32) + pdx,
        y=y_idx.astype(jnp.float32) + pdy,
        scale=jnp.exp2((s_sel + pds) / S),
        sharpness=sharp,
        edgeness=edge,
        valid=scores > 0.0,
    )


def detect_fused(base, taps, cfg: SiftConfig, subsampling: float,
                 interpret: bool = False) -> Detections:
    """Fused-Pallas detection for one octave: dense maps from the
    kernel (blur bank + DoG + NMS + refine in VMEM), then the shared
    XLA top-k tail.  taps: pyramid.octave_kernel_bank for this octave.
    """
    from sfm_tpu.ops import pallas_detect

    taps_t = tuple(tuple(float(v) for v in row) for row in np.asarray(taps))
    resp, aux = pallas_detect.detect_maps(
        base,
        taps=taps_t,
        n_scales=cfg.num_scales,
        thresh=float(cfg.thresh),
        edge_limit=float(cfg.edge_limit),
        scale_gate=float(cfg.lowest_scale / subsampling),
        interpret=interpret,
        lean=cfg.detect_lean,
    )
    return select_from_maps(resp, aux, cfg)


def detect(dog, cfg: SiftConfig, subsampling: float) -> Detections:
    """Detect up to max_pts_per_octave keypoints in one octave's DoG."""
    S = cfg.num_scales
    K = cfg.max_pts_per_octave
    _, H, W = dog.shape
    center, maxv, minv = _neighbor_extrema(dog, S)
    thresh = jnp.float32(cfg.thresh)
    is_max = center > jnp.maximum(thresh, maxv)
    is_min = center < jnp.minimum(-thresh, minv)
    cand = is_max | is_min
    # Exclude a 1-pixel spatial border (reference clamps reads there;
    # such detections are artifacts of clamping).
    border = jnp.zeros((H, W), bool).at[1:-1, 1:-1].set(True)
    cand = cand & border[None]

    refined = _refine_dense(dog, S)  # [5, S, H, W]
    pds_d = refined[2]
    edge_d = refined[4]
    # Reference test: tra*tra < edgeLimit*det, which requires det > 0;
    # in ratio form: 0 < tr^2/det < edgeLimit.  Folding the edge and
    # scale gates into the response BEFORE top-k means every selected
    # slot is a real keypoint (better capacity use than ref's append).
    edge_ok = (edge_d > 0.0) & (edge_d < cfg.edge_limit)
    scale_d = jnp.exp2(
        (jax.lax.broadcasted_iota(jnp.float32, center.shape, 0) + pds_d) / S
    )
    scale_ok = scale_d >= (cfg.lowest_scale / subsampling)
    cand = cand & edge_ok & scale_ok

    response = jnp.where(cand, jnp.abs(center), -1.0)
    # Reduce over scale BEFORE top-k (strongest scale per pixel): the
    # selection then runs on [H*W] instead of [S*H*W] — 5x less top-k
    # work, the detect stage's main cost after the pyramid.  Two scales
    # surviving strict 26-neighbor NMS at the SAME pixel requires a
    # |ds| >= 2 scale gap — vanishingly rare — and the reference's
    # atomic append would keep an arbitrary one under capacity pressure
    # anyway; we keep the strongest.
    resp_px = jnp.max(response, axis=0)            # [H, W]
    s_sel = jnp.argmax(response, axis=0)           # [H, W]
    # Coarse octaves can have fewer pixels than the slot capacity
    # (e.g. 32K-class configs, tools/bench_capacity.py): clamp the
    # selection and pad back to K invalid slots.
    if cfg.select not in ("topk", "approx", "compact"):
        raise ValueError(f"detect: unknown select mode {cfg.select!r}")
    k_eff = min(K, H * W)
    flat_resp = resp_px.reshape(-1)
    if cfg.select == "compact":
        # Scan-order selection by O(n) cumsum compaction — the
        # reference's atomic-append semantics (cudaSiftD.cu:1420)
        # instead of strongest-first; identical result while the
        # candidate count fits the capacity (the common case).
        from sfm_tpu.ops.compact import compaction_order

        flat_idx = compaction_order(flat_resp > 0.0)[:k_eff]
        scores = flat_resp[flat_idx]
    elif cfg.select == "approx":
        scores, flat_idx = jax.lax.approx_max_k(flat_resp, k_eff)
    else:
        scores, flat_idx = _topk_2level(flat_resp, k_eff, block=cfg.topk_block)
    if k_eff < K:
        scores = jnp.pad(scores, (0, K - k_eff), constant_values=-1.0)
        flat_idx = jnp.pad(flat_idx, (0, K - k_eff))
    s_idx = jnp.take(s_sel.reshape(-1), flat_idx)
    y_idx = flat_idx // W
    x_idx = flat_idx % W
    valid = scores > 0.0

    # Gather the 5 refined values per selected candidate (flat take).
    flat3 = s_idx * (H * W) + flat_idx
    vals = jnp.take(refined.reshape(5, -1), flat3, axis=1)  # [5, K]
    pdx, pdy, pds, sharp, edge = vals
    scale = jnp.exp2((s_idx.astype(jnp.float32) + pds) / S)

    return Detections(
        x=x_idx.astype(jnp.float32) + pdx,
        y=y_idx.astype(jnp.float32) + pdy,
        scale=scale,
        sharpness=sharp,
        edgeness=edge,
        valid=valid,
    )
