"""Pallas TPU kernels for per-keypoint oriented sampling.

The reference's orientation/descriptor kernels are texture-unit
gather machines (reference CudaSift/cudaSiftD.cu:972-1057, 308-417).
TPUs have no gather hardware — XLA lowers per-sample indexing to
scalar gathers at ~9 ns/element (measured: 42M gathers ≈ 1.1 s for a
dino pair).  These kernels recast sampling as MXU/VPU work:

  * the octave image lives as a single VMEM block (<= 1.7 MB);
  * each program handles a block of keypoints; per keypoint an
    8-aligned row slab is sliced and columns are cropped with a
    one-hot matmul (Mosaic forbids lane-dim dynamic slices);
  * ALL sample positions are evaluated in one `[S, rows] @ [rows, P]`
    matmul whose sampling matrix rows are tent functions
    max(0, 1 - |pos - index|) — bilinear interpolation as dense
    linear algebra;
  * gradients use the reference's exact rotated central differences
    (4 sample groups batched into the same matmul);
  * histogram / descriptor binning are one-hot broadcasts + column
    sums (layout chosen so no transposes or 1-D reshapes are needed —
    Mosaic supports neither well).

Cost per keypoint ~ 3 MFLOP of small matmuls — hundreds of times
cheaper than the gather path on this hardware.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Patch sizes (static): descriptor reach = 7.5*0.75*scale*sqrt(2) + 2
# with scale clamped <= 2 by the detector -> r <= 18; orientation
# reach = 5 + 1 + 1 = 7.
DESC_P = 40
ORI_P = 16
_GAUSS16 = np.exp(-((np.arange(16) - 7.5) ** 2) / 128.0).astype(np.float32)


def _spatial_weight_matrix() -> np.ndarray:
    """[16, 4] per-axis bilinear cell weights (see
    sift.describe._spatial_weight_matrix; kept in sync)."""
    W1 = np.zeros((16, 4), np.float32)
    for i in range(16):
        ci = (i + 2) // 4 - 1
        f = (i - 1.5) / 4.0 - ci
        if i >= 2 and 0 <= ci <= 3:
            W1[i, ci] = 1.0 - f
        if i <= 13 and 0 <= ci + 1 <= 3:
            W1[i, ci + 1] = f
    return W1


def _wsp128() -> np.ndarray:
    """[256, 128] combined spatial weights: sample s = j*16+i (j = row,
    i = col), output q = (cy*4 + cx)*8 + a; value = W1[j,cy]*W1[i,cx]
    (independent of the angle bin a — that factor is elementwise)."""
    W1 = _spatial_weight_matrix()
    W = np.zeros((256, 128), np.float32)
    for j in range(16):
        for i in range(16):
            s = j * 16 + i
            for cy in range(4):
                for cx in range(4):
                    w = W1[j, cy] * W1[i, cx]
                    if w:
                        q0 = (cy * 4 + cx) * 8
                        W[s, q0 : q0 + 8] = w
    return W


_W_SPATIAL_128 = _wsp128()
_W_SPATIAL_128_T = np.ascontiguousarray(_W_SPATIAL_128.T)  # [128, 256]
_W2D_COL = (
    (_GAUSS16[:, None] * _GAUSS16[None, :]).reshape(256, 1).astype(np.float32)
)
_W2D_ROW = np.ascontiguousarray(_W2D_COL.reshape(1, 256))


def _wsp16() -> np.ndarray:
    """[256, 16] spatial cell weights: sample s = j*16+i -> cell
    sp = cy*4+cx with weight W1[j,cy]*W1[i,cx] (the angle factor is
    applied elementwise per bin; see _desc_post_wide)."""
    W1 = _spatial_weight_matrix()
    W = np.zeros((256, 16), np.float32)
    for j in range(16):
        for i in range(16):
            for cy in range(4):
                for cx in range(4):
                    W[j * 16 + i, cy * 4 + cx] = W1[j, cy] * W1[i, cx]
    return W


def _perm_a16() -> np.ndarray:
    """[128, 128] static permutation: column a*16+sp of the per-bin
    concatenation -> descriptor bin q = sp*8 + a."""
    P = np.zeros((128, 128), np.float32)
    for a in range(8):
        for sp in range(16):
            P[a * 16 + sp, sp * 8 + a] = 1.0
    return P


_WSP16 = _wsp16()
_PERM_A16 = _perm_a16()


def _atan2(y, x):
    """Branchless polynomial atan2 (Mosaic has no atan2 lowering).

    Minimax polynomial on t in [0, 1] (|err| < 1e-6 rad), octant
    reduction via min/max — same spirit as the reference's FastAtan2
    (CudaSift/matching.cu).  atan2(0, 0) returns 0.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    s = t * t
    p = -0.0117212
    p = p * s + 0.05265332
    p = p * s + -0.11643287
    p = p * s + 0.19354346
    p = p * s + -0.33262348
    p = p * s + 0.99997726
    r = t * p
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def page_atlas(img, P=DESC_P):
    """[H, W] atlas -> [nb, Hp, 128] page-major form for the blk
    loaders (_load_patch_blk).  MUST run in the PRODUCER program (the
    detect stage): a >=16 MB Pallas VMEM operand compiles only as a
    program PARAMETER — as an in-program intermediate XLA stages it on
    the kernel's VMEM stack and OOMs the 16 MB scoped limit (r4,
    NOTES_R4)."""
    img = _pad_for_kernel(img, P)
    if img.shape[1] < 256:
        img = jnp.pad(img, ((0, 0), (0, 256 - img.shape[1])), mode="edge")
    Hp, Wp = img.shape
    return jnp.transpose(img.reshape(Hp, Wp // 128, 128), (1, 0, 2))


def _pad_for_kernel(img, P):
    """Pad to H multiple of 8 and >= P+8, W a multiple of 128 and >= P
    (edge replicate): 8-aligned sublane slices stay in bounds and the
    lane dimension is rotate-aligned (tpu.dynamic_rotate requires a
    lane-aligned shape)."""
    H, W = img.shape
    Hp = max(-(-H // 8) * 8, P + 8)
    Wp = max(-(-W // 128) * 128, P)
    if Hp != H or Wp != W:
        img = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")
    return img


def _load_patch(img_ref, x0, y0, P):
    """Load a [P + 8, P] patch with Mosaic-friendly addressing.

    Dynamic slices on the sublane (row) dim must be 8-aligned and the
    lane (column) dim cannot be dynamically sliced, so we slice
    8-aligned rows across the FULL width, rotate columns so x0 lands at
    lane 0 (tpu.dynamic_rotate — NOTE: the shift must be NON-NEGATIVE;
    negative dynamic shifts miscompile on v5e, measured r2), then crop
    statically.  Returns (patch, dy) where dy in [0, 8] is the row
    offset of the requested origin inside the patch.
    """
    H, W = img_ref.shape
    rows_n = P + 8
    y0a = jnp.minimum((y0 // 8) * 8, H - rows_n)
    y0a = jnp.maximum(y0a, 0)
    y0a = pl.multiple_of(y0a, 8)
    rows = img_ref[pl.ds(y0a, rows_n), :]          # [P+8, W]
    rolled = pltpu.roll(rows, shift=jax.lax.rem(W - x0, W), axis=1)
    patch = rolled[:, :P]                          # [P+8, P]
    return patch, (y0 - y0a).astype(jnp.float32)


def _load_patch_blk(img_ref, x0, y0, P):
    """[P + 8, P] patch from a PAGED atlas [nb, Ha, 128].

    The full-width form (_load_patch) lane-rotates [P+8, W] per
    keypoint — ~4.5 ms of the 9.5 ms kernel at the up-scale atlas
    width W=2560 (phase0, tools/exp_sample_phase.py), scaling with W.
    With the atlas pre-paged into 128-column blocks, Mosaic allows a
    DYNAMIC slice on the leading (page) dimension, so the patch loads
    two pages [2, P+8, 128] and the rotate shrinks to 256 lanes —
    ~10x less rotate work, independent of atlas width.
    """
    nb, H, _ = img_ref.shape
    rows_n = P + 8
    y0a = jnp.minimum((y0 // 8) * 8, H - rows_n)
    y0a = jnp.maximum(y0a, 0)
    y0a = pl.multiple_of(y0a, 8)
    b = jnp.minimum(x0 // 128, nb - 2)
    slab = img_ref[pl.ds(b, 2), pl.ds(y0a, rows_n), :]   # [2, P+8, 128]
    win = jnp.concatenate([slab[0], slab[1]], axis=1)    # [P+8, 256]
    dxc = x0 - b * 128
    rolled = pltpu.roll(win, shift=jax.lax.rem(256 - dxc, 256), axis=1)
    return rolled[:, :P], (y0 - y0a).astype(jnp.float32)


# dot_general dimension numbers for the wide (samples-in-lanes) layout.
_DN_ROWS = (((0,), (0,)), ((), ()))   # patch [R, P] x A [R, S] -> [P, S]
_DN_LANE = (((1,), (1,)), ((), ()))   # a [M, S]   x b [N, S] -> [M, N]


def _sample_matmul_wide(patch, px, py, P, precision=None):
    """Bilinear-sample `patch` [P + 8, P] at S positions -> [1, S].

    Wide layout: px/py are [1, S] with samples in LANES.  The narrow
    [S, 1] layout costs ~S MXU cycles per keypoint (the matmul streams
    S rows regardless of the tiny K/N dims); this form streams only
    P rows over ceil(S/128) tiles — 2.4x faster measured on the 2048-
    keypoint descriptor stage (2.79 -> 1.14 ms, r2).  Coords are
    clamped to the patch (replicate-border, matching the reference's
    clamp-to-edge texture fetches).

    `precision`: the MXU truncates dot INPUTS to bf16 at default
    precision (preferred_element_type only widens the accumulator), so
    sampled intensities carry ~0.4% rounding; consumers take central
    differences, which amplifies it to ~3% on orientation histograms
    (measured on-device r2, tools/diag_hist.py).  The orientation path
    passes HIGHEST; the descriptor path tolerates the default.
    """
    S = px.shape[1]
    rows_n = P + 8
    px = jnp.clip(px, 0.0, P - 1.0)
    py = jnp.clip(py, 0.0, rows_n - 1.0)
    idx_r = jax.lax.broadcasted_iota(jnp.int32, (rows_n, S), 0).astype(jnp.float32)
    idx_c = jax.lax.broadcasted_iota(jnp.int32, (P, S), 0).astype(jnp.float32)
    A = jnp.maximum(0.0, 1.0 - jnp.abs(py - idx_r))  # [rows_n, S]
    B = jnp.maximum(0.0, 1.0 - jnp.abs(px - idx_c))  # [P, S]
    if precision == "x3":
        # Manual bf16x3: Mosaic lowers only DEFAULT and HIGHEST
        # (bf16x6) dot precisions; the orientation path needs full
        # per-operand f32 mantissa coverage (gradient differences
        # amplify bf16 input rounding, r2 diag_hist) but not the x6
        # product accuracy — splitting each operand into (hi, lo)
        # bf16 parts and dropping the lo*lo term is exactly bf16x3 at
        # HALF the MXU passes of HIGHEST.
        ph = patch.astype(jnp.bfloat16).astype(jnp.float32)
        pl_ = patch - ph
        ah = A.astype(jnp.bfloat16).astype(jnp.float32)
        al = A - ah
        dot = lambda a, b: jax.lax.dot_general(
            a, b, _DN_ROWS, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
        )
        tmp = dot(ph, ah) + dot(ph, al) + dot(pl_, ah)
    else:
        tmp = jax.lax.dot_general(
            patch, A, _DN_ROWS, preferred_element_type=jnp.float32,
            # None must resolve to an EXPLICIT DEFAULT: inside Mosaic
            # the ambient default_matmul_precision of an f32-wrapped
            # caller would otherwise leak in and fail to lower (r5).
            precision=precision or jax.lax.Precision.DEFAULT,
        )                                            # [P, S]
    return jnp.sum(tmp * B, axis=0, keepdims=True)   # [1, S]


def _descriptor_from_patch_wide(patch, w2dw_ref, wsp16_ref, perm_ref,
                                fx, fy, cosa, sina, scale):
    """One unnormalized [1, 128] descriptor from an existing patch.

    Wide layout (samples in LANES): the [1024]-sample stage runs as a
    [P, rows]x[rows, 1024] matmul and the binning as the batched
    masked matmuls of _desc_post_wide.  w2dw_ref: [1, 256] Gaussian
    window row; wsp16_ref: [256, 16] spatial cell weights; perm_ref:
    [128, 128] bin permutation.  Mirrors cudaSiftD.cu:308-417.
    """
    return _desc_post_wide(
        _desc_sample_wide(patch, fx, fy, cosa, sina, scale),
        w2dw_ref, wsp16_ref, perm_ref,
    )


def _desc_sample_wide(patch, fx, fy, cosa, sina, scale):
    """Sample the 1024 descriptor positions -> [1, 1024] values."""
    P = DESC_P
    sc = (12.0 / 16.0) * scale
    # s = grp*256 + j*16 + i  (grp: 4 finite-difference groups).
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1024), 1)
    i_f = (s_idx % 16).astype(jnp.float32) - 7.5
    j_f = ((s_idx // 16) % 16).astype(jnp.float32) - 7.5
    grp = s_idx // 256
    bx = fx + sc * (i_f * cosa - j_f * sina)
    by = fy + sc * (i_f * sina + j_f * cosa)
    # groups: +u, -u, +v, -v with u = (cosa, sina), v = (-sina, cosa)
    gx = jnp.where(grp == 0, cosa, jnp.where(grp == 1, -cosa,
                   jnp.where(grp == 2, -sina, sina)))
    gy = jnp.where(grp == 0, sina, jnp.where(grp == 1, -sina,
                   jnp.where(grp == 2, cosa, -cosa)))
    return _sample_matmul_wide(patch, bx + gx, by + gy, P)


def _desc_post_wide(vals, w2dw_ref, wsp16_ref, perm_ref):
    """Descriptor post-processing: [B, 1024] sample values -> [B, 128].

    Fully batched over keypoints (r4): for each of the 8 angle bins the
    bin's soft weight is an elementwise mask on the [B, 256] grads and
    the spatial binning is ONE keypoint-batched [B, 256] x [256, 16]
    matmul; a static [128, 128] permutation matmul interleaves the
    a-major concatenation into q = sp*8 + a order.  The r2/r3 form
    built two data-dependent [128, 256] one-hots PER KEYPOINT (~64
    vregs x ~5 passes x B per block — it dominated the fused kernel's
    VPU time; device A/B r4: sample stage 8.8 -> see NOTES_R4).
    """
    dx = vals[:, 0:256] - vals[:, 256:512]    # [B, 256]
    dy = vals[:, 512:768] - vals[:, 768:1024]
    grad = w2dw_ref[:, :] * jnp.sqrt(dx * dx + dy * dy)  # [B, 256]
    ang = 4.0 / np.pi * _atan2(dy, dx) + 4.0
    angi = jnp.clip(jnp.floor(ang), 0.0, 7.0)
    angf = ang - angi
    angi2 = jnp.where(angi + 1.0 > 7.0, 0.0, angi + 1.0)
    dn = (((1,), (0,)), ((), ()))
    cols = []
    for a in range(8):
        af = jnp.float32(a)
        wa = (
            jnp.where(angi == af, 1.0 - angf, 0.0)
            + jnp.where(angi2 == af, angf, 0.0)
        )
        cols.append(jax.lax.dot_general(
            grad * wa, wsp16_ref[:, :], dn,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
        ))                                    # [B, 16]
    cat = jnp.concatenate(cols, axis=1)       # [B, 128], a-major
    return jax.lax.dot_general(
        cat, perm_ref[:, :], dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )                                         # [B, 128], q = sp*8 + a


def _descriptor_one(img_ref, w2dw_ref, wsp16_ref, perm_ref, x0, y0, fx, fy,
                    cosa, sina, scale, blk=False):
    """One unnormalized [1, 128] descriptor row (loads its own patch)."""
    loader = _load_patch_blk if blk else _load_patch
    patch, dy_off = loader(img_ref, x0, y0, DESC_P)
    return _descriptor_from_patch_wide(
        patch, w2dw_ref, wsp16_ref, perm_ref, fx, fy + dy_off, cosa, sina,
        scale
    )


def _make_descriptor_kernel(block_k: int, blk: bool = False):
    def kernel(count_ref, x0_ref, y0_ref, fx_ref, fy_ref, ca_ref, sa_ref,
               sc_ref, img_ref, w2d_ref, wsp_ref, perm_ref, out_ref):
        kb = pl.program_id(0)
        # Zero the whole block first: slots past `count` must not leave
        # uninitialized VMEM in the output (0 * NaN = NaN downstream).
        out_ref[:, :] = jnp.zeros_like(out_ref)
        for k in range(block_k):
            i = kb * block_k + k

            @pl.when(i < count_ref[0])
            def _():
                d = _descriptor_one(
                    img_ref, w2d_ref, wsp_ref, perm_ref, x0_ref[i],
                    y0_ref[i], fx_ref[i], fy_ref[i], ca_ref[i], sa_ref[i],
                    sc_ref[i], blk=blk,
                )
                out_ref[k, :] = d[0, :]

    return kernel


def _make_descriptor_kernel_wide(block_k: int, blk: bool = False):
    """Block-batched descriptor-only kernel (r4): per-keypoint patch
    loads + sampling dots, then ONE batched _desc_post_wide per block
    — the same wide layout as the fused kernel's phases 3-4.  Used by
    the duplicate-descriptor split (frontend._sample_stage): the
    narrow per-keypoint kernel (_make_descriptor_kernel) wastes 7/8 of
    every VPU issue and measured +3.5 ms at up_t2.0 for ~1.5k
    duplicates (phase4->5 delta, tools/exp_sample_phase.py)."""

    def kernel(count_ref, x0_ref, y0_ref, fx_ref, fy_ref, ca_ref, sa_ref,
               sc_ref, img_ref, w2d_ref, wsp_ref, perm_ref, out_ref):
        kb = pl.program_id(0)
        out_ref[:, :] = jnp.zeros_like(out_ref)

        @pl.when(kb * block_k < count_ref[0])
        def _():
            loader = _load_patch_blk if blk else _load_patch
            vrows = []
            for k in range(block_k):
                i = kb * block_k + k
                patch, dy_off = loader(img_ref, x0_ref[i], y0_ref[i],
                                       DESC_P)
                ca = jnp.full((1, 1), ca_ref[i], jnp.float32)
                sa = jnp.full((1, 1), sa_ref[i], jnp.float32)
                vrows.append(_desc_sample_wide(
                    patch, fx_ref[i], fy_ref[i] + dy_off, ca, sa,
                    sc_ref[i]))
            vals = jnp.concatenate(vrows, axis=0)          # [B, 1024]
            slot = jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 1), 0) + kb * block_k
            vmask = (slot < count_ref[0]).astype(jnp.float32)
            out_ref[:, :] = _desc_post_wide(
                vals, w2d_ref, wsp_ref, perm_ref) * vmask

    return kernel


@functools.partial(jax.jit, static_argnames=("block_k", "interpret",
                                             "blk", "wide"))
def descriptor_sample(img, x, y, scale, orientation_deg, count=None, *,
                      block_k: int = 8, interpret: bool = False,
                      blk: bool = False, wide: bool = False):
    """[K, 128] raw (unnormalized) descriptors via the Pallas kernel.

    img: [H, W] f32 octave base; x/y/scale in octave coords;
    orientation in degrees.  K must be a multiple of block_k.
    """
    K = x.shape[0]
    P = DESC_P
    if img.ndim == 3:
        # Pre-paged atlas (page_atlas in the producer program).
        assert blk, '3D (paged) atlas requires blk=True'
        H, W = img.shape[1], img.shape[0] * 128
    else:
        H, W = img.shape
        img = _pad_for_kernel(img, P)
        if blk:
            img = page_atlas(img, P)
    theta = orientation_deg * (2.0 * np.pi / 360.0)
    cosa = jnp.cos(theta)
    sina = jnp.sin(theta)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32) - P // 2 + 1, 0, max(W - P, 0))
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32) - P // 2 + 1, 0, max(H - P, 0))
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)
    if count is None:
        count = jnp.asarray([K], jnp.int32)
    else:
        count = jnp.asarray(count, jnp.int32).reshape(1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        (_make_descriptor_kernel_wide if wide else
         _make_descriptor_kernel)(block_k, blk=blk),
        out_shape=jax.ShapeDtypeStruct((K, 128), jnp.float32),
        grid=(K // block_k,),
        in_specs=[smem] * 8 + [vmem] * 4,
        out_specs=pl.BlockSpec(
            (block_k, 128), lambda kb: (kb, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(count, x0, y0, fx, fy, cosa, sina, scale, img,
      jnp.asarray(_W2D_ROW), jnp.asarray(_WSP16), jnp.asarray(_PERM_A16))
    return out


# Orientation sampling precision: the histogram takes central
# differences of the sampled values, so single-pass bf16 MXU inputs
# put ~3% noise on the gradients (r2 device study, tools/diag_hist.py)
# — the dot needs a multi-pass precision.  Mosaic's dot lowering
# supports only DEFAULT and HIGHEST (bf16x6); "x3" selects the manual
# bf16x3 operand split in _sample_matmul_wide — full per-operand f32
# mantissa coverage at half the HIGHEST MXU passes.
_ORI_PRECISION = "x3"


def _orient_sample_wide(patch, fx, fy, P):
    """Sample the 484 orientation positions -> [1, 484] values."""
    # s = grp*121 + yd*11 + xd in [1, 484] row layout.
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 484), 1)
    xd = ((s_idx % 121) % 11).astype(jnp.float32) - 5.0
    yd = ((s_idx % 121) // 11).astype(jnp.float32) - 5.0
    grp = s_idx // 121
    gx = jnp.where(grp == 0, 1.0, jnp.where(grp == 1, -1.0, 0.0))
    gy = jnp.where(grp == 2, 1.0, jnp.where(grp == 3, -1.0, 0.0))
    return _sample_matmul_wide(patch, fx + xd + gx, fy + yd + gy, P,
                               precision=_ORI_PRECISION)


def _orient_post_wide(vals, inv2s2):
    """Orientation post: [B, 484] sample values + [B, 1] Gaussian
    exponents -> [B, 32] histograms.

    Elementwise work batched over B rows; the data-dependent bin
    one-hot contraction loops per row (an r4 attempt at 32 masked
    lane-reductions over the whole block measured SLOWER on device —
    phase1->2 delta 1.36 -> 2.43 ms at up_t2.0, NOTES_R4)."""
    B = vals.shape[0]
    dx = vals[:, 0:121] - vals[:, 121:242]
    dy = vals[:, 242:363] - vals[:, 363:484]
    grad = jnp.sqrt(dx * dx + dy * dy)                     # [B, 121]
    s121 = jax.lax.broadcasted_iota(jnp.int32, (1, 121), 1)
    xd0 = (s121 % 11).astype(jnp.float32) - 5.0
    yd0 = (s121 // 11).astype(jnp.float32) - 5.0
    w = jnp.exp(inv2s2 * (xd0 * xd0 + yd0 * yd0))          # [B, 121]
    bins = jnp.floor(16.0 / np.pi * _atan2(dy, dx) + 16.5)
    bins = jnp.where(bins > 31.0, 0.0, bins)
    gw = grad * w
    iota32 = jax.lax.broadcasted_iota(
        jnp.int32, (32, 121), 0).astype(jnp.float32)
    if B >= 16:
        # Batched contraction (r5): one [B, 121] x [121, B*32] dot for
        # the whole block + a block-diagonal mask + a static fold,
        # instead of B M=1 dots (each a full MXU pass at 1/128 M
        # utilization).  The per-keypoint one-hots are the same
        # element count — only the dot count changes.
        OH = jnp.concatenate(
            [jnp.where(iota32 == bins[k:k + 1, :], 1.0, 0.0)
             for k in range(B)], axis=0)                    # [B*32, 121]
        RES = jax.lax.dot_general(
            gw, OH, _DN_LANE, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )                                                   # [B, B*32]
        rowi = jax.lax.broadcasted_iota(jnp.int32, (B, B * 32), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (B, B * 32), 1)
        masked = jnp.where(coli // 32 == rowi, RES, 0.0)
        # Exact VPU fold of the block-diagonal: lane group k of row b
        # is nonzero only at k == b, so summing the 32-lane groups
        # extracts hist[b] — B-1 static slice adds, no second (bf16)
        # matmul pass.
        out = masked[:, 0:32]
        for g in range(1, B):
            out = out + masked[:, g * 32:(g + 1) * 32]
        return out                                          # [B, 32]
    rows = []
    for k in range(B):
        oh = jnp.where(iota32 == bins[k:k + 1, :], 1.0, 0.0)  # [32, 121]
        rows.append(jax.lax.dot_general(
            gw[k:k + 1, :], oh, _DN_LANE,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ))
    return rows[0] if B == 1 else jnp.concatenate(rows, axis=0)  # [B, 32]


def _orientation_hist_from_patch_wide(patch, fx, fy, inv2s2, P):
    """One [1, 32] orientation histogram from an existing patch, wide
    layout (cudaSiftD.cu:972-1010; see _descriptor_from_patch_wide for
    why samples live in lanes)."""
    vals = _orient_sample_wide(patch, fx, fy, P)
    return _orient_post_wide(vals, jnp.full((1, 1), inv2s2, jnp.float32))


def _orientation_one(img_ref, x0, y0, fx, fy, inv2s2):
    """One [1, 32] orientation histogram (loads its own patch)."""
    P = ORI_P
    patch, dy_off = _load_patch(img_ref, x0, y0, P)
    return _orientation_hist_from_patch_wide(patch, fx, fy + dy_off,
                                             inv2s2, P)


def _make_orientation_kernel(block_k: int):
    def kernel(count_ref, x0_ref, y0_ref, fx_ref, fy_ref, is_ref, img_ref,
               out_ref):
        kb = pl.program_id(0)
        # Zero-fill first so i >= count slots never expose stale VMEM.
        out_ref[:, :] = jnp.zeros_like(out_ref)
        for k in range(block_k):
            i = kb * block_k + k

            @pl.when(i < count_ref[0])
            def _():
                h = _orientation_one(
                    img_ref, x0_ref[i], y0_ref[i],
                    fx_ref[i], fy_ref[i], is_ref[i],
                )
                out_ref[k, :] = h[0, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def orientation_histogram_sample(img, x, y, scale, count=None, *,
                                 block_k: int = 8, interpret: bool = False):
    """[K, 32] gradient-orientation histograms via the Pallas kernel."""
    K = x.shape[0]
    H, W = img.shape
    P = ORI_P
    img = _pad_for_kernel(img, P)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32) - P // 2 + 1, 0, max(W - P, 0))
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32) - P // 2 + 1, 0, max(H - P, 0))
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)
    inv2s2 = -1.0 / (2.0 * (1.5 * scale) ** 2)
    if count is None:
        count = jnp.asarray([K], jnp.int32)
    else:
        count = jnp.asarray(count, jnp.int32).reshape(1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _make_orientation_kernel(block_k),
        out_shape=jax.ShapeDtypeStruct((K, 32), jnp.float32),
        grid=(K // block_k,),
        in_specs=[smem] * 6 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (block_k, 32), lambda kb: (kb, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(count, x0, y0, fx, fy, inv2s2, img)
    return out


# ---------------------------------------------------------------------------
# Fused orientation + descriptor kernel (r2).
#
# The two-kernel pipeline (orientation_histogram_sample -> XLA peak
# finding -> compaction -> descriptor_sample) pays the patch crop twice
# and ~3 ms of XLA glue (concat + sort of the duplicated keypoint set)
# between kernels.  This kernel does, per keypoint, with ONE patch:
#   crop -> orientation histogram -> smoothing + dual-peak finding
#   (all in-register, circulant matmuls instead of lane rolls) ->
#   descriptor for peak 1 -> descriptor for peak 2 (gated).
# Outputs are capacity-2K with validity masks: no second compaction.
# ---------------------------------------------------------------------------

def _smooth_peak_matrices() -> np.ndarray:
    """[32, 96] packed circulant constants: smoothing [1,4,6,4,1],
    roll(+1) and roll(-1) permutations (Mosaic-friendly matmuls replace
    the lane rolls of sift.orient.smooth_histogram)."""
    n = 32
    M = np.zeros((n, 3 * n), np.float32)
    taps = {0: 6.0, 1: 4.0, -1: 4.0, 2: 1.0, -2: 1.0}
    for d, v in taps.items():
        for i in range(n):
            M[i, (i + d) % n] += v                # hs = smooth(h)
            M[i, n + (i + d + 1) % n] += v        # left = roll(hs, +1)
            M[i, 2 * n + (i + d - 1) % n] += v    # right = roll(hs, -1)
    return M


def _peak_angle(hs, idx32):
    """Parabolic sub-bin peak -> degrees; hs [B,32], idx32 [B,1] f32."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1).astype(jnp.float32)
    sel = lambda i: jnp.sum(jnp.where(iota == i, hs, 0.0), axis=1, keepdims=True)
    v0 = sel(idx32)
    vp = sel(jnp.where(idx32 + 1.0 > 31.0, idx32 - 31.0, idx32 + 1.0))
    vm = sel(jnp.where(idx32 - 1.0 < 0.0, idx32 + 31.0, idx32 - 1.0))
    denom = 2.0 * v0 - vp - vm
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    peak = idx32 + 0.5 * (vp - vm) / denom
    peak = jnp.where(peak < 0.0, peak + 32.0, peak)
    return 11.25 * peak  # [B,1] degrees


def _make_fused_kernel(block_k: int, phases: int = 5, blk: bool = False):
    """Block-batched fused kernel.

    Per block of `block_k` keypoints: the data-dependent sampling dots
    run per keypoint (each needs its own patch + tent matrices), but
    ALL elementwise post-processing — gradients, atan2, Gaussian
    weights, histogram smoothing, dual-peak finding — runs batched on
    [block_k, S] arrays.  The per-keypoint [1, S] row form wastes 7/8
    of every VPU issue (1 of 8 sublanes); batching it cut the kernel
    3.9 -> 1.1 ms on the 2048-slot dino workload (r2).

    phases < 5 truncates the kernel after a phase (0 = patch
    loads/rolls only, 1 = + orientation dots, 2 = + orientation
    post/peaks, 3 = + descriptor dots, 4 = + descriptor post —
    everything but the second-peak descriptors) with a reduced write
    so nothing is DCE'd — profiling only (tools/exp_sample_phase.py);
    production always runs phases=5.
    """
    def kernel(count_ref, x0_ref, y0_ref, fx_ref, fy_ref, sc_ref, i2_ref,
               img_ref, w2d_ref, wsp_ref, perm_ref, smp_ref,
               out_d1, out_d2, out_aux):
        kb = pl.program_id(0)
        out_d1[:, :] = jnp.zeros_like(out_d1)
        out_d2[:, :] = jnp.zeros_like(out_d2)
        out_aux[:, :] = jnp.zeros_like(out_aux)

        @pl.when(kb * block_k < count_ref[0])
        def _():
            if phases < 0:
                # Empty kernel: measures launch + XLA glue only.
                return
            # --- phase 1: per-keypoint patch loads + orientation dots ---
            patches = []
            fxs = []
            fys = []
            orows = []
            i2rows = []
            for k in range(block_k):
                i = kb * block_k + k
                loader = _load_patch_blk if blk else _load_patch
                patch, dy_off = loader(img_ref, x0_ref[i], y0_ref[i],
                                       DESC_P)
                patches.append(patch)
                fxs.append(fx_ref[i])
                fys.append(fy_ref[i] + dy_off)
                if phases >= 1:
                    orows.append(_orient_sample_wide(patch, fxs[k],
                                                     fys[k], DESC_P))
                else:
                    orows.append(
                        jnp.sum(patch, axis=0, keepdims=True)[:, :1]
                        * jnp.ones((1, 484), jnp.float32))
                i2rows.append(jnp.full((1, 1), i2_ref[i], jnp.float32))
            ovals = jnp.concatenate(orows, axis=0)         # [B, 484]
            if phases <= 1:
                aux8p = jax.lax.broadcasted_iota(jnp.int32, (block_k, 8), 1)
                out_aux[:, :] = jnp.where(
                    aux8p == 0, jnp.sum(ovals, axis=1, keepdims=True), 0.0
                )
                return
            # --- phase 2: batched orientation post + dual peaks ---
            h = _orient_post_wide(ovals, jnp.concatenate(i2rows, axis=0))
            hlr = jnp.dot(h, smp_ref[:, :],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)  # [B, 96]
            hs = hlr[:, 0:32]
            left = hlr[:, 32:64]
            right = hlr[:, 64:96]
            is_peak = (hs > left) & (hs >= right)
            pv = jnp.where(is_peak, hs, 0.0)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 32), 1
            ).astype(jnp.float32)
            m1 = jnp.max(pv, axis=1, keepdims=True)        # [B, 1]
            i1 = jnp.min(jnp.where(pv == m1, iota, 99.0), axis=1,
                         keepdims=True)
            pv2 = jnp.where(iota == i1, 0.0, pv)
            m2 = jnp.max(pv2, axis=1, keepdims=True)
            i2 = jnp.min(jnp.where(pv2 == m2, iota, 99.0), axis=1,
                         keepdims=True)
            ori1 = jnp.where(m1 > 0, _peak_angle(hs, i1), 0.0)  # [B, 1]
            ori2 = jnp.where(m2 > 0, _peak_angle(hs, i2), 0.0)
            dup = jnp.where((m2 > 0.8 * m1) & (m2 > 0), 1.0, 0.0)
            # Tail-block slots past `count` compute masked garbage
            # (coords clamp); zero their output rows.
            slot = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0) \
                + kb * block_k
            vmask = (slot < count_ref[0]).astype(jnp.float32)   # [B, 1]

            aux8 = jax.lax.broadcasted_iota(jnp.int32, (block_k, 8), 1)
            out_aux[:, :] = (
                jnp.where(aux8 == 0, ori1, 0.0)
                + jnp.where(aux8 == 1, ori2, 0.0)
                + jnp.where(aux8 == 2, dup, 0.0)
            ) * vmask
            if phases <= 2:
                return

            # --- phase 3: per-keypoint descriptor dots at peak 1 ---
            rad = jnp.float32(2.0 * np.pi / 360.0)
            ca = jnp.cos(ori1 * rad)
            sa = jnp.sin(ori1 * rad)
            vrows = []
            for k in range(block_k):
                i = kb * block_k + k
                vrows.append(_desc_sample_wide(
                    patches[k], fxs[k], fys[k],
                    ca[k:k + 1, :], sa[k:k + 1, :], sc_ref[i],
                ))
            vals = jnp.concatenate(vrows, axis=0)          # [B, 1024]
            if phases <= 3:
                out_d1[:, :] = vals[:, 0:128] * vmask
                return
            # --- phase 4: batched descriptor post ---
            out_d1[:, :] = _desc_post_wide(vals, w2d_ref, wsp_ref, perm_ref) * vmask

            if phases <= 4:
                return
            # --- phase 5: gated second-peak descriptors (rare) ---
            for k in range(block_k):
                i = kb * block_k + k

                @pl.when((dup[k, 0] > 0) & (i < count_ref[0]))
                def _(k=k, i=i):
                    d2 = _descriptor_from_patch_wide(
                        patches[k], w2d_ref, wsp_ref, perm_ref, fxs[k],
                        fys[k],
                        jnp.cos(ori2[k:k + 1, :] * rad),
                        jnp.sin(ori2[k:k + 1, :] * rad), sc_ref[i],
                    )
                    out_d2[k, :] = d2[0, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("block_k", "interpret",
                                             "phases", "blk"))
def fused_orient_descriptor(img, x, y, scale, count=None, *,
                            block_k: int = 8, interpret: bool = False,
                            phases: int = 5, blk: bool = False):
    """Fused per-keypoint orientation + dual-peak descriptors.

    Returns (desc1 [K,128] raw, desc2 [K,128] raw, ori1 [K] deg,
    ori2 [K] deg, dup [K] bool).  desc2 rows are zero where dup is
    False.  Callers normalize with describe.normalize_descriptors.
    """
    K = x.shape[0]
    P = DESC_P
    if img.ndim == 3:
        # Pre-paged atlas (page_atlas in the producer program).
        assert blk, "3D (paged) atlas requires blk=True"
        nb, Hp, _ = img.shape
        Wp = nb * 128
    else:
        img = _pad_for_kernel(img, P)
        if blk:
            img = page_atlas(img, P)
            nb, Hp, _ = img.shape
            Wp = nb * 128
        else:
            Hp, Wp = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32) - P // 2 + 1, 0, max(Wp - P, 0))
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32) - P // 2 + 1, 0, max(Hp - P, 0))
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)
    inv2s2 = -1.0 / (2.0 * (1.5 * scale) ** 2)
    if count is None:
        count = jnp.asarray([K], jnp.int32)
    else:
        count = jnp.asarray(count, jnp.int32).reshape(1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((K, 128), jnp.float32),
        jax.ShapeDtypeStruct((K, 128), jnp.float32),
        jax.ShapeDtypeStruct((K, 8), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((block_k, 128), lambda kb: (kb, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k, 128), lambda kb: (kb, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k, 8), lambda kb: (kb, 0), memory_space=pltpu.VMEM),
    )
    d1, d2, aux = pl.pallas_call(
        _make_fused_kernel(block_k, phases=phases, blk=blk),
        out_shape=out_shapes,
        grid=(K // block_k,),
        in_specs=[smem] * 7 + [vmem] * 5,
        out_specs=out_specs,
        interpret=interpret,
    )(count, x0, y0, fx, fy, scale, inv2s2, img,
      jnp.asarray(_W2D_ROW), jnp.asarray(_WSP16), jnp.asarray(_PERM_A16),
      jnp.asarray(_smooth_peak_matrices()))
    return d1, d2, aux[:, 0], aux[:, 1], aux[:, 2] > 0.5


# NOTE (r1 perf investigation): a "v2" variant batching BK keypoints per
# program via a naturally-block-diagonal tent matrix ([BK*256, BK*48]
# with row offsets baked into coordinates) measured 7x SLOWER than the
# per-keypoint v1 above (76.8 ms vs 11.4 ms for 8192 keypoints) — the
# 8x zero-padding waste in the big matmuls and the larger iota/VPU
# builds outweigh the per-op overhead they amortize.  v1 runs at
# ~1.4 us/keypoint amortized; it was removed after benchmarking.


# ---------------------------------------------------------------------------
# Windowed-DMA fused kernel (r4).
#
# The r2/r3 fused kernel holds the whole octave ATLAS as one VMEM block
# and extracts each patch with a FULL-WIDTH lane rotate
# (pltpu.roll on [48, W]): at the up-scale capacity class the atlas is
# [4200, 2560] (43 MB — far beyond scoped VMEM) and every keypoint
# shuffles a [48, 2560] slab to isolate 40 columns.  Here the atlas
# stays in HBM; each keypoint asynchronously DMAs only a 128-aligned
# [48, 256] window into VMEM scratch (all block_k copies issued before
# the first is consumed, so the DMA engine runs ahead of the VPU), and
# the roll shrinks to 256 lanes.  HBM traffic: 49 KB/keypoint.
# ---------------------------------------------------------------------------

_WIN = 256  # DMA window width: 128 (alignment) + patch 40, padded to 2 regs


def _make_fused_kernel_win(block_k: int, phases: int = 5):
    """Windowed-DMA variant of _make_fused_kernel: identical math, but
    patches arrive via per-keypoint async copies from HBM instead of
    full-width rotates of a VMEM-resident atlas."""

    def kernel(count_ref, xa_ref, ya_ref, dxc_ref, fx_ref, fy_ref, sc_ref,
               i2_ref, img_hbm, w2d_ref, wsp_ref, perm_ref, smp_ref,
               out_d1, out_d2, out_aux, slab_ref, sem_ref):
        kb = pl.program_id(0)
        out_d1[:, :] = jnp.zeros_like(out_d1)
        out_d2[:, :] = jnp.zeros_like(out_d2)
        out_aux[:, :] = jnp.zeros_like(out_aux)

        @pl.when(kb * block_k < count_ref[0])
        def _():
            rows_n = DESC_P + 8

            def win_src(i):
                # Alignment facts Mosaic cannot infer from SMEM scalars:
                # ya is 8-aligned (sublane tile), xa 128-aligned (lane).
                ya = pl.multiple_of(ya_ref[i], 8)
                xa = pl.multiple_of(xa_ref[i], 128)
                return img_hbm.at[pl.ds(ya, rows_n), pl.ds(xa, _WIN)]

            # Issue every patch copy up front: the per-keypoint
            # orientation/descriptor dots of keypoint k hide the DMA
            # latency of keypoints k+1.. (the queue drains in order).
            for k in range(block_k):
                i = kb * block_k + k
                pltpu.make_async_copy(
                    win_src(i), slab_ref.at[k], sem_ref.at[k],
                ).start()

            # --- phase 1: per-keypoint patch crops + orientation dots ---
            patches = []
            fxs = []
            fys = []
            orows = []
            i2rows = []
            for k in range(block_k):
                i = kb * block_k + k
                pltpu.make_async_copy(
                    win_src(i), slab_ref.at[k], sem_ref.at[k],
                ).wait()
                win = slab_ref[k]
                rolled = pltpu.roll(
                    win, shift=jax.lax.rem(_WIN - dxc_ref[i], _WIN), axis=1
                )
                patches.append(rolled[:, :DESC_P])
                fxs.append(fx_ref[i])
                fys.append(fy_ref[i])
                orows.append(_orient_sample_wide(patches[k], fxs[k], fys[k],
                                                 DESC_P))
                i2rows.append(jnp.full((1, 1), i2_ref[i], jnp.float32))
            ovals = jnp.concatenate(orows, axis=0)         # [B, 484]
            # --- phase 2: batched orientation post + dual peaks ---
            h = _orient_post_wide(ovals, jnp.concatenate(i2rows, axis=0))
            hlr = jnp.dot(h, smp_ref[:, :],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)  # [B, 96]
            hs = hlr[:, 0:32]
            left = hlr[:, 32:64]
            right = hlr[:, 64:96]
            is_peak = (hs > left) & (hs >= right)
            pv = jnp.where(is_peak, hs, 0.0)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 32), 1
            ).astype(jnp.float32)
            m1 = jnp.max(pv, axis=1, keepdims=True)        # [B, 1]
            i1 = jnp.min(jnp.where(pv == m1, iota, 99.0), axis=1,
                         keepdims=True)
            pv2 = jnp.where(iota == i1, 0.0, pv)
            m2 = jnp.max(pv2, axis=1, keepdims=True)
            i2 = jnp.min(jnp.where(pv2 == m2, iota, 99.0), axis=1,
                         keepdims=True)
            ori1 = jnp.where(m1 > 0, _peak_angle(hs, i1), 0.0)  # [B, 1]
            ori2 = jnp.where(m2 > 0, _peak_angle(hs, i2), 0.0)
            dup = jnp.where((m2 > 0.8 * m1) & (m2 > 0), 1.0, 0.0)
            slot = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0) \
                + kb * block_k
            vmask = (slot < count_ref[0]).astype(jnp.float32)   # [B, 1]

            aux8 = jax.lax.broadcasted_iota(jnp.int32, (block_k, 8), 1)
            out_aux[:, :] = (
                jnp.where(aux8 == 0, ori1, 0.0)
                + jnp.where(aux8 == 1, ori2, 0.0)
                + jnp.where(aux8 == 2, dup, 0.0)
            ) * vmask

            # --- phase 3: per-keypoint descriptor dots at peak 1 ---
            rad = jnp.float32(2.0 * np.pi / 360.0)
            ca = jnp.cos(ori1 * rad)
            sa = jnp.sin(ori1 * rad)
            vrows = []
            for k in range(block_k):
                i = kb * block_k + k
                vrows.append(_desc_sample_wide(
                    patches[k], fxs[k], fys[k],
                    ca[k:k + 1, :], sa[k:k + 1, :], sc_ref[i],
                ))
            vals = jnp.concatenate(vrows, axis=0)          # [B, 1024]
            # --- phase 4: batched descriptor post ---
            out_d1[:, :] = _desc_post_wide(vals, w2d_ref, wsp_ref, perm_ref) * vmask

            if phases <= 4:
                return
            # --- phase 5: gated second-peak descriptors (rare) ---
            for k in range(block_k):
                i = kb * block_k + k

                @pl.when((dup[k, 0] > 0) & (i < count_ref[0]))
                def _(k=k, i=i):
                    d2 = _descriptor_from_patch_wide(
                        patches[k], w2d_ref, wsp_ref, perm_ref, fxs[k],
                        fys[k],
                        jnp.cos(ori2[k:k + 1, :] * rad),
                        jnp.sin(ori2[k:k + 1, :] * rad), sc_ref[i],
                    )
                    out_d2[k, :] = d2[0, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("block_k", "interpret",
                                             "src_vmem", "phases"))
def fused_orient_descriptor_win(img, x, y, scale, count=None, *,
                                block_k: int = 8, interpret: bool = False,
                                src_vmem: bool = False, phases: int = 5):
    """Windowed-DMA fused orientation + dual-peak descriptors.

    Same contract as fused_orient_descriptor; the atlas stays in HBM
    (src_vmem=False) or resident in VMEM (src_vmem=True) and each
    keypoint streams a [48, 256] window via async copy.  The VMEM
    source keeps the r3 kernel's atlas residency but swaps its
    full-width [48, W] lane rotate for a [48, 256] one — the rotate
    measured ~4.5 ms of the 9.5 ms kernel at up_t2.0 (phase0,
    tools/exp_sample_phase.py), scaling with atlas WIDTH, while a
    VMEM->VMEM window copy has none of the HBM DMA latency that made
    the r4 HBM-windowed variant SLOWER (10.11 vs 8.77 ms).
    """
    K = x.shape[0]
    P = DESC_P
    rows_n = P + 8
    # Same padded geometry as the VMEM-atlas kernel (identical border
    # clamps -> bit-identical outputs), then widen to the DMA window.
    img = _pad_for_kernel(img, P)
    if img.shape[1] < _WIN:
        img = jnp.pad(img, ((0, 0), (0, _WIN - img.shape[1])), mode="edge")
    Hp, Wp = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32) - P // 2 + 1, 0,
                  max(Wp - P, 0))
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32) - P // 2 + 1, 0,
                  max(Hp - P, 0))
    # 128-aligned window column / 8-aligned window row; the fractional
    # coordinates are relative to the post-roll patch origin (x0) and
    # the aligned row start (ya).
    xa = jnp.clip((x0 // 128) * 128, 0, max(Wp - _WIN, 0))
    dxc = x0 - xa
    ya = jnp.clip((y0 // 8) * 8, 0, max(Hp - rows_n, 0))
    fx = x - x0.astype(jnp.float32)
    fy = y - ya.astype(jnp.float32)
    inv2s2 = -1.0 / (2.0 * (1.5 * scale) ** 2)
    if count is None:
        count = jnp.asarray([K], jnp.int32)
    else:
        count = jnp.asarray(count, jnp.int32).reshape(1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((K, 128), jnp.float32),
        jax.ShapeDtypeStruct((K, 128), jnp.float32),
        jax.ShapeDtypeStruct((K, 8), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((block_k, 128), lambda kb: (kb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k, 128), lambda kb: (kb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k, 8), lambda kb: (kb, 0),
                     memory_space=pltpu.VMEM),
    )
    d1, d2, aux = pl.pallas_call(
        _make_fused_kernel_win(block_k, phases=phases),
        out_shape=out_shapes,
        grid=(K // block_k,),
        in_specs=[smem] * 8
        + [vmem if src_vmem else pl.BlockSpec(memory_space=pltpu.ANY)]
        + [vmem] * 4,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_k, rows_n, _WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((block_k,)),
        ],
        interpret=interpret,
    )(count, xa, ya, dxc, fx, fy, scale, inv2s2, img,
      jnp.asarray(_W2D_ROW), jnp.asarray(_WSP16), jnp.asarray(_PERM_A16),
      jnp.asarray(_smooth_peak_matrices()))
    return d1, d2, aux[:, 0], aux[:, 1], aux[:, 2] > 0.5
