"""SIFT frontend orchestration: pyramid -> detect -> orient -> describe.

TPU-native equivalent of the reference's ExtractSift host loop
(reference CudaSift/cudaSiftH.cu:72-167).  Architecture (r1, perf
pass 2):

  * detection runs densely per octave (static shapes);
  * all octave base images are packed into ONE vertical atlas with
    edge-replicated guard bands, so orientation and descriptor
    sampling for EVERY keypoint of every octave run as a single
    Pallas kernel launch each (10 launches -> 2);
  * keypoints are globally compacted by validity so kernel work
    scales with the real keypoint count, not the slot capacity;
  * the global SiftPoint array + device counters of the reference
    become fixed-capacity SoA arrays with validity masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import SiftConfig
from sfm_tpu.ops.compact import compaction_order
from sfm_tpu.sift import pyramid, detect as detect_mod, orient, describe

_GUARD = 48  # vertical guard rows between octaves (>= descriptor patch)


class Keypoints(NamedTuple):
    """SoA keypoint set (replaces the reference's AoS SiftPoint,
    CudaSift/cudaSift.h:6-22).  Coordinates are in input-image pixels."""

    x: jnp.ndarray            # [K]
    y: jnp.ndarray            # [K]
    scale: jnp.ndarray        # [K]
    sharpness: jnp.ndarray    # [K]
    edgeness: jnp.ndarray     # [K]
    orientation: jnp.ndarray  # [K] degrees
    octave: jnp.ndarray       # [K] int32
    valid: jnp.ndarray        # [K] bool

    @property
    def capacity(self):
        return self.x.shape[0]

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


class SiftResult(NamedTuple):
    keypoints: Keypoints
    descriptors: jnp.ndarray  # [K, 128]


def _use_pallas(cfg: SiftConfig) -> bool:
    if cfg.use_pallas is not None:
        return cfg.use_pallas
    return jax.default_backend() != "cpu"


def _use_fused_detect(cfg: SiftConfig) -> bool:
    if cfg.fused_detect is not None:
        return cfg.fused_detect
    # Auto: on for TPU (r3 device A/B, tools/exp_detect.py fused vs
    # full — up-scale capacity class 38.2 -> 11.1 ms at exactly equal
    # detection counts; dino config 0.73 -> <0.1 ms).  CPU keeps the
    # XLA dense path (interpret-mode kernels are test-only).
    return jax.default_backend() != "cpu"


def _use_pallas_pyramid(cfg: SiftConfig) -> bool:
    if cfg.pyramid_pallas is not None:
        return cfg.pyramid_pallas
    # Auto: whenever the fused detect path runs on TPU — the banded
    # matmul base chain is the remaining FLOP-heavy piece there (r4
    # device profile, NOTES_R4).  CPU keeps the matmul/conv path;
    # interpret-mode parity is test-only.
    return _use_fused_detect(cfg) and jax.default_backend() != "cpu"


def _sample_mode(cfg: SiftConfig):
    """Resolved sampling-kernel mode: False (full-width roll), True/
    "hbm" (HBM windowed DMA), "vmem" (VMEM windowed DMA), or "blk"
    (paged atlas).  Auto (None) = "blk" on TPU: device A/B at up_t2.0
    (tools/exp_sample_win.py, r4) measured the sample stage at
    9.60 (roll) / 11.05 (hbm window) / 7.79 ms (blk) with descriptor
    agreement 1.0; CPU keeps the roll path (interpret parity tests
    cover blk separately)."""
    if cfg.sample_window is not None:
        return cfg.sample_window
    return "blk" if jax.default_backend() != "cpu" else False


def _build_atlas(bases):
    """Pack octave base images vertically with edge-replicated guards.

    Returns (atlas [Ha, W0], row_offsets list).  Guards prevent a
    patch at one octave's border from reading another octave's pixels;
    horizontal padding replicates each octave's right edge.
    """
    W0 = bases[0].shape[1]
    rows = []
    offsets = []
    y = 0
    for base in bases:
        H, W = base.shape
        padded = jnp.pad(
            base, ((_GUARD, _GUARD), (0, W0 - W)), mode="edge"
        )
        offsets.append(y + _GUARD)
        rows.append(padded)
        y += H + 2 * _GUARD
    atlas = jnp.concatenate(rows, axis=0)
    # Materialize the atlas once instead of letting XLA fuse the pad /
    # concat chain into the sampling kernels' input.
    atlas = jax.lax.optimization_barrier(atlas)
    return atlas, offsets


def _sample_orientations(atlas, x, y, scale, valid, cfg, use_pallas):
    """[K, 32] histograms; inputs must already be validity-compacted."""
    if use_pallas:
        from sfm_tpu.ops import pallas_sample

        return pallas_sample.orientation_histogram_sample(
            atlas, x, y, scale, count=jnp.sum(valid, dtype=jnp.int32)
        )
    return orient.orientation_histograms(atlas, x, y, scale)


def _sample_descriptors(atlas, x, y, scale, ori, valid, use_pallas):
    """[K, 128] descriptors; inputs must already be validity-compacted."""
    if use_pallas:
        from sfm_tpu.ops import pallas_sample

        raw = pallas_sample.descriptor_sample(
            atlas, x, y, scale, ori, count=jnp.sum(valid, dtype=jnp.int32)
        )
        return describe.normalize_descriptors(raw)
    return describe.extract_descriptors(atlas, x, y, scale, ori)


def atlas_layout(shape, cfg: SiftConfig):
    """Static atlas layout for an input of `shape`: (offsets, subs)."""
    H, W = shape
    if cfg.up_scale:
        H, W = 2 * H, 2 * W
    offsets = []
    subs = []
    y = 0
    sub = 1.0
    for _ in range(cfg.num_octaves):
        offsets.append(y + _GUARD)
        subs.append(sub)
        y += H + 2 * _GUARD
        H, W = H // 2, W // 2
        sub *= 2.0
    return tuple(offsets), tuple(subs)


def _octave_cfg(cfg: SiftConfig, o: int) -> SiftConfig:
    """Per-octave detection config: applies cfg.octave_caps[o] as the
    slot cap when set (detection counts fall ~2x per octave; a uniform
    cap makes deep octaves pay top-k/gather/sample cost for slots they
    never fill — SiftConfig.octave_caps)."""
    if cfg.octave_caps is None:
        return cfg
    if len(cfg.octave_caps) != cfg.num_octaves:
        raise ValueError(
            f"octave_caps must have num_octaves={cfg.num_octaves} "
            f"entries; got {len(cfg.octave_caps)}"
        )
    import dataclasses

    return dataclasses.replace(
        cfg, max_pts_per_octave=int(cfg.octave_caps[o])
    )


def _detect_impl(img, cfg: SiftConfig, mats):
    """Per-octave dense stage (pyramid + NMS); detections shifted into
    atlas-frame coordinates for the shared sampling kernels.

    A fully atlas-fused variant (ONE blur bank + ONE NMS over the
    packed atlas) was built and A/B-tested in r1: it benched SLOWER on
    the v5e backend (81 vs 61 ms/pair) and diverged semantically (deep
    octaves shared one blur bank, no lowest_scale gate), so the fork
    was removed in r2 — one detection path only.
    """
    if _use_fused_detect(cfg):
        # Fused-Pallas dense stage: only the octave BASES are computed
        # in XLA (lowpass + decimation); blur bank, DoG, NMS, and
        # refinement all run inside ops/pallas_detect.py per octave,
        # so the DoG volume (and the per-octave Bc/Br banded matrices)
        # never exist in HBM.
        interp = jax.default_backend() == "cpu"
        if _use_pallas_pyramid(cfg):
            bases = pyramid.base_chain_pallas(img, cfg, interpret=interp)
        else:
            bases = pyramid.base_chain(img, cfg, mats if mats else None)
        atlas, offsets = _build_atlas(bases)
        dets = []
        sub = 1.0
        for o, off in enumerate(offsets):
            taps = pyramid.octave_kernel_bank(cfg, o)
            d = detect_mod.detect_fused(bases[o], taps, _octave_cfg(cfg, o),
                                        sub, interpret=interp)
            dets.append(d._replace(y=d.y + off))
            sub *= 2.0
        if _sample_mode(cfg) == "blk" and _use_pallas(cfg):
            # Page the atlas HERE, in the producer program: a >=16 MB
            # Pallas VMEM operand compiles only as a program PARAMETER
            # of the sampling program (pallas_sample.page_atlas).
            from sfm_tpu.ops import pallas_sample

            atlas = pallas_sample.page_atlas(atlas)
        return atlas, dets
    octaves = pyramid.build_pyramid(img, cfg, mats if mats else None)
    atlas, offsets = _build_atlas([o.base for o in octaves])
    dets = []
    for o, (oct_, off) in enumerate(zip(octaves, offsets)):
        d = detect_mod.detect(oct_.dog, _octave_cfg(cfg, o),
                              oct_.subsampling)
        dets.append(d._replace(y=d.y + off))
    return atlas, dets


@functools.partial(jax.jit, static_argnames=("cfg",))
def _detect_stage(img, cfg: SiftConfig, mats=()):
    """Dense stage: pyramid + detection + atlas, one XLA program.

    mats: per-octave banded blur matrices as device-array ARGUMENTS
    (pyramid.pyramid_band_mats) — () selects the grouped-conv path."""
    return _detect_impl(img, cfg, mats)


def _mats_for(shape, cfg: SiftConfig):
    if not pyramid.use_blur_matmul(cfg):
        return ()
    if _use_fused_detect(cfg):
        if _use_pallas_pyramid(cfg):
            # The Pallas base chain needs no matrices at all.
            return ()
        # The fused kernel computes the blur bank itself; only the
        # lowpass + decimation matrices are needed (the per-octave
        # Bc/Br banded matrices are ~450 MB at the up-scale capacity
        # class — never built on this path).
        return pyramid.pyramid_decim_mats(tuple(shape), cfg)
    return pyramid.pyramid_band_mats(tuple(shape), cfg)


def extract_sift(img, cfg: SiftConfig = SiftConfig()) -> SiftResult:
    """Full SIFT extraction on an [H, W] f32 image (0..255 scale).

    Returns fixed-capacity keypoints+descriptors with validity masks;
    capacity = num_octaves * 2 * max_pts_per_octave.

    Deliberately TWO jitted programs (dense detection, then keypoint
    sampling): fusing them into one lets XLA make pathological
    scheduling choices around the top-k / gather boundary (measured
    +30 ms on a dino image in r1); the extra dispatch pipelines away.
    """
    use_pallas = _use_pallas(cfg)
    offsets, subs = atlas_layout(img.shape, cfg)
    atlas, dets = _detect_stage(img, cfg, _mats_for(img.shape, cfg))
    return _sample_stage(atlas, offsets, subs, dets, cfg, use_pallas)


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas", "offsets", "subs"))
def _sample_stage(atlas, offsets, subs, dets, cfg: SiftConfig,
                  use_pallas: bool) -> SiftResult:

    # Concatenate detections in atlas coordinates and compact valid
    # ones to the front ONCE — kernels then process a count-gated
    # prefix, and outputs stay in compacted order (only the small [K]
    # metadata arrays are ever permuted, never the [K, 128] block).
    x_a = jnp.concatenate([d.x for d in dets])
    y_a = jnp.concatenate([d.y for d in dets])  # already atlas-frame
    sc_a = jnp.concatenate([d.scale for d in dets])
    sharp_a = jnp.concatenate([d.sharpness for d in dets])
    edge_a = jnp.concatenate([d.edgeness for d in dets])
    valid_a = jnp.concatenate([d.valid for d in dets])
    oct_a = jnp.concatenate(
        [jnp.full(d.x.shape, i, jnp.int32) for i, d in enumerate(dets)]
    )
    sub_a = jnp.concatenate(
        [jnp.full(d.x.shape, s, jnp.float32) for d, s in zip(dets, subs)]
    )
    off_a = jnp.concatenate(
        [jnp.full(d.x.shape, off, jnp.float32) for d, off in zip(dets, offsets)]
    )

    # Cap the slot count the sampling kernels see: per-octave detection
    # capacity sums to num_octaves * max_pts_per_octave slots, but real
    # images fill a fraction of them, and the fused kernel's grid (and
    # every downstream [K,128] matmul) scales with SLOTS, not with
    # keypoints.  When the cap binds, keep the GLOBALLY strongest
    # detections (|interpolated DoG response|) across octaves — a plain
    # front-compaction would drop whole coarse octaves (concat order).
    cap = cfg.sample_cap
    K_slots = valid_a.shape[0]
    if cap and cap < K_slots and K_slots <= 16384:
        # Exact global strength ranking: at quality-config sizes the
        # cap BINDS (dino: ~2.5k detections in 5120 slots with
        # cap 2560), so the kept SET must be the globally strongest,
        # and the sort is cheap at this n.
        strength = jnp.where(valid_a, jnp.abs(sharp_a), -1.0)
        _, order = jax.lax.top_k(strength, cap)
        order = order.astype(jnp.int32)
    elif cap and cap < K_slots:
        # Capacity-class sizes (up-scale: 40960 slots): the exact
        # top-k is a 2-3 ms sort, and the cap does NOT bind there
        # (~10k detections in 16384 slots), so only the ORDER matters.
        # Each octave's detections are already strength-sorted
        # (select_from_maps top-k, valids as a prefix), so a STATIC
        # rank-major interleave (rank r of every octave before rank
        # r+1 of any) + an O(n) valid compaction gives a near-sorted
        # strong-first order without any sort; if the cap ever did
        # bind, the kept set is each octave's strongest prefix
        # (octave-balanced) rather than globally strongest.
        n_oct = len(dets)
        per = K_slots // n_oct
        j = np.arange(K_slots)
        perm = jnp.asarray((j % n_oct) * per + j // n_oct, jnp.int32)
        order = perm[compaction_order(valid_a[perm])[:cap]]
    else:
        order = compaction_order(valid_a)
    # ONE packed row gather instead of 9 per-array gathers: the slot
    # metadata rides as [K, 9] rows so the reorder fetches 36-byte
    # contiguous rows instead of 9 scalar streams (the select/sample
    # XLA glue measured 1.57 ms at the up-scale class, r5 phase-1).
    meta = jnp.stack(
        [x_a, y_a, sc_a, sharp_a, edge_a,
         valid_a.astype(jnp.float32), oct_a.astype(jnp.float32),
         sub_a, off_a], axis=1,
    )[order]
    x_a, y_a, sc_a, sharp_a, edge_a = (meta[:, i] for i in range(5))
    valid_a = meta[:, 5] > 0.5
    oct_a = meta[:, 6].astype(jnp.int32)
    sub_a, off_a = meta[:, 7], meta[:, 8]

    if use_pallas:
        # Fused kernel: one patch load per keypoint serves orientation
        # histogram, dual-peak finding, and both descriptors; the
        # duplicate slots land in a fixed second half (no second
        # compaction, no inter-kernel XLA glue).
        from sfm_tpu.ops import pallas_sample

        # interpret mode when the backend is CPU (tests force
        # use_pallas=True there); Mosaic-compiled on TPU.
        # sample_window auto = OFF: the windowed-DMA kernel measured
        # SLOWER on device (10.11 vs 8.77 ms at up_t2.0, r4 A/B via
        # tools/exp_sample_win.py) — the kernel is VPU-bound on the
        # per-keypoint tent builds, not the full-width rotate.
        interp = jax.default_backend() == "cpu"
        # Duplicate-descriptor split (r4): the fused kernel's gated
        # per-keypoint second-peak branch runs in narrow [1, S] layout
        # and measured 2.0 ms at up_t2.0 for ~12% duplicates (phase4
        # vs 5, tools/exp_sample_phase.py); splitting compacts the
        # duplicates and batches them wide through descriptor_sample.
        dup_split = (cfg.dup_split if cfg.dup_split is not None
                     else cfg.orientation_duplicates)
        phases = cfg.sample_phases
        if phases == 5 and dup_split:
            phases = 4
        blk = atlas.ndim == 3
        mode = _sample_mode(cfg)
        bk = cfg.sample_block_k
        if x_a.shape[0] % bk:
            bk = 8  # capacity not divisible by the configured block
        if mode == "blk":
            fused_fn = functools.partial(
                pallas_sample.fused_orient_descriptor, blk=blk)
        elif mode:
            fused_fn = functools.partial(
                pallas_sample.fused_orient_descriptor_win,
                src_vmem=(mode == "vmem"),
            )
        else:
            fused_fn = pallas_sample.fused_orient_descriptor
        kw = {"phases": phases} if phases != 5 else {}
        d1, d2, ori1, ori2, dup = fused_fn(
            atlas, x_a, y_a, sc_a, count=jnp.sum(valid_a, dtype=jnp.int32),
            interpret=interp, block_k=bk, **kw,
        )
        valid2 = dup & valid_a
        if not cfg.orientation_duplicates:
            valid2 = jnp.zeros_like(valid2)
        elif dup_split and cfg.sample_phases == 5:
            order_d = compaction_order(valid2)
            d2_raw = pallas_sample.descriptor_sample(
                atlas, x_a[order_d], y_a[order_d], sc_a[order_d],
                ori2[order_d], count=jnp.sum(valid2, dtype=jnp.int32),
                interpret=interp, blk=blk, wide=True, block_k=bk,
            )
            d2 = jnp.zeros_like(d1).at[order_d].set(d2_raw)
        desc = describe.normalize_descriptors(jnp.concatenate([d1, d2]))
        x2 = jnp.concatenate([x_a, x_a])
        y2 = jnp.concatenate([y_a, y_a])
        sc2 = jnp.concatenate([sc_a, sc_a])
        sharp2 = jnp.concatenate([sharp_a, sharp_a])
        edge2 = jnp.concatenate([edge_a, edge_a])
        ori_2 = jnp.concatenate([ori1, ori2])
        valid_2 = jnp.concatenate([valid_a, valid2])
        oct_2 = jnp.concatenate([oct_a, oct_a])
        sub_2 = jnp.concatenate([sub_a, sub_a])
        off_2 = jnp.concatenate([off_a, off_a])
        desc = desc * valid_2[:, None]
    else:
        h = _sample_orientations(atlas, x_a, y_a, sc_a, valid_a, cfg, False)
        ori1, ori2, valid2 = orient.orientations_from_histograms(
            h, valid_a, duplicates=cfg.orientation_duplicates
        )
        valid2 = valid2 & valid_a

        # Primary + duplicate slots (fixed second slot replaces the
        # reference's atomicInc append of split-orientation keypoints).
        # Duplicates are rare, so compact the combined set once more.
        x2 = jnp.concatenate([x_a, x_a])
        y2 = jnp.concatenate([y_a, y_a])
        sc2 = jnp.concatenate([sc_a, sc_a])
        sharp2 = jnp.concatenate([sharp_a, sharp_a])
        edge2 = jnp.concatenate([edge_a, edge_a])
        ori_2 = jnp.concatenate([ori1, ori2])
        valid_2 = jnp.concatenate([valid_a, valid2])
        oct_2 = jnp.concatenate([oct_a, oct_a])
        sub_2 = jnp.concatenate([sub_a, sub_a])
        off_2 = jnp.concatenate([off_a, off_a])

        order2 = compaction_order(valid_2)
        x2, y2, sc2, sharp2, edge2, ori_2, valid_2, oct_2, sub_2, off_2 = (
            a[order2]
            for a in (x2, y2, sc2, sharp2, edge2, ori_2, valid_2, oct_2, sub_2, off_2)
        )

        desc = _sample_descriptors(atlas, x2, y2, sc2, ori_2, valid_2, False)
        desc = desc * valid_2[:, None]

    kp = Keypoints(
        x=x2 * sub_2,
        y=(y2 - off_2) * sub_2,
        scale=sc2 * sub_2,
        sharpness=sharp2,
        edgeness=edge2,
        orientation=ori_2,
        octave=oct_2,
        valid=valid_2,
    )
    if cfg.up_scale:
        # Back to input-image pixels (reference RescalePositions(0.5),
        # cudaSiftH.cu:131).
        kp = kp._replace(x=kp.x * 0.5, y=kp.y * 0.5, scale=kp.scale * 0.5)
    return SiftResult(keypoints=kp, descriptors=desc)
