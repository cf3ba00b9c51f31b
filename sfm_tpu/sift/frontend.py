"""SIFT frontend orchestration: pyramid -> detect -> orient -> describe.

TPU-native equivalent of the reference's ExtractSift host loop
(reference CudaSift/cudaSiftH.cu:72-167): the recursive octave descent
becomes a static Python loop over per-octave static shapes, the global
SiftPoint array + device counters become fixed-capacity SoA arrays with
validity masks, and the whole frontend jits into one XLA program per
image geometry.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.config import SiftConfig
from sfm_tpu.sift import pyramid, detect as detect_mod, orient, describe


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


def _extract_octave(oct_: pyramid.Octave, cfg: SiftConfig, octave_index: int):
    use_pallas = _use_pallas(cfg)
    det = detect_mod.detect(oct_.dog, cfg, oct_.subsampling)
    ori1, ori2, valid2 = orient.assign_orientations(
        oct_.base, det.x, det.y, det.scale, det.valid,
        duplicates=cfg.orientation_duplicates,
        use_pallas=use_pallas,
    )
    # Primary + duplicate slots (fixed second slot replaces the
    # reference's atomicInc append of split-orientation keypoints).
    x = jnp.concatenate([det.x, det.x])
    y = jnp.concatenate([det.y, det.y])
    sc = jnp.concatenate([det.scale, det.scale])
    sharp = jnp.concatenate([det.sharpness, det.sharpness])
    edge = jnp.concatenate([det.edgeness, det.edgeness])
    ori = jnp.concatenate([ori1, ori2])
    valid = jnp.concatenate([det.valid, valid2])
    desc = describe.extract_descriptors(
        oct_.base, x, y, sc, ori, use_pallas=use_pallas
    )
    desc = desc * valid[:, None]
    sub = oct_.subsampling
    kp = Keypoints(
        x=x * sub,
        y=y * sub,
        scale=sc * sub,
        sharpness=sharp,
        edgeness=edge,
        orientation=ori,
        octave=jnp.full(x.shape, octave_index, jnp.int32),
        valid=valid,
    )
    return kp, desc


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_sift(img, cfg: SiftConfig = SiftConfig()) -> SiftResult:
    """Full SIFT extraction on an [H, W] f32 image (0..255 scale).

    Returns fixed-capacity keypoints+descriptors with validity masks;
    capacity = num_octaves * 2 * max_pts_per_octave.
    """
    octaves = pyramid.build_pyramid(img, cfg)
    kps, descs = [], []
    for o, oct_ in enumerate(octaves):
        kp, d = _extract_octave(oct_, cfg, o)
        kps.append(kp)
        descs.append(d)
    kp = Keypoints(*[jnp.concatenate(parts) for parts in zip(*kps)])
    desc = jnp.concatenate(descs)
    if cfg.up_scale:
        # Back to input-image pixels (reference RescalePositions(0.5),
        # cudaSiftH.cu:131).
        kp = kp._replace(x=kp.x * 0.5, y=kp.y * 0.5, scale=kp.scale * 0.5)
    return SiftResult(keypoints=kp, descriptors=desc)
