"""Incremental multi-view SfM on the dino sequence (driver config 3)."""

import math
import pathlib

import numpy as np
import jax
import pytest

from sfm_tpu.config import SiftConfig, PipelineConfig, RansacConfig
from sfm_tpu.io.image_io import load_gray
from sfm_tpu.models import incremental

DINO = pathlib.Path("/root/reference/data/dino")


@pytest.mark.skipif(not DINO.exists(), reason="dino dataset not available")
def test_incremental_dino_sequence():
    imgs = [load_gray(DINO / f"viff.00{i}.ppm") for i in range(5)]
    h, w = imgs[0].shape
    K = np.array(
        [[2360.0, 0, w / 2], [0, 2360.0, h / 2], [0, 0, 1]], np.float32
    )
    cfg = PipelineConfig(
        sift=SiftConfig(max_pts_per_octave=512),
        ransac=RansacConfig(n_hyps=512, threshold=3e-6, chunk=128),
    )
    res = incremental.run_incremental(imgs, K, cfg, ba_iters=12)
    st = res.state
    assert np.array(st.pose_valid).all(), np.array(st.pose_valid)
    assert int(st.n_points) > 500
    costs = np.array(res.ba_costs)
    assert costs[-1] < costs[0]  # BA reduced the cost
    assert np.isfinite(costs).all()
    # Turntable: consecutive rotations similar magnitude, same axis sign.
    R = np.array(st.R)
    angles = []
    for i in range(1, len(imgs)):
        dR = R[i] @ R[i - 1].T
        angles.append(
            math.degrees(math.acos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        )
    assert all(1.0 < a < 15.0 for a in angles), angles
    # Reprojection: mean squared (normalized) -> < ~2.5 px at f=2360.
    err_px = math.sqrt(float(res.mean_reproj) / 2) * 2360.0
    assert err_px < 2.5, err_px
