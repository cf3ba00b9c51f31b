"""CLI driver test: the reference's main() equivalent (src/main.cpp:240).

Runs `reconstruct` in-process (conftest already forces CPU) on cropped
dino frames and asserts the PLY / metrics artifacts it writes.
"""

import json
import pathlib

import numpy as np
import pytest

from sfm_tpu import cli
from sfm_tpu.io.image_io import load_gray

DINO = pathlib.Path("/root/reference/data/dino")


@pytest.mark.skipif(not DINO.exists(), reason="dino dataset not available")
def test_cli_two_view(tmp_path):
    # Crop to keep the compile small; write the crops as binary PGMs the
    # loader accepts.
    paths = []
    for i in range(2):
        img = np.asarray(load_gray(DINO / f"viff.{i:03d}.ppm"))[40:360, 100:612]
        u8 = np.clip(img, 0, 255).astype(np.uint8)
        p = tmp_path / f"crop{i}.pgm"
        h, w = u8.shape
        p.write_bytes(f"P5\n{w} {h}\n255\n".encode() + u8.tobytes())
        paths.append(str(p))

    out = tmp_path / "cloud.ply"
    met = tmp_path / "metrics.json"
    rc = cli.main([
        "reconstruct", *paths,
        "--focal", "2360",
        "--octaves", "4", "--max-pts", "512", "--ransac-hyps", "512",
        "--ransac-thresh", "3e-6",
        "--out", str(out), "--metrics", str(met),
    ])
    assert rc == 0
    m = json.loads(met.read_text())
    assert m["mode"] == "two_view"
    assert m["num_matches"] > 200, m
    assert m["num_points"] > 50, m
    assert m["mean_reproj_px"] < 2.0, m
    head = out.read_bytes()[:200]
    assert head.startswith(b"ply")
    assert f"element vertex {m['num_points']}".encode() in head
