"""Offline point-cloud renderer (PLY -> PNG).

Headless replacement for the reference's interactive OpenGL viewer
(reference src/main.cpp:318-352, shaders/boid.*.glsl): renders the
reconstructed cloud from an orbiting viewpoint to a PNG, for the same
visual check the reference's README screenshots provide.

Usage: python tools/render_ply.py cloud.ply out.png [--elev 20 --azim 45]
"""

import argparse
import struct
import sys

import numpy as np


def load_ply(path):
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "replace").strip()
            header.append(line)
            if line == "end_header":
                break
        n = 0
        props = []
        fmt_binary = any("binary_little_endian" in h for h in header)
        for h in header:
            if h.startswith("element vertex"):
                n = int(h.split()[-1])
            elif h.startswith("property"):
                props.append(h.split()[-1])
        pts = np.zeros((n, 3), np.float32)
        if fmt_binary:
            has_color = "red" in props
            rec = struct.Struct("<fff" + ("BBB" if has_color else ""))
            for i in range(n):
                vals = rec.unpack(f.read(rec.size))
                pts[i] = vals[:3]
        else:
            for i in range(n):
                vals = f.readline().split()
                pts[i] = [float(v) for v in vals[:3]]
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ply")
    ap.add_argument("out")
    ap.add_argument("--elev", type=float, default=20.0)
    ap.add_argument("--azim", type=float, default=45.0)
    ap.add_argument("--clip-pct", type=float, default=98.0,
                    help="percentile distance clip for outliers")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = load_ply(args.ply)
    if pts.shape[0] == 0:
        print("empty cloud", file=sys.stderr)
        return 1
    c = np.median(pts, axis=0)
    d = np.linalg.norm(pts - c, axis=1)
    keep = d <= np.percentile(d, args.clip_pct)
    pts = pts[keep]

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1.0, c=pts[:, 2],
               cmap="viridis", linewidths=0)
    ax.view_init(elev=args.elev, azim=args.azim)
    ax.set_box_aspect((1, 1, 1))
    ax.set_title(f"{args.ply}  ({pts.shape[0]} pts)")
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out} ({pts.shape[0]} points)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
