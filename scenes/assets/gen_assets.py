#!/usr/bin/env python
"""Generate the mesh assets referenced by scenes/veach_mis.json.

The genuine Bitterli veach-mis scene ships its four plates as baked .wo3
mesh files; this port substitutes ONE reusable slab mesh (plate.ply,
positioned via per-primitive transforms — the loader ignores mesh scale
exactly like the reference, tungsten.cpp:294-318) plus a sphere knob for
the RoughSteel backdrop. Assets are ASCII PLY, written by this script so
the repo stays self-contained (no external geometry).

Run from the repo root: python scenes/assets/gen_assets.py
"""

import os

import numpy as np


def write_ply(path, positions, indices):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(positions)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(indices)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for p in positions:
            f.write(f"{p[0]:.6g} {p[1]:.6g} {p[2]:.6g}\n")
        for t in indices:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def slab(hx, hy, hz):
    """Axis-aligned box centered at origin, 12 triangles, CCW outward."""
    s = np.array(
        [[x, y, z] for x in (-hx, hx) for y in (-hy, hy) for z in (-hz, hz)],
        np.float32,
    )
    # faces of the unit box by corner index (bit order: x<<2 | y<<1 | z)
    quads = [
        (0, 1, 3, 2),  # -x
        (4, 6, 7, 5),  # +x
        (0, 4, 5, 1),  # -y
        (2, 3, 7, 6),  # +y
        (0, 2, 6, 4),  # -z
        (1, 5, 7, 3),  # +z
    ]
    tris = []
    for a, b, c, d in quads:
        tris += [(a, b, c), (a, c, d)]
    return s, np.asarray(tris, np.int32)


def sphere(radius, n_theta=24, n_phi=48):
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pos = np.stack(
        [
            radius * np.sin(T) * np.cos(P),
            radius * np.cos(T),
            radius * np.sin(T) * np.sin(P),
        ],
        -1,
    ).reshape(-1, 3)
    tris = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            if i > 0:
                tris.append((a, b, c))
            if i < n_theta - 1:
                tris.append((b, d, c))
    return pos.astype(np.float32), np.asarray(tris, np.int32)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    p, t = slab(5.0, 0.025, 0.8)
    write_ply(os.path.join(here, "plate.ply"), p, t)
    p, t = sphere(1.0)
    write_ply(os.path.join(here, "knob.ply"), p, t)
    print("wrote plate.ply, knob.ply")


if __name__ == "__main__":
    main()
