#!/usr/bin/env python
"""Cross-validation against the reference CPU renderer.

Builds the reference's CPU path tracer headless (sources read-only from
REF_DIR, artifacts in /tmp), renders a shared .tin scene with both
renderers at equal spp, and reports region-level agreement — the
"allclose at equal spp" tolerance-based parity target (SURVEY.md §4:
the reference CPU renderer is the de-facto oracle).

Measured 2026-08-16:
  simple.tin (512 spp, 128x64): sky -0.07%, plane -1.2%, global +2.9%
      (concentrated in the emissive-sphere silhouette: 225 vs 233 edge
      pixels above threshold — reconstruction-filter AA detail)
  brain.obj scene (16 spp, 256x256): mean ratio 0.9961, per-ray hit t
      agrees to ~1e-3 (fast-math)
  cornell (16 spp, unscaled light): mean ratio 0.9944

Known intentional deviation: the reference's area-light pdf uses
world_area = local_area * s (intersection.h:848, and ignores scale for
spheres entirely) while uniform local sampling maps with an s^2 area
Jacobian — the reference therefore over-brightens scaled mesh lights by
1/s (verified: 4.0x at scale 0.25). This framework uses the correct s^2
(render/lights.py), so scenes with scaled emissive meshes intentionally
differ; compare with pre-scaled light geometry.

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python benchmarks/cross_validate.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys

import numpy as np

REF_DIR = os.environ.get("TINSEL_REFERENCE", "/root/reference")
BUILD_DIR = "/tmp/tinsel_refbuild"

HARNESS = r"""
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include "maths.h"
#include "render.h"
#include "scene.h"
#include "loader.h"
#include "pfm.h"
int main(int argc, char** argv) {
    if (argc < 6) { printf("usage: refcpu scene.tin out.pfm spp w h\n"); return 1; }
    Scene* scene = new Scene();
    Camera camera;
    Options options;
    options.width = atoi(argv[4]); options.height = atoi(argv[5]);
    options.filter = Filter(eFilterGaussian, 0.75f, 1.0f);
    options.exposure = 1.0f; options.limit = 1.5f; options.clamp = FLT_MAX;
    options.maxDepth = 4; options.mode = ePathTrace;
    int spp = atoi(argv[3]);
    options.maxSamples = spp;
    if (!LoadTin(argv[1], scene, &camera, &options)) return 2;
    options.width = atoi(argv[4]); options.height = atoi(argv[5]);
    if (argc > 6) options.maxDepth = atoi(argv[6]);  // depth-resolved runs
    scene->Build();
    Renderer* r = CreateCpuRenderer(scene);
    r->Init(options.width, options.height);
    std::vector<Color> px(options.width * options.height);
    for (int i = 0; i < spp; ++i) r->Render(camera, options, px.data());
    std::vector<float> rgb(options.width * options.height * 3);
    for (size_t i = 0; i < px.size(); ++i) {
        float w = px[i].w > 0.0f ? px[i].w : 1.0f;
        rgb[i*3+0] = px[i].x / w; rgb[i*3+1] = px[i].y / w; rgb[i*3+2] = px[i].z / w;
    }
    PfmImage img; img.width = options.width; img.height = options.height;
    img.depth = 1; img.data = rgb.data();
    PfmSave(argv[2], img);
    return 0;
}
"""


def build_reference() -> str:
    exe = os.path.join(BUILD_DIR, "refcpu")
    if os.path.exists(exe):
        return exe
    os.makedirs(BUILD_DIR, exist_ok=True)
    src = os.path.join(BUILD_DIR, "headless.cpp")
    with open(src, "w") as f:
        f.write(HARNESS)
    units = [src] + [
        os.path.join(REF_DIR, "src", c)
        for c in ("render.cpp", "loader.cpp", "scene.cpp", "mesh.cpp",
                  "pfm.cpp", "tga.cpp", "perlin.cpp", "platform.cpp")
    ]
    subprocess.run(
        ["g++", "-O3", "-std=c++11", "-ffast-math", "-include", "cstring",
         "-I", os.path.join(REF_DIR, "src"), *units, "-o", exe],
        check=True,
    )
    return exe


def main(scene_path="scenes/simple.tin", spp=256, width=128, height=64):
    if not os.path.isdir(REF_DIR):
        print(json.dumps({"error": f"reference not found at {REF_DIR}"}))
        return 1
    exe = build_reference()
    pfm = os.path.join(BUILD_DIR, "ref.pfm")
    subprocess.run([exe, scene_path, pfm, str(spp), str(width), str(height)],
                   check=True, capture_output=True)

    from tinsel_tpu.io.hdr import load_pfm
    from tinsel_tpu.scene.loaders.tin import load_tin
    from tinsel_tpu.render.renderer import render

    ref = load_pfm(pfm)[::-1]  # reference writes bottom-up scanlines
    sc = load_tin(scene_path)
    opts = dataclasses.replace(sc.options, width=width, height=height)
    acc = np.asarray(render(sc, spp=spp, options=opts))
    img = acc[..., :3] / np.maximum(acc[..., 3:4], 1e-7)

    rel_mae = float(np.abs(img - ref).mean() / max(ref.mean(), 1e-9))
    out = {
        "scene": scene_path,
        "spp": spp,
        "ref_mean": round(float(ref.mean()), 5),
        "ours_mean": round(float(img.mean()), 5),
        "mean_ratio": round(float(img.mean() / ref.mean()), 4),
        "rel_pixel_mae": round(rel_mae, 4),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:] or [])))
