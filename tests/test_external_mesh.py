"""End-to-end external-mesh golden: a PLY generated on disk flows through
import -> normalize -> build -> .npz cache -> pool -> instanced traversal,
and the render is identical from a COLD and a WARM cache (the round-1 cache
bug corrupted exactly this second-process path). The golden asserts against
a committed image like tests/test_goldens.py."""

import dataclasses
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

SCENE_TIN = """
options
{{
    width 32
    height 32
    maxDepth 3
}}
camera
{{
    position 0 1.2 3.5
    rotation 0 0 0 1
    fov 40
}}
sky
{{
    horizonColor 0.1 0.1 0.12
    zenithColor 0.02 0.02 0.05
}}
material white
{{
    color 0.75 0.75 0.75
    roughness 0.6
}}
material glow
{{
    emission 10 9 7
    color 0 0 0
}}
mesh lightq
{{
    verts 4
    -0.5 0  0.5
     0.5 0  0.5
     0.5 0 -0.5
    -0.5 0 -0.5
    tris 2
    0 2 1
    0 3 2
}}
primitive
{{
    type plane
    plane 0 1 0 0
    material white
}}
primitive
{{
    type mesh
    mesh lightq
    material glow
    position 0 2.5 0
    lightSamples 1
}}
primitive
{{
    type mesh
    mesh {ply_name}
    material white
    position -0.55 0.9 0
    scale 0.9
}}
primitive
{{
    type mesh
    mesh {ply_name}
    material white
    position 0.55 0.6 0
    scale 0.6
}}
"""


def _write_assets(dirpath) -> str:
    from tinsel_tpu.scene.loaders.mesh_io import save_ply
    from tinsel_tpu.scene.presets import sphere_mesh

    m = sphere_mesh(1.0, 12, 24)  # deterministic geometry
    ply = os.path.join(dirpath, "blob.ply")
    save_ply(ply, m.positions, m.indices)
    tin = os.path.join(dirpath, "extmesh.tin")
    with open(tin, "w") as f:
        f.write(SCENE_TIN.format(ply_name="blob.ply"))
    return tin


def _render(tin_path):
    from tinsel_tpu.render.renderer import render
    from tinsel_tpu.scene.loaders.tin import load_tin

    scene = load_tin(tin_path)
    opts = dataclasses.replace(scene.options, width=32, height=32)
    acc = np.asarray(render(scene, spp=8, seed=42, options=opts))
    return acc[..., :3] / np.maximum(acc[..., 3:4], 1e-7)


def test_external_mesh_golden_cold_and_warm(tmp_path, monkeypatch):
    import tinsel_tpu.scene.loaders.mesh_io as mesh_io
    from tinsel_tpu.accel.build import validate_bvh, triangle_bounds

    cache_dir = str(tmp_path / "cache")
    monkeypatch.setattr(mesh_io, "_CACHE_DIR", cache_dir)
    tin = _write_assets(str(tmp_path))

    img_cold = _render(tin)  # imports the PLY, writes the cache
    assert os.path.isdir(cache_dir) and os.listdir(cache_dir)

    img_warm = _render(tin)  # second load: reads the .npz cache
    np.testing.assert_array_equal(img_cold, img_warm)

    # the cached mesh's BVH is structurally valid (the round-1 bug made it
    # silently invalid right here)
    cache_file = os.path.join(cache_dir, os.listdir(cache_dir)[0])
    back = mesh_io.load_mesh_cache(cache_file)
    lo, hi = triangle_bounds(back.positions, back.indices)
    assert validate_bvh(back.bvh, lo, hi)

    path = os.path.join(GOLDEN_DIR, "extmesh.npz")
    if os.environ.get("REGEN_GOLDENS") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=img_cold.astype(np.float32))
        pytest.skip(f"golden written: {path}")
    ref = np.load(path)["img"]
    denom = max(float(np.abs(ref).mean()), 1e-6)
    mae = float(np.abs(img_cold - ref).mean()) / denom
    assert mae < 0.02, f"extmesh golden drift mae={mae:.4f}"
