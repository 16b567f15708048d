import os

import numpy as np
import pytest

from tinsel_tpu.io.png import write_png, read_png, quantize_dithered
from tinsel_tpu.io.hdr import load_hdr, save_hdr, load_pfm, save_pfm
from tinsel_tpu.io.tga import load_tga, save_tga
from tinsel_tpu.scene.loaders.tin import load_tin
from tinsel_tpu.scene.loaders.mesh_io import import_obj, import_ply, import_mesh
from tinsel_tpu.scene.probe_io import load_probe, create_test_probe
from tinsel_tpu.scene.model import MESH, PLANE, SPHERE

REF_DATA = "/root/reference/data"
HAVE_REF = os.path.isdir(REF_DATA)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((17, 23, 3)).astype(np.float32)
    p = str(tmp_path / "t.png")
    write_png(p, img, dither=False)
    back = read_png(p)
    assert back.shape == (17, 23, 3)
    np.testing.assert_allclose(back / 255.0, img, atol=1.0 / 255.0)


def test_png_dither_debands():
    img = np.full((64, 64, 3), 0.5019, np.float32)  # between two 8-bit codes
    q = quantize_dithered(img)
    # dithering should straddle the two adjacent code values
    assert len(np.unique(q)) >= 2


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(1).random((9, 13, 3)).astype(np.float32) * 10
    p = str(tmp_path / "t.pfm")
    save_pfm(p, img)
    np.testing.assert_allclose(load_pfm(p), img, rtol=1e-6)


def test_hdr_roundtrip(tmp_path):
    img = (np.random.default_rng(2).random((8, 16, 3)).astype(np.float32)) * 50
    p = str(tmp_path / "t.hdr")
    save_hdr(p, img)
    back = load_hdr(p)
    assert back.shape == img.shape
    # RGBE shares one exponent across channels: error bound is ~1/256 of the
    # per-pixel max channel, not a per-channel relative error
    bound = img.max(axis=-1, keepdims=True) / 128.0 + 1e-3
    assert np.all(np.abs(back - img) <= bound)


def test_tga_roundtrip(tmp_path):
    img = np.random.default_rng(3).integers(0, 255, (10, 12, 3), dtype=np.uint8)
    p = str(tmp_path / "t.tga")
    save_tga(p, img)
    np.testing.assert_array_equal(load_tga(p), img)


@pytest.mark.skipif(not HAVE_REF, reason="reference assets unavailable")
def test_load_reference_palette_tga():
    img = load_tga(os.path.join(REF_DATA, "palette.tga"))
    assert img.ndim == 3 and img.shape[2] in (3, 4)
    assert img.shape[0] > 0 and img.shape[1] > 0


@pytest.mark.skipif(not HAVE_REF, reason="reference assets unavailable")
def test_load_reference_loft_probe():
    probe = load_probe(os.path.join(REF_DATA, "probes", "loft.hdr"))
    assert probe.width > 100 and probe.height > 50
    assert np.isfinite(probe.data).all()
    assert probe.data.max() > 1.0  # HDR content
    # CDFs are monotone and end at ~1
    assert np.all(np.diff(probe.cdf_y) >= -1e-6)
    np.testing.assert_allclose(probe.cdf_y[-1], 1.0, atol=1e-4)
    np.testing.assert_allclose(probe.cdf_x[:, -1], 1.0, atol=1e-4)


def test_create_test_probe_cdf_targets_disc():
    probe = create_test_probe()
    # sampling rows should concentrate near the top (disc around +Y)
    top_mass = probe.cdf_y[probe.height // 4]
    assert top_mass > 0.9


# --------------------------------------------------------------------- meshes


@pytest.mark.skipif(not HAVE_REF, reason="reference assets unavailable")
def test_import_reference_ply():
    mesh = import_ply(os.path.join(REF_DATA, "meshes", "sphere.ply"))
    assert len(mesh.positions) == 642
    assert len(mesh.indices) == 1280
    mesh.build()
    # unit icosphere: area ~ 4*pi*r^2 with r~0.95..1 (faceted)
    r = np.linalg.norm(mesh.positions, axis=-1).mean()
    assert abs(mesh.area / (4 * np.pi * r * r) - 1.0) < 0.1


@pytest.mark.skipif(not HAVE_REF, reason="reference assets unavailable")
def test_import_reference_obj():
    mesh = import_obj(os.path.join(REF_DATA, "meshes", "octopus.obj"))
    assert len(mesh.indices) > 100
    assert len(mesh.positions) > 50
    mesh.build()
    assert np.isfinite(mesh.positions).all()
    assert mesh.indices.max() < len(mesh.positions)
    assert np.allclose(np.linalg.norm(mesh.normals, axis=-1), 1.0, atol=1e-3)


def test_wo3_roundtrip(tmp_path):
    """.wo3 import (mesh.cpp:1167-1216): stored normals kept, coordinates
    NOT unit-box normalized (the reference's dispatch skips Normalize and
    CalculateNormals for wo3, mesh.cpp:120-126)."""
    from tinsel_tpu.scene.loaders.mesh_io import import_mesh, save_wo3
    from tinsel_tpu.scene.procedural import sphere

    src = sphere(radius=3.0, n_theta=12, n_phi=12)
    src.build()
    path = str(tmp_path / "ball.wo3")
    save_wo3(path, src.positions, src.indices, src.normals)

    mesh = import_mesh(path, cache=False)
    np.testing.assert_allclose(mesh.positions, src.positions, atol=1e-6)
    np.testing.assert_array_equal(mesh.indices, src.indices)
    np.testing.assert_allclose(mesh.normals, src.normals, atol=1e-5)
    # radius 3 preserved: no normalization happened
    assert np.linalg.norm(mesh.positions, axis=-1).max() > 2.5
    assert mesh.bvh is not None and mesh.area > 0


def test_bin_roundtrip(tmp_path):
    """Reference `.bin` dump import (mesh.cpp:809-880): geometry, stored
    normals, area and CDF consumed; coordinates NOT re-normalized (the
    dump is written post-normalization by -convert, main.cpp:152-170);
    the foreign serialized BVH block is skipped and the wide tree
    rebuilt."""
    from tinsel_tpu.scene.loaders.mesh_io import import_mesh, save_bin
    from tinsel_tpu.scene.procedural import sphere

    src = sphere(radius=3.0, n_theta=12, n_phi=12)
    src.build()
    path = str(tmp_path / "ball.bin")
    save_bin(path, src)

    mesh = import_mesh(path, cache=False)
    np.testing.assert_allclose(mesh.positions, src.positions, atol=1e-6)
    np.testing.assert_array_equal(mesh.indices, src.indices)
    np.testing.assert_allclose(mesh.normals, src.normals, atol=1e-5)
    np.testing.assert_allclose(mesh.cdf, src.cdf, atol=1e-6)
    assert abs(mesh.area - src.area) < 1e-4 * max(src.area, 1.0)
    # radius 3 preserved: no normalization happened
    assert np.linalg.norm(mesh.positions, axis=-1).max() > 2.5
    assert mesh.bvh is not None


def test_mesh_cache_roundtrip(tmp_path):
    """The round-1 cache bug dropped the ranged-leaf BVH's count/perm and
    silently rebuilt a corrupt tree on load — so this test must prove the
    *tree*, not just the vertex data, survives: structural validation plus
    bit-equal traversal results through the reloaded BVH."""
    import jax.numpy as jnp
    from tinsel_tpu.accel.build import validate_bvh, triangle_bounds
    from tinsel_tpu.scene.loaders.mesh_io import save_mesh_cache, load_mesh_cache
    from tinsel_tpu.scene.presets import sphere_mesh

    m = sphere_mesh(1.0, 16, 32)  # 960 tris: several ranged leaves
    m.build()
    p = str(tmp_path / "m.npz")
    save_mesh_cache(p, m)
    back = load_mesh_cache(p)
    np.testing.assert_array_equal(back.positions, m.positions)
    np.testing.assert_array_equal(back.indices, m.indices)
    assert back.bvh.num_nodes == m.bvh.num_nodes
    assert abs(back.area - m.area) < 1e-5

    # full BVH equality + structural validity of the reloaded tree
    np.testing.assert_array_equal(back.bvh.count, m.bvh.count)
    np.testing.assert_array_equal(back.bvh.perm, m.bvh.perm)
    np.testing.assert_array_equal(back.bvh.left, m.bvh.left)
    lo, hi = triangle_bounds(back.positions, back.indices)
    assert validate_bvh(back.bvh, lo, hi)

    # traversal equality: identical hits through original and reloaded BVH
    def closest_hits(mesh):
        from tinsel_tpu.scene.model import Scene, Primitive, MESH
        from tinsel_tpu.accel.traverse import intersect_mesh

        scene = Scene()
        scene.add_primitive(Primitive(type=MESH, mesh=mesh))
        flat = scene.flatten()
        handle = flat.prim_static[0].mesh
        rng = np.random.default_rng(7)
        o = (rng.random((256, 3)).astype(np.float32) * 4 - 2) * 2.0
        d = rng.random((256, 3)).astype(np.float32) - 0.5
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t, tri, *_ = intersect_mesh(
            flat.pool, handle.node_offset, handle.tri_offset,
            jnp.asarray(o), jnp.asarray(d), jnp.full((256,), np.inf, jnp.float32),
        )
        return np.asarray(t), np.asarray(tri)

    t0, tri0 = closest_hits(m)
    t1, tri1 = closest_hits(back)
    np.testing.assert_array_equal(tri0, tri1)
    np.testing.assert_array_equal(t0, t1)


def test_mesh_cache_rejects_lossy_v2(tmp_path):
    """A pre-v3 cache (missing count/perm) must fail loudly, not load a
    silently corrupted tree (the round-1 live bug)."""
    from tinsel_tpu.scene.loaders.mesh_io import save_mesh_cache, load_mesh_cache
    from tinsel_tpu.scene.presets import sphere_mesh

    m = sphere_mesh(1.0, 8, 16)
    m.build()
    p = str(tmp_path / "m.npz")
    save_mesh_cache(p, m)
    z = dict(np.load(p))
    z.pop("bvh_count")
    z.pop("bvh_perm")
    np.savez_compressed(p, **z)
    with pytest.raises(ValueError, match="ranged-leaf"):
        load_mesh_cache(p)


def test_import_mesh_warm_cache_identical(tmp_path, monkeypatch):
    """import_mesh through a cold then warm cache yields identical BVHs —
    the end-to-end path of the round-1 corruption (second-process reload
    rendered garbage)."""
    import tinsel_tpu.scene.loaders.mesh_io as mesh_io
    from tinsel_tpu.accel.build import validate_bvh, triangle_bounds
    from tinsel_tpu.scene.presets import sphere_mesh

    src = sphere_mesh(1.0, 16, 32)
    obj_path = str(tmp_path / "s.obj")
    with open(obj_path, "w") as f:
        for p in src.positions:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for a, b, c in src.indices + 1:
            f.write(f"f {a} {b} {c}\n")
    monkeypatch.setattr(mesh_io, "_CACHE_DIR", str(tmp_path / "cache"))

    cold = mesh_io.import_mesh(obj_path, cache=True)   # imports + saves
    warm = mesh_io.import_mesh(obj_path, cache=True)   # loads the cache
    np.testing.assert_array_equal(cold.positions, warm.positions)
    np.testing.assert_array_equal(cold.indices, warm.indices)
    for f in ("lower", "upper", "left", "right", "leaf", "count", "perm"):
        np.testing.assert_array_equal(
            getattr(cold.bvh, f), getattr(warm.bvh, f), err_msg=f
        )
    lo, hi = triangle_bounds(warm.positions, warm.indices)
    assert validate_bvh(warm.bvh, lo, hi)
    assert int(warm.bvh.count.max()) == int(cold.bvh.count.max())


# ----------------------------------------------------------------- tin loader


@pytest.mark.skipif(not HAVE_REF, reason="reference assets unavailable")
def test_load_cornell_tin():
    scene = load_tin(os.path.join(REF_DATA, "cornell.tin"))
    assert scene.options.width == 256 and scene.options.height == 256
    assert abs(scene.options.exposure - 1.0) < 1e-6
    assert scene.options.filter_type == "gaussian"
    types = [p.type for p in scene.primitives]
    assert types.count(PLANE) == 5
    assert types.count(SPHERE) == 2
    assert types.count(MESH) == 1  # quad light
    light = [p for p in scene.primitives if p.light_samples > 0]
    assert len(light) == 1
    np.testing.assert_allclose(
        light[0].material.emission, [18.4, 15.6, 8.0], atol=1e-5
    )
    # camera
    np.testing.assert_allclose(scene.camera.position, [0, 1, 4], atol=1e-6)
    assert abs(scene.camera.fov - np.deg2rad(35)) < 1e-6
    # metal sphere has scale 0.5
    metal = scene.primitives[-1]
    assert metal.type == SPHERE and abs(metal.start_transform.s - 0.5) < 1e-6
    # scene flattens and the light mesh has 2 triangles
    flat = scene.flatten()
    light_static = flat.prim_static[flat.light_indices[0]]
    # the 2-triangle quad light pads to one 16-slot leaf block
    assert light_static.mesh.num_tris == 16


@pytest.mark.skipif(not HAVE_REF, reason="reference assets unavailable")
def test_load_motionblur_tin():
    scene = load_tin(os.path.join(REF_DATA, "motionblur.tin"))
    assert scene.camera.shutter_start != scene.camera.shutter_end or any(
        p.end_transform is not None for p in scene.primitives
    )
    moving = [p for p in scene.primitives if p.end_transform is not None]
    assert moving, "motionblur.tin should have comma-separated transforms"
    m = moving[0]
    # the octopus animates its rotation (0,0,0,1) -> (0,1,0,0)
    assert not np.allclose(m.start_transform.q, m.end_transform.q)
    # fields set after the comma pair still mirror into the end transform
    assert m.end_transform.s == m.start_transform.s


@pytest.mark.skipif(not HAVE_REF, reason="reference assets unavailable")
def test_load_glass_tin():
    scene = load_tin(os.path.join(REF_DATA, "glass.tin"))
    assert scene.options.max_depth == 8
    glass_mats = [
        p.material for p in scene.primitives if p.material.transmission > 0
    ]
    assert glass_mats, "glass.tin must have transmissive materials"


@pytest.mark.skipif(not HAVE_REF, reason="reference assets unavailable")
def test_load_veach_tin_and_flatten():
    scene = load_tin(os.path.join(REF_DATA, "veach.tin"))
    lights = [p for p in scene.primitives if p.light_samples > 0]
    assert len(lights) >= 4  # the four classic emitters
    flat = scene.flatten()
    assert len(flat.light_indices) >= 4
