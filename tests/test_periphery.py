import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinsel_tpu.render.nlm import average_filter, nlm_filter
from tinsel_tpu.utils.perlin import perlin3d, fractal3d, perlin2d
from tinsel_tpu.parallel.checkpoint import save_checkpoint, load_checkpoint
from tinsel_tpu.scene.loaders.tungsten import load_tungsten
from tinsel_tpu.scene.model import MESH


def test_average_filter_constant_preserved():
    img = jnp.full((9, 9, 3), 0.7)
    out = average_filter(img, radius=1)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)


def test_average_filter_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    img = rng.random((7, 8, 3)).astype(np.float32)
    out = np.asarray(average_filter(jnp.asarray(img), radius=1))
    # scalar oracle with clipped windows
    for y in (0, 3, 6):
        for x in (0, 4, 7):
            ys = slice(max(0, y - 1), min(7, y + 2))
            xs = slice(max(0, x - 1), min(8, x + 2))
            np.testing.assert_allclose(
                out[y, x], img[ys, xs].mean(axis=(0, 1)), rtol=1e-5
            )


def test_nlm_preserves_edges_smooths_noise():
    rng = np.random.default_rng(1)
    clean = np.zeros((16, 16, 3), np.float32)
    clean[:, 8:] = 1.0  # hard vertical edge
    noisy = clean + rng.normal(0, 0.05, clean.shape).astype(np.float32)
    out = np.asarray(nlm_filter(jnp.asarray(noisy), falloff=200.0, radius=1))
    # noise reduced on flats
    flat_noise_in = np.std(noisy[4:12, 2:6])
    flat_noise_out = np.std(out[4:12, 2:6])
    assert flat_noise_out < flat_noise_in * 0.8
    # edge magnitude preserved
    assert out[:, 9:].mean() - out[:, :7].mean() > 0.9


def test_nlm_differentiable():
    img = jnp.ones((8, 8, 3)) * 0.5
    g = jax.grad(lambda x: jnp.sum(nlm_filter(x)))(img)
    assert np.isfinite(np.asarray(g)).all()


def test_perlin_range_and_smoothness():
    x = np.linspace(0, 10, 512)
    v = perlin3d(x, 0.3, 0.7)
    assert np.abs(v).max() <= 1.0 + 1e-6
    assert np.abs(np.diff(v)).max() < 0.1  # smooth at this sampling rate
    assert v.std() > 0.01  # not constant


def test_perlin_periodic():
    p = 8
    a = perlin2d(np.arange(16) + 0.5, 3.3, period=p)
    np.testing.assert_allclose(a[:8], a[8:], atol=1e-9)


def test_fractal_octaves_add_detail():
    x = np.linspace(0, 4, 256)
    base = perlin3d(x, 0.5, 0.5)
    frac = fractal3d(x, 0.5, 0.5, octaves=4)
    # higher-frequency content => larger total variation
    assert np.abs(np.diff(frac)).sum() > np.abs(np.diff(base)).sum()


def test_checkpoint_roundtrip(tmp_path):
    accum = np.random.default_rng(2).random((8, 8, 4)).astype(np.float32)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, accum, spp_done=17, seed=3, meta={"scene": "x.tin"})
    a, spp, seed, meta = load_checkpoint(p)
    np.testing.assert_array_equal(a, accum)
    assert spp == 17 and seed == 3 and meta["scene"] == "x.tin"


def test_tungsten_loader(tmp_path):
    doc = {
        "bsdfs": [
            {"name": "Floor", "type": "lambert", "albedo": [0.5, 0.5, 0.5]},
            {"name": "Glass", "type": "dielectric", "ior": 1.5,
             "enable_refraction": True},
            {"name": "Metal", "type": "mirror", "albedo": 0.9},
        ],
        "primitives": [
            {"type": "quad", "bsdf": "Floor",
             "transform": {"position": [0, 0, 0], "scale": [4, 1, 4]}},
            {"type": "quad", "bsdf": "Floor", "emission": [10, 10, 10],
             "transform": {"position": [0, 2, 0]}},
            {"type": "infinite_sphere", "emission": [0.2, 0.3, 0.4]},
        ],
        "camera": {"resolution": [128, 64], "fov": 40,
                   "transform": {"position": [0, 1, 5], "look_at": [0, 1, 0]}},
        "integrator": {"max_bounces": 6},
        "renderer": {"spp": 32},
    }
    p = str(tmp_path / "scene.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    scene = load_tungsten(p)
    assert scene.options.width == 128 and scene.options.height == 64
    assert scene.options.max_depth == 6
    assert scene.options.max_samples == 32
    assert len(scene.primitives) == 2  # two quads; infinite_sphere -> sky
    assert all(pr.type == MESH for pr in scene.primitives)
    lights = [pr for pr in scene.primitives if pr.light_samples > 0]
    assert len(lights) == 1
    np.testing.assert_allclose(scene.sky.horizon, [0.2, 0.3, 0.4], atol=1e-6)
    # quad scale baked into vertices
    q = scene.primitives[0].mesh
    assert abs(q.positions[:, 0].max() - 2.0) < 1e-5
    # fov scaled by aspect (40deg * 64/128)
    assert abs(scene.camera.fov - np.deg2rad(40) * 0.5) < 1e-5
    # flattens + renders one tiny pass
    flat = scene.flatten()
    assert len(flat.light_indices) == 1


@pytest.mark.slow
def test_cli_renders_scene(tmp_path):
    # small procedural .tin written from scratch, rendered via the CLI
    tin = """
options
{
    width 24
    height 20
    maxDepth 2
}

camera
{
    position 0.0 1.0 4.0
    fov 45
}

material white
{
    color 0.8 0.8 0.8
    roughness 1.0
    specular 0.1
}

material light
{
    emission 10 10 10
    color 0 0 0
}

primitive
{
    type plane
    plane 0 1 0 0
    material white
}

primitive
{
    type sphere
    radius 0.5
    position 0 3 0
    material light
    lightSamples 1
}
"""
    scene_path = str(tmp_path / "mini.tin")
    with open(scene_path, "w") as f:
        f.write(tin)
    out_path = str(tmp_path / "mini.png")
    from tinsel_tpu.app.cli import main

    rc = main([scene_path, "-spp", "2", "-o", out_path, "-denoise"])
    assert rc == 0
    assert os.path.exists(out_path)
    from tinsel_tpu.io.png import read_png

    img = read_png(out_path)
    assert img.shape == (20, 24, 3)
    assert img.max() > 10  # lit scene, non-black


def test_resolve_reinhard_consumes_limit():
    """options.limit is live through the reinhard tonemap path (the
    reference's ToneMap carries a dead limit parameter, util.h:25-42)."""
    import jax.numpy as jnp
    from tinsel_tpu.core.color import resolve

    accum = jnp.concatenate(
        [jnp.full((4, 4, 3), 8.0), jnp.ones((4, 4, 1))], axis=-1
    )
    lo = np.asarray(resolve(accum, tonemap="reinhard", limit=0.5))
    hi = np.asarray(resolve(accum, tonemap="reinhard", limit=4.0))
    assert (hi > lo).all()  # higher shoulder -> brighter highlights
    film = np.asarray(resolve(accum, tonemap="filmic", limit=0.5))
    film2 = np.asarray(resolve(accum, tonemap="filmic", limit=4.0))
    np.testing.assert_array_equal(film, film2)  # filmic ignores limit


def test_aov_passes(tmp_path):
    """AOV extension: one deterministic trace yields unit normals, positive
    depth on hits, material albedo; PFMs round-trip losslessly."""
    import jax

    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.render.aov import render_aovs, write_aovs
    from tinsel_tpu.io.hdr import load_pfm

    scene = cornell_scene(width=24, height=24, max_depth=2)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    aovs = jax.jit(lambda f, c: render_aovs(f, c, 24, 24))(flat, cam)
    n = np.asarray(aovs["normal"])
    d = np.asarray(aovs["depth"])
    a = np.asarray(aovs["albedo"])
    hit = d[..., 0] > 0
    assert hit.mean() > 0.9  # closed box: nearly every pixel hits
    assert np.allclose(np.linalg.norm(n[hit], axis=-1), 1.0, atol=1e-3)
    assert a[hit].max() > 0.5  # wall albedos present
    paths = write_aovs(str(tmp_path / "x"), aovs)
    normal_path = next(p for p in paths if p.endswith("_normal.pfm"))
    back = load_pfm(normal_path)
    np.testing.assert_array_equal(back, np.asarray(aovs["normal"]))


@pytest.mark.slow
def test_guided_nlm_preserves_edges():
    """Joint NLM with AOV guides must smooth noise while holding a hard
    albedo edge that plain NLM at equal strength blurs across."""
    import jax
    from tinsel_tpu.render.nlm import nlm_filter, nlm_guided

    h = w = 32
    rng = np.random.default_rng(0)
    edge = (np.arange(w) >= w // 2).astype(np.float32)
    clean = np.repeat(edge[None, :], h, axis=0)[..., None] * np.ones(3)
    noisy = clean + rng.normal(0, 0.25, clean.shape).astype(np.float32)
    albedo = clean.astype(np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    depth = np.ones((h, w, 1), np.float32)

    g = np.asarray(nlm_guided(
        jax.numpy.asarray(noisy), normal, albedo, depth,
        falloff=2.0, radius=2,
    ))
    p = np.asarray(nlm_filter(jax.numpy.asarray(noisy), falloff=2.0,
                              radius=2))
    # noise removal: both cut variance on the flat halves
    flat_region = (slice(4, 28), slice(2, 12))
    assert g[flat_region].std() < noisy[flat_region].std() * 0.6
    # edge retention: guided keeps the step much sharper
    def edge_sharpness(img):
        return float(
            np.abs(img[:, w // 2] - img[:, w // 2 - 1]).mean()
        )
    assert edge_sharpness(g) > 2.0 * edge_sharpness(p), (
        edge_sharpness(g), edge_sharpness(p),
    )


@pytest.mark.slow
def test_cli_batch_animation(tmp_path):
    """Batch mode (main.cpp:105-118 parity): a %d scene pattern renders
    each existing frame to its own PNG and stops at the first gap."""
    from tinsel_tpu.app.cli import main

    src = """
options
{{
    width 16
    height 16
    maxDepth 1
    maxSamples 2
}}
sky
{{
    horizon 0.4 0.4 {h}
    zenith 0.1 0.1 0.3
}}
"""
    for i, h in ((0, "0.4"), (1, "0.9")):
        (tmp_path / f"anim_{i}.tin").write_text(src.format(h=h))
    out = tmp_path / "out_%d.png"
    rc = main([str(tmp_path / "anim_%d.tin"), "-o", str(out)])
    assert rc == 0
    assert (tmp_path / "out_0.png").exists()
    assert (tmp_path / "out_1.png").exists()
    assert not (tmp_path / "out_2.png").exists()
    from tinsel_tpu.io.png import read_png

    a = read_png(str(tmp_path / "out_0.png"))
    b = read_png(str(tmp_path / "out_1.png"))
    assert not np.array_equal(a, b)  # the two frames differ
