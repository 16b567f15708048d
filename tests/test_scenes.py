"""Scene-corpus tests: every shipped scenes/*.tin loads, flattens, and
renders finite non-black pixels at low spp; plus the physics scenes'
quantitative checks (furnace/conservation, the reference's correctness
anchors — render.cpp:188-190, data/conservation.tin)."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

SCENES_DIR = os.path.join(os.path.dirname(__file__), "..", "scenes")
ALL_SCENES = sorted(glob.glob(os.path.join(SCENES_DIR, "*.tin")))


def _render_small(scene, spp=4, size=48, max_depth=None):
    from tinsel_tpu.render.renderer import render
    from tinsel_tpu.scene.model import Options
    import dataclasses

    o = scene.options
    opts = dataclasses.replace(
        o,
        width=size,
        height=size,
        max_depth=max_depth or min(o.max_depth, 4),
    )
    acc = render(scene, spp=spp, options=opts)
    return np.asarray(acc)


def test_corpus_present():
    names = {os.path.basename(p) for p in ALL_SCENES}
    expected = {
        "simple.tin", "cornell.tin", "furnace.tin", "conservation.tin",
        "gloss.tin", "veach.tin", "glass.tin", "motionblur.tin",
        "meshlight.tin", "transmission.tin", "materials.tin",
        "emitter.tin", "env.tin", "example.tin",
    }
    missing = expected - names
    assert not missing, f"scene corpus missing: {missing}"


@pytest.mark.parametrize(
    "path", ALL_SCENES, ids=[os.path.basename(p) for p in ALL_SCENES]
)
def test_scene_loads_and_renders(path):
    from tinsel_tpu.scene.loaders.tin import load_tin

    scene = load_tin(path)
    assert scene.primitives, f"{path}: no primitives parsed"
    acc = _render_small(scene, spp=2)
    assert np.isfinite(acc).all(), f"{path}: non-finite pixels"
    assert acc[..., 3].max() > 0, f"{path}: zero filter weight"
    assert acc[..., :3].max() > 1e-4, f"{path}: black render"


def test_furnace_closes():
    """In a constant-0.5 sky, a white sphere with a deep bounce budget must
    converge near the background level (weak furnace test)."""
    from tinsel_tpu.scene.loaders.tin import load_tin

    scene = load_tin(os.path.join(SCENES_DIR, "furnace.tin"))
    acc = _render_small(scene, spp=48, size=32, max_depth=24)
    img = acc[..., :3] / np.maximum(acc[..., 3:4], 1e-7)
    h, w = img.shape[:2]
    center = img[h // 2 - 3 : h // 2 + 3, w // 2 - 3 : w // 2 + 3].mean()
    corner = img[:4, :4].mean()
    assert abs(corner - 0.5) < 0.02, f"sky should be 0.5, got {corner}"
    # geometric albedo-1 series truncated at depth 24; allow MC noise
    assert abs(center - 0.5) < 0.06, f"furnace sphere {center} vs sky 0.5"


def test_emitter_nee_matches_bsdf_only():
    """The two emitters in emitter.tin differ only in lightSamples; the
    lighting they cast on the ground must agree statistically (MIS
    consistency, render.cpp:285-310)."""
    from tinsel_tpu.scene.loaders.tin import load_tin

    scene = load_tin(os.path.join(SCENES_DIR, "emitter.tin"))
    acc = _render_small(scene, spp=192, size=64, max_depth=2)
    img = acc[..., :3] / np.maximum(acc[..., 3:4], 1e-7)
    h, w = img.shape[:2]
    # ground luminance under the left (NEE) and right (BSDF-only) emitters
    left = img[int(h * 0.75) :, : w // 2].mean()
    right = img[int(h * 0.75) :, w // 2 :].mean()
    assert left > 0.005 and right > 0.005
    assert abs(left - right) / max(left, right) < 0.35, (left, right)


def test_tungsten_sample_scene():
    from tinsel_tpu.scene.loaders.tungsten import load_tungsten

    scene = load_tungsten(os.path.join(SCENES_DIR, "tungsten_box.json"))
    assert len(scene.primitives) == 8  # 5 walls + 2 spheres + light quad
    assert sum(1 for p in scene.primitives if p.light_samples) == 1
    acc = _render_small(scene, spp=2)
    assert np.isfinite(acc).all() and acc[..., :3].max() > 1e-4
