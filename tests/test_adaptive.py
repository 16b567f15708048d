"""Adaptive sampling: unbiasedness and sample-efficiency.

The feature is an extension (the reference samples uniformly forever,
main.cpp:242-258), so the tests pin its two contracts: per-pixel
estimates stay unbiased under non-uniform allocation, and at an equal ray
budget the variance-driven allocation beats uniform sampling on a scene
with concentrated noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tinsel_tpu.scene.model import (
    Camera, Material, Options, PLANE, Primitive, Scene, Sky, SPHERE,
)
from tinsel_tpu.render.adaptive import adaptive_render, adaptive_round, TILE
from tinsel_tpu.render.camera import CameraParams
from tinsel_tpu.render.renderer import render
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier


def _resolve(acc):
    a = np.asarray(acc)
    return a[..., :3] / np.maximum(a[..., 3:4], 1e-6)


def _hotspot_scene(w=96, h=48):
    """Glossy floor + small bright light under a black sky: variance
    concentrates in the specular highlight and the light silhouette while
    most tiles (sky) are exactly noise-free — the allocation-skew regime
    adaptive sampling exists for."""
    scene = Scene()
    scene.sky = Sky(
        horizon=np.zeros(3, np.float32),
        zenith=np.zeros(3, np.float32),
    )
    scene.camera = Camera(position=np.array([0.0, 1.2, 4.0], np.float32))
    scene.add_primitive(
        Primitive(
            type=PLANE,
            plane=np.array([0, 1, 0, 0], np.float32),
            material=Material(
                color=np.full(3, 0.85, np.float32),
                roughness=0.15,
                specular=0.7,
            ),
        )
    )
    scene.add_primitive(
        Primitive(
            type=SPHERE,
            radius=0.25,
            start_transform=__import__(
                "tinsel_tpu.scene.model", fromlist=["HostTransform"]
            ).HostTransform(p=np.array([0.8, 2.2, 0.0], np.float32)),
            material=Material(
                color=np.zeros(3, np.float32),
                emission=np.full(3, 40.0, np.float32),
            ),
            light_samples=1,
        )
    )
    scene.options = Options(width=w, height=h, max_depth=2,
                            filter_type="box")
    return scene


def test_adaptive_round_shapes_and_counts():
    scene = _hotspot_scene()
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    w, h = scene.options.width, scene.options.height
    accum = jnp.zeros((h, w, 4), jnp.float32)
    m2 = jnp.zeros((h, w, 3), jnp.float32)
    accum, m2 = adaptive_round(
        accum, m2, flat, cam, jax.random.key(0),
        k_tiles=2, spp=3, width=w, height=h, max_depth=2, uniform=True,
    )
    counts = np.asarray(accum[..., 3])
    # exactly 2 tiles of 16x16 pixels received exactly 3 samples
    assert counts.sum() == 2 * TILE * TILE * 3
    assert set(np.unique(counts)) <= {0.0, 3.0}
    assert np.isfinite(np.asarray(m2)).all()


def test_adaptive_is_unbiased():
    """Equal-budget adaptive and uniform renders agree on the mean image
    (both estimate the same integrand; only allocation differs)."""
    scene = _hotspot_scene()
    acc_a = adaptive_render(scene, budget_spp=48, seed=3, frac=0.3,
                            warmup_spp=8, spp_round=4)
    img_a = _resolve(acc_a)
    acc_u = render(scene, spp=48, seed=7, options=scene.options)
    img_u = _resolve(acc_u)
    # loose: both are MC estimates; agreement on the smooth regions and
    # no systematic offset overall
    assert np.isfinite(img_a).all()
    assert abs(float(img_a.mean() - img_u.mean())) < 0.02
    sky = (slice(0, 8), slice(0, 16))
    np.testing.assert_allclose(img_a[sky], img_u[sky], atol=0.05)


def _uniform_box(scene, spp, seed, spp_round=8):
    """Uniform render through the SAME per-pixel-box path adaptive uses,
    so efficiency comparisons isolate allocation from the reconstruction
    kernel (render()'s splat uses a wider box that smears pixel borders)."""
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    w, h = scene.options.width, scene.options.height
    n_tiles = (w // TILE) * (h // TILE)
    accum = jnp.zeros((h, w, 4), jnp.float32)
    m2 = jnp.zeros((h, w, 3), jnp.float32)
    key = jax.random.key(seed)
    for r in range(spp // spp_round):
        accum, m2 = adaptive_round(
            accum, m2, flat, cam, jax.random.fold_in(key, r),
            k_tiles=n_tiles, spp=spp_round, width=w, height=h,
            max_depth=scene.options.max_depth, uniform=True,
        )
    return accum


def test_adaptive_beats_uniform_at_equal_budget():
    """At an equal total ray budget, variance-driven allocation must cut
    image MSE vs a converged reference on the hotspot scene. All three
    images go through the identical per-pixel-box path so the comparison
    isolates sample ALLOCATION."""
    scene = _hotspot_scene()
    ref = _resolve(_uniform_box(scene, spp=512, seed=11, spp_round=16))

    budget = 48
    img_u = _resolve(_uniform_box(scene, spp=budget, seed=5))
    img_a = _resolve(
        adaptive_render(scene, budget_spp=budget, seed=5, frac=0.25,
                        warmup_spp=8, spp_round=4)
    )
    # clamp to tame single-firefly dominance of the metric
    c = 4.0
    mse_u = float(((np.minimum(img_u, c) - np.minimum(ref, c)) ** 2).mean())
    mse_a = float(((np.minimum(img_a, c) - np.minimum(ref, c)) ** 2).mean())
    assert mse_a < mse_u, (mse_a, mse_u)
