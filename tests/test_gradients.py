"""Gradient correctness: autodiff vs central finite differences.

The render is a deterministic function of (params, key), so FD on the same
key matches autodiff exactly up to float32 precision wherever no discrete
sampling decision flips inside the FD step. Emission and color never affect
sampling decisions, so they are exact; camera/roughness move rays/lobes and
are checked at looser tolerance on low-variance configs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinsel_tpu.scene.presets import cornell_scene
from tinsel_tpu.render.camera import CameraParams
from tinsel_tpu.diff.gradients import render_loss
from tinsel_tpu.scene.model import Options


def _setup(w=24, h=24, depth=2):
    scene = cornell_scene(width=w, height=h, max_depth=depth)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    key = jax.random.key(42)
    target = jnp.full((h, w, 3), 0.25, jnp.float32)
    opts = dict(width=w, height=h, max_depth=depth)
    return flat, cam, key, target, opts


def _fd(fn, x, h):
    return (fn(x + h) - fn(x - h)) / (2 * h)


def test_emission_gradient_matches_fd():
    flat, cam, key, target, opts = _setup()
    light_idx = flat.light_indices[0]

    def loss_of_scale(s):
        em = flat.materials.emission.at[light_idx].mul(s)
        mats = dataclasses.replace(flat.materials, emission=em)
        f2 = dataclasses.replace(flat, materials=mats)
        return render_loss(f2, cam, key, target, **opts)

    loss_of_scale = jax.jit(loss_of_scale)
    g_ad = float(jax.grad(loss_of_scale)(jnp.float32(1.0)))
    g_fd = float(_fd(loss_of_scale, jnp.float32(1.0), 1e-2))
    assert abs(g_ad - g_fd) <= 0.02 * max(abs(g_fd), 1e-3), (g_ad, g_fd)


@pytest.mark.slow
def test_color_gradient_matches_fd():
    flat, cam, key, target, opts = _setup()

    def loss_of_scale(s):
        # scale the red wall's color (primitive 1 in the preset)
        col = flat.materials.color.at[1].mul(s)
        mats = dataclasses.replace(flat.materials, color=col)
        f2 = dataclasses.replace(flat, materials=mats)
        return render_loss(f2, cam, key, target, **opts)

    loss_of_scale = jax.jit(loss_of_scale)
    g_ad = float(jax.grad(loss_of_scale)(jnp.float32(1.0)))
    g_fd = float(_fd(loss_of_scale, jnp.float32(1.0), 1e-2))
    assert abs(g_ad - g_fd) <= 0.03 * max(abs(g_fd), 1e-3), (g_ad, g_fd)


@pytest.mark.slow
def test_roughness_gradient_matches_fd():
    # depth 1: roughness only enters through the (smooth) NEE shading term,
    # no lobe-driven ray movement -> FD is well-conditioned in f32. Deeper
    # bounces shift hit points with roughness (attached estimator), where FD
    # itself does not converge at f32 precision.
    flat, cam, key, target, opts = _setup(depth=1)
    from tinsel_tpu.diff.gradients import linear_image
    from tinsel_tpu.render.renderer import render_pass

    def loss_of_scale(s):
        # floor roughness (primitive 0: half the frame -> strong signal)
        r = flat.materials.roughness.at[0].set(0.4 * s)
        mats = dataclasses.replace(flat.materials, roughness=r)
        f2 = dataclasses.replace(flat, materials=mats)
        return jnp.mean(linear_image(render_pass(f2, cam, key, **opts)))

    loss_of_scale = jax.jit(loss_of_scale)
    g_ad = float(jax.grad(loss_of_scale)(jnp.float32(1.0)))
    g_fd = float(_fd(loss_of_scale, jnp.float32(1.0), 2e-2))
    assert abs(g_ad - g_fd) <= 0.1 * max(abs(g_fd), 1e-4), (g_ad, g_fd)


@pytest.mark.slow
def test_light_position_gradient_nonzero_and_matches_fd():
    flat, cam, key, target, opts = _setup()
    light_idx = flat.light_indices[0]

    def loss_of_dy(dy):
        sp = flat.prims.start_p.at[light_idx, 1].add(dy)
        ep = flat.prims.end_p.at[light_idx, 1].add(dy)
        prims = dataclasses.replace(flat.prims, start_p=sp, end_p=ep)
        f2 = dataclasses.replace(flat, prims=prims)
        return render_loss(f2, cam, key, target, **opts)

    loss_of_dy = jax.jit(loss_of_dy)
    g_ad = float(jax.grad(loss_of_dy)(jnp.float32(-0.2)))
    # h small enough that no visibility boundary flips inside the step
    g_fd = float(_fd(loss_of_dy, jnp.float32(-0.2), 5e-3))
    assert g_ad != 0.0
    assert abs(g_ad - g_fd) <= 0.02 * max(abs(g_fd), 1e-3), (g_ad, g_fd)


@pytest.mark.slow
def test_camera_gradient_finite():
    flat, cam, key, target, opts = _setup()

    def loss_of_pos(p):
        c2 = dataclasses.replace(cam, position=p)
        return render_loss(flat, c2, key, target, **opts)

    g = jax.grad(jax.jit(loss_of_pos))(cam.position)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def _smooth_camera_setup():
    """A scene where the image is a SMOOTH function of camera parameters:
    a bump-mapped plane filling the whole frame (camera looks down — no
    silhouette or horizon discontinuity anywhere in the image), lit at
    max_depth 1 by NEE from an out-of-frame sphere light with nothing
    between plane and light. Central differences are well-posed here; in
    a box scene every geometric edge aliases into the FD stencil, and at
    depth >= 2 a near-tangent bounce ray flipping between re-hitting the
    plane and escaping produces a measured ~1e-4 loss jump that swamps FD
    at any usable step."""
    from tinsel_tpu.scene.model import (
        Camera, HostTransform, Material, PLANE, Primitive, Scene, Sky,
        SPHERE,
    )
    from tinsel_tpu.scene.loaders.tin import _look_at_quat

    scene = Scene()
    scene.sky = Sky(
        horizon=np.zeros(3, np.float32), zenith=np.zeros(3, np.float32)
    )
    pos = np.array([0.3, 2.0, 0.4], np.float32)
    scene.camera = Camera(
        position=pos,
        rotation=_look_at_quat(pos, np.array([0.0, 0.0, 0.0], np.float32)),
        fov=float(np.deg2rad(35.0)),
    )
    scene.add_primitive(
        Primitive(
            type=PLANE,
            plane=np.array([0, 1, 0, 0], np.float32),
            material=Material(
                color=np.full(3, 0.7, np.float32),
                roughness=0.6, specular=0.3, bump=0.5, bump_tile=1.5,
            ),
        )
    )
    scene.add_primitive(
        Primitive(
            type=SPHERE,
            radius=0.4,
            start_transform=HostTransform(
                p=np.array([2.5, 6.0, 1.5], np.float32)
            ),
            material=Material(
                color=np.zeros(3, np.float32),
                emission=np.full(3, 40.0, np.float32),
            ),
            light_samples=1,
        )
    )
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    key = jax.random.key(21)
    target = jnp.full((24, 24, 3), 0.3, jnp.float32)
    opts = dict(width=24, height=24, max_depth=1)
    return flat, cam, key, target, opts


@pytest.mark.slow
def test_camera_position_gradient_matches_fd():
    """Camera dolly vs central differences on the same key, on the smooth
    (no-visibility-edge) scene — translation moves every hit point across
    the bump field, a strong smooth signal. BASELINE.json lists camera
    params in the gradient surface; this is the FD proof, matching the
    emission/color precedent."""
    flat, cam, key, target, opts = _smooth_camera_setup()

    def loss_of_dz(dz):
        p = cam.position + jnp.array([0.0, 0.0, 1.0], jnp.float32) * dz
        c2 = dataclasses.replace(cam, position=p)
        return render_loss(flat, c2, key, target, **opts)

    loss_of_dz = jax.jit(loss_of_dz)
    g_ad = float(jax.grad(loss_of_dz)(jnp.float32(0.0)))
    g_fd = float(_fd(loss_of_dz, jnp.float32(0.0), 1e-3))
    assert g_ad != 0.0
    assert abs(g_ad - g_fd) <= 0.05 * max(abs(g_fd), 1e-3), (g_ad, g_fd)


@pytest.mark.slow
def test_camera_fov_gradient_matches_fd():
    """FOV zoom vs central differences (same-key determinism). FOV scales
    ray directions through tan(fov/2) — with the whole frame on the bump
    plane the zoom sweeps hit points smoothly, no edge enters the image."""
    flat, cam, key, target, opts = _smooth_camera_setup()

    def loss_of_fov(f):
        c2 = dataclasses.replace(cam, fov=f)
        return render_loss(flat, c2, key, target, **opts)

    loss_of_fov = jax.jit(loss_of_fov)
    f0 = jnp.float32(cam.fov)
    g_ad = float(jax.grad(loss_of_fov)(f0))
    g_fd = float(_fd(loss_of_fov, f0, 1e-3))
    assert g_ad != 0.0
    assert abs(g_ad - g_fd) <= 0.05 * max(abs(g_fd), 1e-3), (g_ad, g_fd)


@pytest.mark.slow
def test_inverse_rendering_reduces_albedo_error():
    """The examples/inverse_rendering.py optimization must make real
    progress: mean visible-albedo error drops by >25% in a short run."""
    pytest.importorskip("optax")  # examples extra, not a test dependency
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.inverse_rendering import main as inv_main

    err0, err1 = inv_main(steps=15, size=24, seed=3)
    assert err1 < err0 * 0.75, (err0, err1)


@pytest.mark.slow
def test_remat_save_sets_bit_equal():
    """The remat save-set (integrator.REMAT_SAVE_NAMES) is a pure
    performance knob: every save set must produce bit-identical loss and
    material gradients (the saved residual IS the recomputed value)."""
    import tinsel_tpu.render.integrator as integ
    from tinsel_tpu.diff.gradients import render_loss_and_grads

    flat, cam, key, target, opts = _setup(w=12, h=12, depth=2)
    assert integ.REMAT_SAVE_NAMES == ("hit", "nee")  # shipped default (r5)

    def run():
        loss, (gm, gc) = render_loss_and_grads(
            flat, cam, key, target, **opts
        )
        return float(loss), [np.asarray(x) for x in jax.tree.leaves(gm)]

    try:
        base_loss, base_gm = run()
        integ.REMAT_SAVE_NAMES = ("hit", "oh", "mat", "nee")
        wide_loss, wide_gm = run()
    finally:
        integ.REMAT_SAVE_NAMES = ("hit",)
    assert base_loss == wide_loss
    for a, b in zip(base_gm, wide_gm):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_grad_unroll_groups_match_scan():
    """The unrolled-bounce gradient path (integrator.GRAD_UNROLL /
    GRAD_UNROLL_GROUP) is a pure performance knob: the forward loss
    matches the lax.scan path to f32 fusion-order rounding (same rematted
    bounce, same keys — only the loop structure differs; bit-equality
    held through r4, and r5's NEE occlusion rewrite shifted XLA's fusion
    choices enough to surface ~1e-7 relative ULP noise between the two
    loop structures), gradients match to f32 accumulation-order noise
    (scan transposes accumulate through a loop carry; the unrolled
    backward sums in program order — measured max normalized deviation
    2.9e-4 on CPU), and unroll group sizes agree with each other to
    last-ulp scheduling noise (observed max 1.2e-7 relative across
    groups, pure rounding)."""
    import tinsel_tpu.render.integrator as integ
    from tinsel_tpu.diff.gradients import render_loss_and_grads

    flat, cam, key, target, opts = _setup(w=12, h=12, depth=4)

    def run():
        loss, grads = render_loss_and_grads(flat, cam, key, target, **opts)
        return float(loss), [np.asarray(x) for x in jax.tree.leaves(grads)]

    try:
        integ.GRAD_UNROLL = False
        base_loss, base_g = run()
        anchor_g = None
        for grp in (1, 2, 4):
            integ.GRAD_UNROLL = True
            integ.GRAD_UNROLL_GROUP = grp
            loss, g = run()
            assert abs(loss - base_loss) <= 1e-6 * abs(base_loss), grp
            for a, b in zip(base_g, g):
                scale = max(float(np.max(np.abs(a))), 1e-12)
                assert float(np.max(np.abs(a - b))) / scale < 2e-3, grp
            if anchor_g is None:
                anchor_g = g
            else:
                for a, b in zip(anchor_g, g):
                    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)
    finally:
        integ.GRAD_UNROLL = True  # shipped default (r5)
        integ.GRAD_UNROLL_GROUP = 1
        integ.GRAD_UNROLL_GROUP = 1


@pytest.mark.slow
def test_grad_scan_accumulation_matches_chunk_mean():
    """render_loss_and_grads_scan (one-dispatch gradient accumulation)
    equals the arithmetic mean of the per-chunk results."""
    from tinsel_tpu.diff.gradients import (
        render_loss_and_grads, render_loss_and_grads_scan,
    )

    flat, cam, key, target, opts = _setup(w=8, h=8, depth=2)
    ls, gs = render_loss_and_grads_scan(flat, cam, key, target, 3, **opts)
    acc_l, acc_g = 0.0, None
    for c in range(3):
        l, g = render_loss_and_grads(
            flat, cam, jax.random.fold_in(key, c), target, **opts
        )
        acc_l += float(l)
        acc_g = g if acc_g is None else jax.tree.map(jnp.add, acc_g, g)
    assert abs(float(ls) - acc_l / 3) < 1e-6
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(acc_g)):
        # normalized deviation (vs the leaf's max magnitude): per-element
        # rtol is the wrong yardstick for near-zero gradient entries.
        # Covers f32 fusion/accumulation-order noise between the in-scan
        # chunks (one compiled subgraph) and the python-loop per-call
        # compilations (observed up to ~6e-6 normalized under the r5
        # unrolled loop; logic errors are orders larger)
        av, bv = np.asarray(a), np.asarray(b) / 3
        scale = max(float(np.max(np.abs(av))), 1e-12)
        assert float(np.max(np.abs(av - bv))) / scale < 1e-4


@pytest.mark.slow
def test_aperture_gradient_finite_and_nonzero():
    """Thin-lens DOF params carry gradients (finite and nonzero, like the
    camera-position precedent above: defocus gradients are dominated by
    silhouette/visibility terms, so an FD comparison is ill-posed — the
    autodiff covers the smooth shading/hit-point path only)."""
    from tinsel_tpu.scene.model import (
        Camera, Material, PLANE, Primitive, Scene, Sky,
    )

    scene = Scene()
    scene.sky = Sky(
        horizon=np.array([0.9, 0.5, 0.2], np.float32),
        zenith=np.array([0.1, 0.3, 0.8], np.float32),
    )
    scene.camera = Camera(position=np.array([0.0, 1.5, 3.0], np.float32))
    scene.add_primitive(
        Primitive(
            type=PLANE,
            plane=np.array([0, 1, 0, 0], np.float32),
            material=Material(
                color=np.full(3, 0.7, np.float32),
                roughness=0.6, specular=0.3, bump=0.4, bump_tile=2.0,
            ),
        )
    )
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    key = jax.random.key(11)
    target = jnp.full((16, 16, 3), 0.3, jnp.float32)
    opts = dict(width=16, height=16, max_depth=2)

    def loss_of_ap(a):
        c2 = dataclasses.replace(cam, aperture=a,
                                 focal_distance=jnp.float32(3.0))
        return render_loss(flat, c2, key, target, **opts)

    g = jax.grad(loss_of_ap)(jnp.float32(0.15))
    gf = jax.grad(
        lambda fd_: render_loss(
            flat,
            dataclasses.replace(cam, aperture=jnp.float32(0.15),
                                focal_distance=fd_),
            key, target, **opts,
        )
    )(jnp.float32(3.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0.0
    assert np.isfinite(float(gf)) and abs(float(gf)) > 0.0
