"""Tests for the QMC sampling kit, Perez skylight, procedural meshes,
complexity render mode, and the BSDF sample/pdf visual-consistency harness.

Mirror of the reference's research-kit surface (sampler.h:80-226 blue noise,
skylight.h:6-95 Perez model, mesh.cpp:968-1153 procedural geometry,
disney.h:409-482 BSDFTest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _min_toroidal_dist(p):
    d = np.abs(p[:, None, :] - p[None, :, :])
    d = np.minimum(d, 1.0 - d)
    dd = (d**2).sum(-1)
    np.fill_diagonal(dd, 9.0)
    return float(dd.min() ** 0.5)


class TestSamplingKit:
    def test_blue_noise_beats_random(self):
        from tinsel_tpu.core.sampling import best_candidate_2d

        pts = np.asarray(best_candidate_2d(64, jax.random.key(0)))
        rnd = np.asarray(jax.random.uniform(jax.random.key(1), (64, 2)))
        assert pts.shape == (64, 2)
        assert (pts >= 0).all() and (pts < 1).all()
        assert _min_toroidal_dist(pts) > 3.0 * _min_toroidal_dist(rnd)

    def test_projective_blue_noise_projections(self):
        from tinsel_tpu.core.sampling import best_candidate_projective_2d

        pts = np.asarray(best_candidate_projective_2d(32, jax.random.key(0)))
        # 1D projections should also be well-spaced: min gap in x above the
        # random-expected minimum (order 1/n^2), near the stratified 1/n ideal
        for axis in range(2):
            x = np.sort(pts[:, axis])
            gaps = np.diff(np.concatenate([x, [x[0] + 1.0]]))
            assert gaps.min() > 0.2 / len(x)

    def test_toroidal_shift_and_stratified_1d(self):
        from tinsel_tpu.core.sampling import (
            stratified_offsets_1d,
            toroidal_shift,
        )

        s = stratified_offsets_1d(16, jax.random.key(0))
        assert s.shape == (16,)
        # one sample per stratum
        assert np.array_equal(np.floor(np.asarray(s) * 16), np.arange(16))
        p = jnp.stack([s, s], axis=-1)
        sh = np.asarray(toroidal_shift(p, jax.random.key(1)))
        assert ((sh >= 0) & (sh < 1)).all()


class TestSkylight:
    def test_finite_positive_and_peaks_near_sun(self):
        from tinsel_tpu.render.skylight import sky_radiance_dir

        sun = jnp.array([0.3, 0.8, 0.1])
        sun = sun / jnp.linalg.norm(sun)
        dirs = jnp.array([[0.0, 1.0, 0.0], [0.9, 0.1, 0.0], [-0.3, 0.5, 0.8]])
        rgb = np.asarray(sky_radiance_dir(dirs, sun, 2.5))
        assert np.isfinite(rgb).all() and (rgb >= 0).all()
        # near-sun direction is brighter than the opposite horizon
        near = np.asarray(sky_radiance_dir(sun[None, :], sun)).sum()
        far = np.asarray(
            sky_radiance_dir(jnp.array([[-sun[0], 0.05, -sun[2]]]), sun)
        ).sum()
        assert near > far

    def test_differentiable_in_turbidity(self):
        from tinsel_tpu.render.skylight import sky_radiance_dir

        sun = jnp.array([0.0, 1.0, 0.0])
        d = jnp.array([[0.5, 0.5, 0.0]])

        g = jax.grad(lambda t: sky_radiance_dir(d, sun, t).sum())(2.5)
        assert np.isfinite(float(g))


class TestProcedural:
    @pytest.mark.parametrize(
        "name", ["quad", "disc", "tetrahedron", "sphere", "capsule"]
    )
    def test_builders_closed_and_consistent(self, name):
        from tinsel_tpu.scene import procedural

        mesh = getattr(procedural, name)()
        mesh.build()
        assert mesh.area > 0
        assert mesh.normals.shape == mesh.positions.shape
        assert mesh.indices.min() >= 0
        assert mesh.indices.max() < len(mesh.positions)
        # normals unit length
        n = np.linalg.norm(mesh.normals, axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-4)

    def test_sphere_area_analytic(self):
        from tinsel_tpu.scene import procedural

        m = procedural.sphere(radius=1.0, n_theta=64, n_phi=128)
        m.build()
        assert abs(m.area - 4.0 * np.pi) / (4.0 * np.pi) < 0.01


class TestComplexityMode:
    def test_complexity_pass(self):
        from tinsel_tpu.render.camera import CameraParams
        from tinsel_tpu.render.renderer import render_pass
        from tinsel_tpu.scene.presets import cornell_scene

        sc = cornell_scene(width=16, height=16, max_depth=2)
        img = render_pass(
            sc.flatten(),
            CameraParams.from_host(sc.camera),
            jax.random.key(0),
            width=16,
            height=16,
            max_depth=2,
            mode="complexity",
        )
        a = np.asarray(img)
        assert a.shape == (16, 16, 4)
        assert np.isfinite(a).all()
        assert a[..., :3].max() > 0  # non-empty heat map


class TestBsdfVis:
    def test_harness_writes_pfm(self, tmp_path):
        from tinsel_tpu.diag.bsdf_vis import bsdf_test
        from tinsel_tpu.io.hdr import load_pfm
        from tinsel_tpu.scene.model import Material

        path = str(tmp_path / "bsdf.pfm")
        img = bsdf_test(
            Material(
                color=np.array([0.7, 0.5, 0.3], np.float32), roughness=0.4
            ),
            width=32,
            height=16,
            n_samples=64,
            pfm_path=path,
        )
        assert img.shape == (16, 32, 3)
        assert np.isfinite(img).all()
        # scatter marks present (pure green pixels)
        assert (img[..., 1] == 10.0).any()
        assert load_pfm(path).shape == (16, 32, 3)


@pytest.mark.slow
def test_stratified_sampler_reduces_variance():
    """Options.sampler='stratified' wires the QMC kit the reference ships
    disabled (sampler.h:6-45 behind USE_RANDOM 1): at equal spp the
    stratified pass must have lower pixel variance than uniform jitter on
    a smooth scene, with an unbiased mean."""
    import dataclasses

    import jax
    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.render.renderer import render_pass

    scene = cornell_scene(width=24, height=24, max_depth=2)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)

    def run(sampler, seed):
        acc = render_pass(
            flat, cam, jax.random.key(seed), width=24, height=24,
            max_depth=2, samples_per_pass=16, sampler=sampler,
        )
        return np.asarray(acc[..., :3] / np.maximum(acc[..., 3:4], 1e-6))

    imgs_r = np.stack([run("random", s) for s in range(6)])
    imgs_s = np.stack([run("stratified", s) for s in range(6)])
    # unbiased: means agree
    np.testing.assert_allclose(
        imgs_r.mean(), imgs_s.mean(), rtol=0.05
    )
    # variance across seeds strictly improves on average
    var_r = imgs_r.var(axis=0).mean()
    var_s = imgs_s.var(axis=0).mean()
    assert var_s < var_r, (var_s, var_r)


def test_bluenoise_sampler_grid():
    """sampler='bluenoise' (sampler.h:80-131 + 216-226 wired): each pixel's
    spp sub-pixel positions are one shared blue-noise set under a per-pixel
    toroidal shift — within-pixel min distance beats random jitter, and the
    set is identical across pixels modulo the shift."""
    import jax
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.render.renderer import _sample_grid
    from tinsel_tpu.scene.model import Camera

    cam = CameraParams.from_host(Camera())
    spp, h, w = 16, 4, 5
    rx, ry, times = _sample_grid(w, h, cam, jax.random.key(7), spp,
                                 "bluenoise")
    assert rx.shape == (spp, h, w)
    jx = np.asarray(rx) - np.arange(w)[None, None, :]
    jy = np.asarray(ry) - np.arange(h)[None, :, None]
    assert (jx >= 0).all() and (jx <= 1).all()  # <=: f32 re-rounding at 1.0
    assert (jy >= 0).all() and (jy <= 1).all()

    def min_tor_dist(px, py):
        d = np.inf
        for i in range(spp):
            dx = np.abs(px - px[i])
            dy = np.abs(py - py[i])
            dx = np.minimum(dx, 1 - dx)
            dy = np.minimum(dy, 1 - dy)
            r2 = dx * dx + dy * dy
            r2[i] = np.inf
            d = min(d, r2.min())
        return np.sqrt(d)

    # blue noise: min-distance well above the random-jitter expectation
    d_bn = np.mean([min_tor_dist(jx[:, y, x], jy[:, y, x])
                    for y in range(h) for x in range(w)])
    rng = np.random.default_rng(0)
    d_rand = np.mean([min_tor_dist(rng.random(spp), rng.random(spp))
                      for _ in range(h * w)])
    assert d_bn > 2.0 * d_rand, (d_bn, d_rand)

    # same underlying set across pixels: pairwise toroidal deltas match
    def deltas(px, py):
        d = np.stack([(px - px[0]) % 1.0, (py - py[0]) % 1.0], -1)
        return np.sort(d, axis=0)

    ref = deltas(jx[:, 0, 0], jy[:, 0, 0])
    other = deltas(jx[:, 2, 3], jy[:, 2, 3])
    np.testing.assert_allclose(ref, other, atol=1e-5)
