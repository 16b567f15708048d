"""Closed-form validation of the light-sampling math — the reference keeps
an 8-line Octave double integral for this (src/sphereplane.m); here it's an
executable test.

For a Lambertian plane point directly below a sphere light (radius R,
center distance d, radiance L), the reflected radiance has the closed form

    L_out = albedo * L * (R/d)^2

(irradiance E = L * pi * sin^2(theta_max) with sin(theta_max) = R/d, times
albedo/pi). The renderer's NEE estimate at depth 1 must converge to it."""

import numpy as np

import jax
import jax.numpy as jnp


def test_sphere_light_over_plane_matches_closed_form():
    from tinsel_tpu.scene.model import (
        Material,
        Primitive,
        Scene,
        HostTransform,
        SPHERE,
        PLANE,
    )
    from tinsel_tpu.render.integrator import path_trace

    emission = 5.0
    albedo = 0.6
    radius = 0.5
    d = 2.0

    scene = Scene()
    scene.add_primitive(
        Primitive(
            type=PLANE,
            plane=np.array([0, 1, 0, 0], np.float32),
            material=Material(
                color=np.array([albedo] * 3, np.float32),
                roughness=1.0,
                specular=0.0,
                metallic=0.0,
            ),
        )
    )
    scene.add_primitive(
        Primitive(
            type=SPHERE,
            radius=radius,
            start_transform=HostTransform(p=np.array([0, d, 0], np.float32)),
            material=Material(
                emission=np.array([emission] * 3, np.float32),
                color=np.zeros(3, np.float32),
            ),
            light_samples=1,
        )
    )
    flat = scene.flatten()

    # many estimates of the radiance leaving the plane point under the light
    n = 8192
    origins = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    dirs = jnp.tile(
        jnp.array([[0.0, -1.0, 0.0]], jnp.float32), (n, 1)
    )  # straight down at the origin
    times = jnp.zeros((n,), jnp.float32)
    # depth 2: MIS splits direct light between the NEE estimate (depth 1)
    # and BSDF rays that hit the light (depth 2); both shares must be in
    rad = path_trace(flat, origins, dirs, times, max_depth=2,
                     key=jax.random.key(7))
    est = float(jnp.mean(rad[:, 0]))

    # the diffuse lobe of the Disney BRDF at normal incidence includes the
    # Schlick retro-reflection factor; for roughness 1 it reduces to
    # albedo/pi * (1 + (Fd90-1)(1-cos)^5)^2-ish ~ albedo/pi near normal.
    expected = albedo * emission * (radius / d) ** 2
    assert abs(est - expected) / expected < 0.08, (est, expected)


def test_furnace_constant_sky_depth1_half_albedo():
    """Depth-1 white-furnace identity: under constant sky L with NEE off
    (probe-less gradient sky is sampled only by BSDF rays at depth 1's
    miss), a diffuse surface's depth-2 render must not exceed sky * (a0 +
    a0^2 + ...) — sanity ceiling for energy conservation."""
    from tinsel_tpu.scene.model import Material, Primitive, Scene, Sky, SPHERE
    from tinsel_tpu.render.integrator import path_trace

    a0 = 0.7
    scene = Scene()
    scene.sky = Sky(
        horizon=np.array([1.0, 1.0, 1.0], np.float32),
        zenith=np.array([1.0, 1.0, 1.0], np.float32),
    )
    scene.add_primitive(
        Primitive(
            type=SPHERE,
            radius=1.0,
            material=Material(
                color=np.array([a0] * 3, np.float32),
                roughness=1.0,
                specular=0.0,
            ),
        )
    )
    flat = scene.flatten()
    n = 4096
    origins = jnp.tile(jnp.array([[0.0, 0.0, -3.0]], jnp.float32), (n, 1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    times = jnp.zeros((n,), jnp.float32)
    rad = path_trace(flat, origins, dirs, times, max_depth=3,
                     key=jax.random.key(11))
    est = float(jnp.mean(rad[:, 1]))
    ceiling = a0 + a0**2 + a0**3  # truncated geometric series of the sky
    assert 0.5 * a0 < est <= ceiling * 1.05, (est, ceiling)
