"""Monte-Carlo sampling primitives and counter-based RNG.

TPU-first replacement for the reference's stateful xorshift `Random`
(maths.h:1040-1052) and Sample1D/2D (sampler.h:238-289): we use JAX's
counter-based threefry keys. Each pixel-sample owns a base key; every draw in
the integrator derives a fresh subkey with `fold_in`, so the stream is
deterministic, parallel, and replayable — no mutable state.

Geometric samplers mirror maths.h:1278-1332 (uniform sphere/hemisphere/disc/
triangle, cosine hemisphere) as pure vectorized functions of uniforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import PI, TWO_PI


def uniform_sample_sphere(u1, u2):
    """Uniform direction on the unit sphere from two uniforms."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_hemisphere(u1, u2):
    """Uniform direction on the +z hemisphere (local frame)."""
    z = u1
    w = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([jnp.cos(phi) * w, jnp.sin(phi) * w, z], axis=-1)


def uniform_sample_disc(u1, u2):
    r = jnp.sqrt(u1)
    theta = TWO_PI * u2
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def cosine_sample_hemisphere(u1, u2):
    """Cosine-weighted direction on the +z hemisphere (pdf = cosθ/π)."""
    s = uniform_sample_disc(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - s[..., 0] ** 2 - s[..., 1] ** 2))
    return jnp.stack([s[..., 0], s[..., 1], z], axis=-1)


def uniform_sample_triangle(u1, u2):
    """Uniform barycentric (u, v) on a triangle."""
    r = jnp.sqrt(u1)
    return 1.0 - r, u2 * r


def stratified_offsets_2d(n_x: int, n_y: int, key):
    """Jittered-stratified sample positions in [0,1)^2, shape (n_x*n_y, 2)."""
    jit = jax.random.uniform(key, (n_x * n_y, 2))
    ix = jnp.arange(n_x * n_y) % n_x
    iy = jnp.arange(n_x * n_y) // n_x
    grid = jnp.stack([ix, iy], axis=-1).astype(jnp.float32)
    scale = jnp.asarray([1.0 / n_x, 1.0 / n_y], jnp.float32)
    return (grid + jit) * scale


def fold_key(key, *ids):
    """Derive a subkey by folding in one or more static/traced ints."""
    for i in ids:
        key = jax.random.fold_in(key, i)
    return key


def uniforms(key, n, shape=()):
    """Draw n independent uniform arrays of the given shape from one key."""
    return [
        jax.random.uniform(jax.random.fold_in(key, i), shape) for i in range(n)
    ]
