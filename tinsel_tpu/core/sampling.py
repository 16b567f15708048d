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


def stratified_offsets_1d(n: int, key):
    """Jittered-stratified samples in [0,1), shape (n,) (sampler.h:6-24)."""
    jit = jax.random.uniform(key, (n,))
    return (jnp.arange(n, dtype=jnp.float32) + jit) / n


def _toroidal_dist2(p, q):
    """Squared toroidal distance between point sets p (..., D) and q (..., D)."""
    d = jnp.abs(p - q)
    d = jnp.minimum(d, 1.0 - d)
    return jnp.sum(d * d, axis=-1)


def best_candidate_2d(n: int, key, candidates_per_point: int = 32):
    """Best-candidate (Mitchell) blue-noise point set in [0,1)^2.

    Capability parity with the reference's blue-noise generator
    (sampler.h:80-131), rebuilt as a lax.scan with vectorized candidate
    scoring instead of the O(n^2) scalar loops: each step draws k candidates
    and keeps the one maximizing the min toroidal distance to all accepted
    points (masked — unfilled slots contribute +inf).
    """
    k = candidates_per_point

    pts0 = jnp.zeros((n, 2), jnp.float32)
    first = jax.random.uniform(fold_key(key, 0), (2,))
    pts0 = pts0.at[0].set(first)

    def step(pts, i):
        cand = jax.random.uniform(fold_key(key, i), (k, 2))
        # (k, n) toroidal distances to accepted points; mask unfilled slots
        d2 = _toroidal_dist2(cand[:, None, :], pts[None, :, :])
        filled = jnp.arange(n) < i
        d2 = jnp.where(filled[None, :], d2, jnp.inf)
        score = jnp.min(d2, axis=1)  # (k,)
        best = cand[jnp.argmax(score)]
        return pts.at[i].set(best), None

    pts, _ = jax.lax.scan(step, pts0, jnp.arange(1, n))
    return pts


def best_candidate_projective_2d(n: int, key, candidates_per_point: int = 32,
                                 axis_weight: float | None = None):
    """Projective blue noise (sampler.h:133-214): candidates are scored by
    the min of the 2D toroidal distance AND each 1D axis projection distance
    (scaled so all three terms are commensurate), giving point sets that are
    well-distributed in 2D and in both 1D projections."""
    k = candidates_per_point
    # scale 1D distances by n (1D spacing ~1/n vs 2D spacing ~1/sqrt(n))
    w1 = axis_weight if axis_weight is not None else float(n) ** 0.5

    pts0 = jnp.zeros((n, 2), jnp.float32)
    pts0 = pts0.at[0].set(jax.random.uniform(fold_key(key, 0), (2,)))

    def step(pts, i):
        cand = jax.random.uniform(fold_key(key, i), (k, 2))
        filled = jnp.arange(n) < i
        d2 = _toroidal_dist2(cand[:, None, :], pts[None, :, :])
        dx = _toroidal_dist2(cand[:, None, :1], pts[None, :, :1]) * (w1 * w1)
        dy = _toroidal_dist2(cand[:, None, 1:], pts[None, :, 1:]) * (w1 * w1)
        d2 = jnp.minimum(d2, jnp.minimum(dx, dy))
        d2 = jnp.where(filled[None, :], d2, jnp.inf)
        best = cand[jnp.argmax(jnp.min(d2, axis=1))]
        return pts.at[i].set(best), None

    pts, _ = jax.lax.scan(step, pts0, jnp.arange(1, n))
    return pts


def toroidal_shift(points, key):
    """Cranley-Patterson rotation: shift a point set by a random offset mod 1
    (sampler.h:216-226) — decorrelates a shared pattern across pixels."""
    off = jax.random.uniform(key, (points.shape[-1],))
    return (points + off) % 1.0


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
