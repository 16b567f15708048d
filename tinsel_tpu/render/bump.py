"""Procedural Perlin bump mapping — the working version of the feature the
reference declares but never evaluates (scene.h:97-99 bump/bumpTile,
render.cu:588 EvaluateBumpNormal is never called, loader.cpp:198-228 keeps
the bump-map build commented out).

TPU-native shape: instead of baking a 128^3 Perlin texture and trilinearly
sampling it (the commented reference path), fractal gradient noise is
evaluated directly at the shading point. The lattice hash is a
multiplicative integer mix instead of Perlin's permutation table — a
per-lane table gather inside the bounce loop is exactly the access
pattern this runtime punishes (see CLAUDE.md rule 3), while the hash is
pure elementwise VPU math with zero memory traffic. Same smoothstep
interpolation and 12-gradient set as classic Perlin, so the field has the
same character; the pattern differs from utils/perlin.py's table-hashed
host version (documented deviation — bump is an extension, there is no
reference image to match).

Semantics mirror EvaluateBumpNormal: the height field is sampled at
`tile * p`, tangent vectors are displaced along the surface normal by
forward differences, and the bumped normal is their cross product.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import basis_from_vector, cross, normalize

_EPS = 1e-3  # forward-difference step in world units (render.cu:592 eps)


def _hash3(ix, iy, iz):
    """3D lattice hash (uint32 multiplicative mix) -> uint32."""
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + iy.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        + iz.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
    )
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    return h


def _grad3(h, x, y, z):
    """Perlin's 12-gradient dot product, branchless (h: low 4 hash bits)."""
    h = (h & jnp.uint32(15)).astype(jnp.int32)
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return jnp.where(h & 1, -u, u) + jnp.where(h & 2, -v, v)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def gradient_noise3(x, y, z):
    """Hash-lattice gradient noise in roughly [-1, 1]; jit/vmap friendly."""
    xi = jnp.floor(x)
    yi = jnp.floor(y)
    zi = jnp.floor(z)
    xf, yf, zf = x - xi, y - yi, z - zi
    xi = xi.astype(jnp.int32)
    yi = yi.astype(jnp.int32)
    zi = zi.astype(jnp.int32)
    u, v, w = _fade(xf), _fade(yf), _fade(zf)

    def corner(dx, dy, dz):
        h = _hash3(xi + dx, yi + dy, zi + dz)
        return _grad3(h, xf - dx, yf - dy, zf - dz)

    def lerp(a, b, t):
        return a + t * (b - a)

    x00 = lerp(corner(0, 0, 0), corner(1, 0, 0), u)
    x10 = lerp(corner(0, 1, 0), corner(1, 1, 0), u)
    x01 = lerp(corner(0, 0, 1), corner(1, 0, 1), u)
    x11 = lerp(corner(0, 1, 1), corner(1, 1, 1), u)
    return lerp(lerp(x00, x10, v), lerp(x01, x11, v), w)


def fractal_noise3(x, y, z, octaves: int = 3, persistence: float = 0.5):
    """fBm over gradient_noise3 (octaves/persistence match the reference's
    commented bump-map bake, loader.cpp:215)."""
    out = 0.0
    amp = 1.0
    freq = 1.0
    total = 0.0
    for _ in range(octaves):
        out = out + amp * gradient_noise3(x * freq, y * freq, z * freq)
        total += amp
        amp *= persistence
        freq *= 2.0
    return out / total


def bump_normal(n, p, strength, tile):
    """Perturb shading normals by the procedural height field.

    n: (R, 3) unit normals; p: (R, 3) hit points; strength/tile: (R,)
    per-lane material values. Lanes with strength == 0 return n exactly
    (bit-equal, so mixed-material batches leave unbumped lanes untouched).
    """
    u_ax, v_ax = basis_from_vector(n)

    def h(q):
        x = q * tile[..., None]
        return fractal_noise3(x[..., 0], x[..., 1], x[..., 2])

    h0 = h(p)
    du = (h(p + u_ax * _EPS) - h0) / _EPS
    dv = (h(p + v_ax * _EPS) - h0) / _EPS
    dpdu = u_ax + (strength * du)[..., None] * n
    dpdv = v_ax + (strength * dv)[..., None] * n
    nb = normalize(cross(dpdu, dpdv))
    return jnp.where((strength > 0.0)[..., None], nb, n)
