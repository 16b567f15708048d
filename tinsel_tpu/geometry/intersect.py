"""Ray-primitive intersection, branchless and batched.

TPU-first re-expression of intersection.h: every test returns a (hit, t, ...)
tuple of arrays instead of a bool + out-params, so the same code runs for one
ray or a (N,) batch and fuses onto the VPU. Misses are encoded as hit=False
with t = +inf — downstream code takes masked minima, mirroring the closest-hit
logic in intersection.h:678-749 / render.cpp:17-99 without branches.

Parity targets: SolveQuadratic (intersection.h:30-53), IntersectRaySphere
(intersection.h:59-83), IntersectRayPlane (intersection.h:85-99),
IntersectRayTriTwoSided Möller-Trumbore (intersection.h:117-145),
IntersectRayAABBFast slab test (intersection.h:373-397).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import dot

INF = float("inf")  # Python literal: an import-time device scalar closed
# over in jit hits a catastrophic constant path on TPU (measured 3000x)


def intersect_ray_sphere(center, radius, origin, direction):
    """Numerically-stable quadratic sphere test (Numerical Recipes 5.6 form).

    Returns (hit, t, normal). Rays starting inside hit the far root, matching
    the reference's min/max-root selection.
    """
    q = origin - center
    b = 2.0 * dot(q, direction)
    c = dot(q, q) - radius * radius
    disc = b * b - 4.0 * c  # a == 1 for normalized directions
    has_root = disc >= 0.0
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 1e-12))
    sign_b = jnp.where(b >= 0.0, 1.0, -1.0)
    tq = -0.5 * (b + sign_b * sqrt_disc)
    t0 = tq  # / a, a == 1
    t1 = c / jnp.where(jnp.abs(tq) > 1e-30, tq, 1e-30)
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    # if the near root is behind the origin use the far root (inside sphere)
    t = jnp.where(tmin < 0.0, tmax, tmin)
    hit = has_root & (t > 0.0)
    # normal from a finite t only — an inf hit point in the dead branch of a
    # downstream jnp.where would poison gradients (0 * inf = NaN)
    t_fin = jnp.where(hit, t, 0.0)
    p = origin + direction * t_fin[..., None]
    normal = (p - center) / jnp.maximum(radius, 1e-30)[..., None]
    t = jnp.where(hit, t, INF)
    return hit, t, normal


def intersect_ray_plane(plane, origin, direction):
    """Infinite plane a x + b y + c z + d = 0. Returns (hit, t, normal)."""
    n = plane[..., :3]
    d = dot(n, direction)
    num = -(dot(n, origin) + plane[..., 3])
    t = num / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    hit = (jnp.abs(d) > 1e-30) & (t > 0.0)
    t = jnp.where(hit, t, INF)
    # n broadcast against the full batched result shape (plane and ray
    # batch dims may both be present)
    return hit, t, jnp.broadcast_to(n, t.shape + (3,))


def intersect_ray_tri(a, b, c, origin, direction):
    """Two-sided Möller-Trumbore. Returns (hit, t, u, v, w, n_geo).

    n_geo is the (unnormalized) geometric normal already flipped to the side
    the ray arrives from (the reference's `n * sign` convention,
    intersection.h:648-658).
    """
    ab = b - a
    ac = c - a
    n = jnp.cross(ab, ac)
    d = dot(-direction, n)
    ood = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    ap = origin - a
    t = dot(ap, n) * ood
    e = jnp.cross(-direction, ap)
    v = dot(ac, e) * ood
    w = -dot(ab, e) * ood
    u = 1.0 - v - w
    hit = (
        (jnp.abs(d) > 1e-30)
        & (t > 0.0)
        & (v >= 0.0)
        & (v <= 1.0)
        & (w >= 0.0)
        & (v + w <= 1.0)
    )
    t = jnp.where(hit, t, INF)
    n_signed = n * jnp.where(d >= 0.0, 1.0, -1.0)[..., None]
    return hit, t, u, v, w, n_signed


def intersect_ray_aabb(lower, upper, origin, rcp_direction):
    """Slab test with precomputed reciprocal directions.

    Returns (hit, t_near). Relies on IEEE inf arithmetic for axis-parallel
    rays exactly like the reference's fast path.
    """
    l1 = (lower - origin) * rcp_direction
    l2 = (upper - origin) * rcp_direction
    lmin = jnp.max(jnp.minimum(l1, l2), axis=-1)
    lmax = jnp.min(jnp.maximum(l1, l2), axis=-1)
    hit = (lmax >= 0.0) & (lmax >= lmin)
    return hit, lmin


def triangle_area(a, b, c):
    return 0.5 * jnp.sqrt(
        jnp.maximum(jnp.sum(jnp.cross(b - a, c - a) ** 2, axis=-1), 0.0)
    )
