"""Color conversion, tonemapping, and display transforms (pure JAX).

Capability parity with the reference's color utilities (maths.h:1450-1574)
and display chain (util.h:25-42 filmic ToneMap, main.cpp:260-270): luminance,
sRGB<->linear gamma-2.2, filmic curve, exposure/weight resolve.
"""

from __future__ import annotations

import jax.numpy as jnp

GAMMA = 2.2


def luminance(c):
    """Reference's luminance approximation: 0.3 R + 0.6 G + 0.1 B."""
    return 0.3 * c[..., 0] + 0.6 * c[..., 1] + 0.1 * c[..., 2]


def linear_to_srgb(c):
    return jnp.power(jnp.maximum(c, 0.0), 1.0 / GAMMA)


def srgb_to_linear(c):
    return jnp.power(jnp.maximum(c, 0.0), GAMMA)


def tonemap_filmic(c, limit=1.0):
    """Hejl/Burgess-Dawson filmic curve; output is then *linearized* so the
    final display gamma (linear_to_srgb) round-trips, matching the
    reference's ToneMap -> LinearToSrgb display chain."""
    x = jnp.maximum(0.0, c - 0.004)
    ret = (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    return srgb_to_linear(ret)


def tonemap_reinhard(c, limit=1.0):
    lum = luminance(c)
    return c / (1.0 + lum / limit)[..., None]


def resolve(accum, exposure=1.0, limit=1.0):
    """Resolve an RGBA accumulation buffer (premultiplied color, weight in
    alpha) to display-ready sRGB in [0,1]. accum: (..., 4)."""
    w = jnp.maximum(accum[..., 3:4], 1e-7)
    c = accum[..., :3] * (exposure / w)
    c = tonemap_filmic(c)
    return jnp.clip(linear_to_srgb(c), 0.0, 1.0)
