"""Color conversion, tonemapping, and display transforms (pure JAX).

Capability parity with the reference's color utilities (maths.h:1450-1574)
and display chain (util.h:25-42 filmic ToneMap, main.cpp:260-270): luminance,
sRGB<->linear gamma-2.2, filmic curve, exposure/weight resolve.
"""

from __future__ import annotations

import numpy as np

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


def yxy_to_xyz(Y, x, y):
    """CIE Yxy -> XYZ (maths.h Yxy/XYZ converters). Broadcasts; returns
    (..., 3)."""
    y = jnp.maximum(y, 1e-6)
    X = x * (Y / y)
    Z = (1.0 - x - y) * (Y / y)
    return jnp.stack([X, Y, Z], axis=-1)


# sRGB D65 primaries (linear RGB), standard matrix
_XYZ_TO_RGB = np.array(
    [[3.2404542, -1.5371385, -0.4985314],
     [-0.9692660, 1.8760108, 0.0415560],
     [0.0556434, -0.2040259, 1.0572252]],
    np.float32,
)


def xyz_to_linear_rgb(xyz):
    """CIE XYZ -> linear sRGB. xyz: (..., 3)."""
    return xyz @ _XYZ_TO_RGB.T


def hsv_to_rgb(h, s, v):
    """HSV -> RGB (maths.h HSVToRGB parity), broadcasting, h in [0,1)."""
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def tonemap_reinhard(c, limit=1.0):
    lum = luminance(c)
    return c / (1.0 + lum / limit)[..., None]


def resolve(accum, exposure=1.0, limit=1.0, tonemap="filmic"):
    """Resolve an RGBA accumulation buffer (premultiplied color, weight in
    alpha) to display-ready sRGB in [0,1]. accum: (..., 4).

    tonemap: "filmic" (Hejl/Burgess, the reference's display chain,
    util.h:25-42 — its own `limit` parameter is dead there too) or
    "reinhard", where `limit` sets the luminance shoulder — the path that
    actually consumes the scene's options.limit."""
    w = jnp.maximum(accum[..., 3:4], 1e-7)
    c = accum[..., :3] * (exposure / w)
    if tonemap == "reinhard":
        c = tonemap_reinhard(c, limit)
    else:
        c = tonemap_filmic(c)
    return jnp.clip(linear_to_srgb(c), 0.0, 1.0)
