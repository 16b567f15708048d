"""Preetham/Perez analytic daylight model.

Parity target: the reference's Perez sky-luminance model (skylight.h:6-95
``SkyDistribution`` / ``SkyLuminance`` / ``SkyLight``) — an analytic clear-sky
radiance as a function of view direction, sun direction, and atmospheric
turbidity, evaluated in Yxy chromaticity space and converted to linear RGB.
The coefficient tables are the published Preetham et al. 1999 values
("A Practical Analytic Model for Daylight").

TPU-first shape: everything is vectorized over direction batches — one fused
VPU evaluation per ray instead of the reference's scalar per-call math — and
fully differentiable w.r.t. sun position and turbidity.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.color import xyz_to_linear_rgb, yxy_to_xyz

# Perez coefficients (A..E) as linear functions of turbidity T: value = m*T + b
# rows: A, B, C, D, E; columns: (m, b).  Preetham et al. 1999, Table A.1.
_PEREZ_x = np.array(
    [[-0.0193, -0.2592],
     [-0.0665, 0.0008],
     [-0.0004, 0.2125],
     [-0.0641, -0.8989],
     [-0.0033, 0.0452]],
    np.float32,
)
_PEREZ_y = np.array(
    [[-0.0167, -0.2608],
     [-0.0950, 0.0092],
     [-0.0079, 0.2102],
     [-0.0441, -1.6537],
     [-0.0109, 0.0529]],
    np.float32,
)
_PEREZ_Y = np.array(
    [[0.1787, -1.4630],
     [-0.3554, 0.4275],
     [-0.0227, 5.3251],
     [0.1206, -2.5771],
     [-0.0670, 0.3703]],
    np.float32,
)

# Zenith chromaticity: x/y are cubic-in-sunTheta dotted with quadratic-in-T.
# Preetham et al. 1999, eq. (8)-(9).
_ZENITH_x = np.array(
    [[0.00166, -0.00375, 0.00209, 0.0],
     [-0.02903, 0.06377, -0.03202, 0.00394],
     [0.11693, -0.21196, 0.06052, 0.25886]],
    np.float32,
)
_ZENITH_y = np.array(
    [[0.00275, -0.00610, 0.00317, 0.0],
     [-0.04214, 0.08970, -0.04153, 0.00516],
     [0.15346, -0.26756, 0.06670, 0.26688]],
    np.float32,
)


def _perez(cos_theta, gamma, cos_gamma, coeffs):
    a, b, c, d, e = coeffs
    return (1.0 + a * jnp.exp(b / jnp.maximum(cos_theta, 1e-4))) * (
        1.0 + c * jnp.exp(d * gamma) + e * cos_gamma * cos_gamma
    )


def sky_radiance(theta, phi, sun_theta, sun_phi, turbidity=2.5):
    """Yxy-space Perez sky evaluated at view angles (theta from zenith, phi
    azimuth), returned as linear RGB. All angle args broadcast.

    Matches the reference contract (skylight.h:25-95 SkyLight): clamp theta
    just below the horizon, luminance normalized by the zenith value.
    """
    t = jnp.asarray(turbidity, jnp.float32)
    theta = jnp.clip(theta, 0.0, jnp.pi * 0.5 - 1e-6)
    cos_theta = jnp.cos(theta)
    cos_sun = jnp.cos(sun_theta)
    sin_sun = jnp.sin(sun_theta)

    # arc length between view direction and sun
    cg = jnp.clip(
        cos_sun * cos_theta
        + sin_sun * jnp.sin(theta) * jnp.cos(jnp.abs(phi - sun_phi)),
        -1.0,
        1.0,
    )
    gamma = jnp.arccos(cg)

    # zenith values
    chi = (4.0 / 9.0 - t / 120.0) * (jnp.pi - 2.0 * sun_theta)
    zen_Y = (4.0453 * t - 4.9710) * jnp.tan(chi) - 0.2155 * t + 2.4192  # kcd/m^2
    tv = jnp.stack([t * t, t, jnp.ones_like(t)])
    sv = jnp.stack(
        [sun_theta**3, sun_theta**2, sun_theta, jnp.ones_like(sun_theta)]
    )
    zen_x = tv @ _ZENITH_x @ sv
    zen_y = tv @ _ZENITH_y @ sv

    def lum(zen, table):
        coeffs = table[:, 0] * t + table[:, 1]
        num = _perez(cos_theta, gamma, cg, coeffs)
        den = _perez(jnp.float32(1.0), sun_theta, cos_sun, coeffs)
        return zen * num / jnp.maximum(den, 1e-9)

    x = lum(zen_x, _PEREZ_x)
    y = lum(zen_y, _PEREZ_y)
    Y = lum(zen_Y, _PEREZ_Y)

    xyz = yxy_to_xyz(Y, x, y)
    return jnp.maximum(xyz_to_linear_rgb(xyz), 0.0)


def sky_radiance_dir(dirs, sun_dir, turbidity=2.5):
    """Evaluate the Perez sky for (..., 3) direction batches (y-up world,
    matching the gradient sky convention in scene.h:168-180)."""
    d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    s = sun_dir / jnp.linalg.norm(sun_dir, axis=-1)
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    sun_theta = jnp.arccos(jnp.clip(s[1], -1.0, 1.0))
    sun_phi = jnp.arctan2(s[2], s[0])
    return sky_radiance(theta, phi, sun_theta, sun_phi, turbidity)
