"""Blinn microfacet BRDF (blinn.h parity): Blinn NDF with exponent
10/roughness, Schlick Fresnel on the base color, Torrance-Sparrow geometric
term. Swappable alternative lobe set with the same (eval, pdf, sample) API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import INV_2PI, PI, TWO_PI, dot, normalize
from .disney import REFLECTED

_EPS = 1e-6


def _exponent(m):
    return 10.0 / jnp.maximum(m.roughness, 1e-3)


def _schlick_color(c, cos_theta):
    return c + (1.0 - c) * jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)[..., None]


def bsdf_pdf(m, eta_i, eta_o, n, v, l):
    e = _exponent(m)
    h = normalize(v + l)
    cos_theta = jnp.abs(dot(h, n))
    pdf = ((e + 1.0) * jnp.power(cos_theta, e)) / (
        2.0 * PI * 4.0 * jnp.maximum(jnp.abs(dot(v, h)), _EPS)
    )
    return jnp.where(dot(l, n) <= 0.0, 0.0, pdf)


def bsdf_sample(m, eta_i, eta_o, u, v, n, view, key):
    shape = m.roughness.shape
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), shape)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), shape)
    e = _exponent(m)
    cos_t = jnp.power(u1, 1.0 / (e + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = u2 * TWO_PI
    h = (
        u * (sin_t * jnp.cos(phi))[..., None]
        + v * (sin_t * jnp.sin(phi))[..., None]
        + n * cos_t[..., None]
    )
    h = h * jnp.where(dot(view, h) < 0.0, -1.0, 1.0)[..., None]
    light = -view + 2.0 * dot(view, h)[..., None] * h
    pdf = bsdf_pdf(m, eta_i, eta_o, n, view, light)
    return light, pdf, jnp.full(shape, REFLECTED, jnp.int32)


def bsdf_eval(m, eta_i, eta_o, n, v, l):
    e = _exponent(m)
    wh = normalize(v + l)
    n_dot_wh = jnp.abs(dot(wh, n))
    n_dot_wo = jnp.abs(dot(v, n))
    n_dot_wi = jnp.abs(dot(l, n))
    wo_dot_wh = jnp.maximum(jnp.abs(dot(v, wh)), _EPS)

    f = _schlick_color(m.color, wo_dot_wh)
    g = jnp.minimum(
        1.0,
        jnp.minimum(
            2.0 * n_dot_wh * n_dot_wo / wo_dot_wh,
            2.0 * n_dot_wh * n_dot_wi / wo_dot_wh,
        ),
    )
    d = (e + 2.0) * INV_2PI * jnp.power(n_dot_wh, e)
    return f * (d * g / (4.0 * n_dot_wi * n_dot_wo + 1e-4))[..., None]
