"""Lambert BRDF (lambert.h parity): uniform-hemisphere sampling, f = color/π.

Swappable alternative to the Disney BSDF for bisection/debugging, same
(eval, pdf, sample) signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import INV_2PI, INV_PI, dot
from ..core.sampling import uniform_sample_hemisphere
from .disney import REFLECTED


def bsdf_pdf(m, eta_i, eta_o, n, v, l):
    return jnp.where(dot(l, n) <= 0.0, 0.0, INV_2PI)


def bsdf_sample(m, eta_i, eta_o, u, v, n, view, key):
    shape = m.roughness.shape
    r1 = jax.random.uniform(jax.random.fold_in(key, 0), shape)
    r2 = jax.random.uniform(jax.random.fold_in(key, 1), shape)
    d = uniform_sample_hemisphere(r1, r2)
    light = u * d[..., 0:1] + v * d[..., 1:2] + n * d[..., 2:3]
    pdf = jnp.full(shape, INV_2PI, jnp.float32)
    event = jnp.full(shape, REFLECTED, jnp.int32)
    return light, pdf, event


def bsdf_eval(m, eta_i, eta_o, n, v, l):
    return INV_PI * m.color * jnp.ones_like(m.color)
