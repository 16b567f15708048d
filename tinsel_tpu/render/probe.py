"""HDR environment probe: lat-long mapping, evaluation, CDF importance
sampling, and pdf — batched pure JAX.

Parity with probe.h: dir<->UV lat-long mapping (probe.h:105-125), nearest
texel eval (probe.h:128-134), pdf with the w*h/(2π² sinθ) Jacobian
(probe.h:136-160), and 2D-CDF importance sampling via two binary searches
(probe.h:205-236). The searches run as fixed-trip-count vectorized bisection
(one gathered element per lane per step) instead of the reference's scalar
LowerBound — log2(W) gathers per ray, fully lockstep.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.math import INV_PI, PI, TWO_PI


def probe_dir_to_uv(d):
    """World direction -> lat-long UV (y-up)."""
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.where(
        (d[..., 0] == 0.0) & (d[..., 2] == 0.0),
        0.0,
        jnp.arctan2(d[..., 2], d[..., 0]),
    )
    u = (PI + phi) * INV_PI * 0.5
    v = theta * INV_PI
    return jnp.stack([u, v], axis=-1)


def probe_uv_to_dir(uv):
    theta = uv[..., 1] * PI
    phi = uv[..., 0] * TWO_PI
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [-sin_t * jnp.cos(phi), jnp.cos(theta), -sin_t * jnp.sin(phi)], axis=-1
    )


def probe_eval_uv(probe, uv):
    """Nearest-texel radiance lookup. probe: ProbeFlat; uv (..., 2)."""
    h, w = probe.data.shape[:2]
    px = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    py = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return probe.data[py, px]


def probe_eval_dir(probe, d):
    return probe_eval_uv(probe, probe_dir_to_uv(d))


def probe_pdf(probe, d):
    """Solid-angle pdf that `probe_sample` generates direction d."""
    h, w = probe.data.shape[:2]
    uv = probe_dir_to_uv(d)
    col = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    pdf = probe.pdf_x[row, col] * probe.pdf_y[row]
    sin_theta = jnp.sin(uv[..., 1] * PI)
    jac = (w * h) / (2.0 * PI * PI * jnp.maximum(jnp.abs(sin_theta), 1e-6))
    return jnp.where(jnp.abs(sin_theta) < 1e-4, 0.0, pdf * jac)


from ..core.search import lower_bound as _lower_bound


def probe_sample_uniforms(probe, r1, r2):
    """Importance-sample the probe given uniforms r1, r2 (any batch shape).

    Returns (dir (...,3), color (...,3), pdf (...,)).
    """
    h, w = probe.data.shape[:2]
    row = _lower_bound(probe.cdf_y, jnp.zeros_like(r1, jnp.int32), h, r1)
    row = jnp.clip(row, 0, h - 1)
    cdf_x_flat = probe.cdf_x.reshape(-1)
    col = _lower_bound(cdf_x_flat, row * w, w, r2) - row * w
    col = jnp.clip(col, 0, w - 1)

    color = probe.data[row, col]
    pdf = probe.pdf_x[row, col] * probe.pdf_y[row]

    u = col.astype(jnp.float32) / w
    v = row.astype(jnp.float32) / h
    sin_theta = jnp.sin(v * PI)
    jac = (w * h) / (2.0 * PI * PI * jnp.maximum(sin_theta, 1e-6))
    pdf = jnp.where(sin_theta == 0.0, 0.0, pdf * jac)

    d = probe_uv_to_dir(jnp.stack([u, v], axis=-1))
    return d, color, pdf


def sky_eval(scene, d):
    """Sky radiance for escaped rays: probe if present, else the
    horizon->zenith gradient on sqrt(|dir.y|) (scene.h:168-180)."""
    if scene.probe is not None:
        return probe_eval_dir(scene.probe, d)
    t = jnp.sqrt(jnp.abs(d[..., 1]))[..., None]
    return scene.sky_horizon + (scene.sky_zenith - scene.sky_horizon) * t
