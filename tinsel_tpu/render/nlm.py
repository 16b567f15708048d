"""Non-local-means denoiser + box mean filter (nlm.cpp parity, differentiable).

Matches NonLocalMeansFilter (nlm.cpp:33-73): a box mean-filter pass, then a
weighted average over the (2r+1)^2 neighbourhood with weights
exp(-falloff * ||mean_p - mean_q||^2), computed in tonemapped space by the
app (main.cpp:273-277 applies it post-tonemap). Implemented as shift-stencil
gathers — pure elementwise VPU work, fully fusable and differentiable (the
denoiser is part of the gradient path per BASELINE.json).

Edge handling matches the reference: windows are clipped at the image
border (the mean divides by the count of valid taps, and NLM normalizes by
the sum of in-bounds weights).
"""

from __future__ import annotations

import jax.numpy as jnp

from .filters import _shift2d


def _valid_mask(h, w, dy, dx):
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    return (yy + dy >= 0) & (yy + dy < h) & (xx + dx >= 0) & (xx + dx < w)


def average_filter(img, radius: int = 1):
    """Box mean over a clipped (2r+1)^2 window. img: (H, W, C)."""
    h, w = img.shape[:2]
    acc = jnp.zeros_like(img)
    cnt = jnp.zeros((h, w), jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            m = _valid_mask(h, w, dy, dx)
            acc = acc + jnp.where(m[..., None], _shift2d(img, dy, dx), 0.0)
            cnt = cnt + m
    return acc / cnt[..., None]


def nlm_filter(img, falloff: float = 200.0, radius: int = 1):
    """Non-local means with mean-patch distances. img: (H, W, C) -> same."""
    h, w = img.shape[:2]
    means = average_filter(img, radius)
    acc = jnp.zeros_like(img)
    wsum = jnp.zeros((h, w), jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            m = _valid_mask(h, w, dy, dx)
            mq = _shift2d(means, dy, dx)
            d2 = jnp.sum((means - mq) ** 2, axis=-1)
            wgt = jnp.where(m, jnp.exp(-falloff * d2), 0.0)
            acc = acc + _shift2d(img, dy, dx) * wgt[..., None]
            wsum = wsum + wgt
    return acc / jnp.maximum(wsum, 1e-12)[..., None]


def nlm_guided(img, normal, albedo, depth, falloff: float = 200.0,
               radius: int = 2, f_normal: float = 8.0, f_albedo: float = 50.0,
               f_depth: float = 1.0):
    """Joint (guided) non-local means: weights combine the color-patch
    distance with NORMAL / ALBEDO / DEPTH guide distances from the AOV
    passes (render/aov.py) — an extension over the reference's color-only
    NLM (nlm.cpp:33-73) that keeps geometric and texture edges crisp at
    much stronger smoothing. Depth distance is relative (scale-free).

    img: (H, W, 3) tonemapped; normal (H, W, 3); albedo (H, W, 3);
    depth (H, W, 1). Differentiable w.r.t. img like nlm_filter.
    """
    h, w = img.shape[:2]
    means = average_filter(img, 1)
    dmax = jnp.maximum(jnp.max(depth), 1e-6)
    dn = depth / dmax
    acc = jnp.zeros_like(img)
    wsum = jnp.zeros((h, w), jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            m = _valid_mask(h, w, dy, dx)
            d2 = jnp.sum((means - _shift2d(means, dy, dx)) ** 2, axis=-1)
            g2 = (
                f_normal * jnp.sum(
                    (normal - _shift2d(normal, dy, dx)) ** 2, axis=-1
                )
                + f_albedo * jnp.sum(
                    (albedo - _shift2d(albedo, dy, dx)) ** 2, axis=-1
                )
                + f_depth * jnp.sum(
                    (dn - _shift2d(dn, dy, dx)) ** 2, axis=-1
                )
            )
            wgt = jnp.where(m, jnp.exp(-falloff * d2 - g2), 0.0)
            acc = acc + _shift2d(img, dy, dx) * wgt[..., None]
            wsum = wsum + wgt
    return acc / jnp.maximum(wsum, 1e-12)[..., None]
