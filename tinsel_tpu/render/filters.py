"""Reconstruction filtering as a gather stencil (no scatter, no atomics).

The reference splats each sample into neighbouring pixels with atomicAdd
(render.cu:914-919) or serial accumulation (render.cpp:401-445). On TPU,
scatter is the wrong primitive: because the renderer draws exactly one
sample per pixel per pass, the splat is re-expressed as its transpose — each
output pixel *gathers* the weighted contributions of the samples generated
in its (2K+1)² neighbourhood. That is a shift-and-multiply stencil: pure
vectorized elementwise work that XLA fuses, with zero write conflicts.

Filter semantics match render.h:13-39: box (weight 1 inside the footprint)
and truncated Gaussian exp(-falloff x²) - exp(-falloff w²), with the
reference's int-truncation footprint bounds (render.cpp:407-410).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _shift2d(a, dy: int, dx: int):
    """Shift a (H, W, ...) array so out[y, x] = a[y+dy, x+dx]; zero-pad."""
    pad = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))] + [(0, 0)] * (
        a.ndim - 2
    )
    ap = jnp.pad(a, pad)
    h, w = a.shape[:2]
    y0 = max(0, -dy) + dy
    x0 = max(0, -dx) + dx
    return ap[y0 : y0 + h, x0 : x0 + w]


def splat(sample_rgb, raster_x, raster_y, filter_type: str, filter_width: float,
          filter_falloff: float):
    """Accumulate one sample-per-pixel pass into an (H, W, 4) RGBA buffer
    (premultiplied color, weight in alpha).

    sample_rgb: (H, W, 3) radiance of the sample generated at pixel (y, x);
    raster_x/raster_y: (H, W) continuous raster positions of those samples.
    """
    h, w = sample_rgb.shape[:2]
    fw = float(filter_width)
    k = int(np.floor(fw)) + 1
    offset = float(np.exp(-filter_falloff * fw * fw))

    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]

    acc_c = jnp.zeros((h, w, 3), jnp.float32)
    acc_w = jnp.zeros((h, w), jnp.float32)

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]

    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            c = _shift2d(sample_rgb, dy, dx)
            rx = _shift2d(raster_x, dy, dx)
            ry = _shift2d(raster_y, dy, dx)
            # sample validity: the shifted source pixel must exist
            valid = (
                (yy + dy >= 0) & (yy + dy < h) & (xx + dx >= 0) & (xx + dx < w)
            )
            # reference footprint: int-truncated bounds (floor for the
            # positive raster coords used here)
            in_fp = (
                (xs >= jnp.floor(rx - fw))
                & (xs <= jnp.floor(rx + fw))
                & (ys >= jnp.floor(ry - fw))
                & (ys <= jnp.floor(ry + fw))
            )
            if filter_type == "box":
                wgt = jnp.where(valid & in_fp, 1.0, 0.0)
            else:
                gx = jnp.maximum(
                    0.0, jnp.exp(-filter_falloff * (xs - rx) ** 2) - offset
                )
                gy = jnp.maximum(
                    0.0, jnp.exp(-filter_falloff * (ys - ry) ** 2) - offset
                )
                wgt = jnp.where(valid & in_fp, gx * gy, 0.0)
            acc_c = acc_c + c * wgt[..., None]
            acc_w = acc_w + wgt

    return jnp.concatenate([acc_c, acc_w[..., None]], axis=-1)
