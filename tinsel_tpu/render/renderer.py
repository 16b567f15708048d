"""Renderer front-end: progressive accumulation over sample passes.

Equivalent of the reference's Renderer interface + CpuRenderer::Render
(render.h:66-79, render.cpp:447-524): each pass draws one stratified-jittered
sample per pixel (plus a shutter-time sample for motion blur,
render.cpp:474-486), path-traces the whole pixel grid as one flat ray batch,
and accumulates a premultiplied (color*weight, weight) RGBA buffer through
the gather-stencil splat (filters.py). The accumulation buffer is the
checkpointable render state (progressive rendering is naturally resumable).

`render_pass` is a single jittable function of (scene pytree, camera params,
key) — this is the unit that shards across devices (parallel/sharding.py)
and the flagship entry point for benchmarks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.math import clamp_length, lerp
from ..scene.model import Options, SceneFlat
from .camera import CameraParams, generate_rays
from .filters import splat
from .integrator import path_trace, trace_normals


def _sample_grid(width: int, height: int, cam: CameraParams, key):
    """Jittered raster positions + shutter times for one pass."""
    kx = jax.random.fold_in(key, 0)
    kt = jax.random.fold_in(key, 1)
    jitter = jax.random.uniform(kx, (height, width, 2))
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    rx = xs + jitter[..., 0]
    ry = ys + jitter[..., 1]
    tu = jax.random.uniform(kt, (height, width))
    times = lerp(cam.shutter_start, cam.shutter_end, tu)
    return rx, ry, times


def render_pass(
    scene: SceneFlat,
    cam: CameraParams,
    key,
    *,
    width: int,
    height: int,
    max_depth: int,
    clamp: float = float("inf"),
    filter_type: str = "gaussian",
    filter_width: float = 0.75,
    filter_falloff: float = 1.0,
    mode: str = "pathtrace",
):
    """One sample-per-pixel pass -> (H, W, 4) RGBA accumulation increment."""
    rx, ry, times = _sample_grid(width, height, cam, key)
    raster = jnp.stack([rx, ry], axis=-1).reshape(-1, 2)
    origins, dirs = generate_rays(cam, width, height, raster)
    times_flat = times.reshape(-1)

    if mode == "normals":
        rgb = trace_normals(scene, origins, dirs, times_flat)
        rgb = rgb.reshape(height, width, 3)
        return jnp.concatenate(
            [rgb, jnp.ones((height, width, 1), jnp.float32)], axis=-1
        )

    radiance = path_trace(
        scene, origins, dirs, times_flat, max_depth, jax.random.fold_in(key, 2)
    )
    import math

    if math.isfinite(clamp):
        radiance = clamp_length(radiance, clamp)
    sample_rgb = radiance.reshape(height, width, 3)
    return splat(sample_rgb, rx, ry, filter_type, filter_width, filter_falloff)


def make_render_pass(options: Options):
    """Bind static options; returns render_pass(scene, cam, key) ready to jit."""
    clamp = options.clamp
    return partial(
        render_pass,
        width=options.width,
        height=options.height,
        max_depth=options.max_depth,
        clamp=clamp,
        filter_type=options.filter_type,
        filter_width=options.filter_width,
        filter_falloff=options.filter_falloff,
        mode=options.mode,
    )


def render(scene_host, spp: int, seed: int = 0, options: Options = None,
           report_every: int = 0):
    """Convenience host loop: flatten, jit once, accumulate spp passes.

    Returns the (H, W, 4) accumulation buffer (resolve with core.color).
    """
    options = options or scene_host.options
    flat = scene_host.flatten()
    cam = CameraParams.from_host(scene_host.camera)
    pass_fn = jax.jit(make_render_pass(options))
    key = jax.random.key(seed)

    accum = jnp.zeros((options.height, options.width, 4), jnp.float32)
    for s in range(spp):
        accum = accum + pass_fn(flat, cam, jax.random.fold_in(key, s))
        if report_every and (s + 1) % report_every == 0:
            accum.block_until_ready()
    return accum
