"""Renderer front-end: progressive accumulation over sample passes.

Equivalent of the reference's Renderer interface + CpuRenderer::Render
(render.h:66-79, render.cpp:447-524): each pass draws jittered samples per
pixel (plus a shutter-time sample for motion blur, render.cpp:474-486),
path-traces the whole pixel grid as one flat ray batch, and accumulates a
premultiplied (color*weight, weight) RGBA buffer through the gather-stencil
splat (filters.py). The accumulation buffer is the checkpointable render
state (progressive rendering is naturally resumable).

TPU shape: a pass renders `samples_per_pass` spp in ONE dispatch by
flattening (S, H, W) into a single (S*H*W,) ray batch — bigger batches
amortize fixed costs and avoid per-spp host dispatches, which are expensive
over a remote-tunnel runtime. The accumulation across passes stays in the
jitted function (pass index is a traced scalar), so the host loop issues one
fused kernel per chunk.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import clamp_length, lerp
from ..scene.model import Options, SceneFlat
from .camera import CameraParams, generate_rays
from .filters import splat
from .integrator import (
    path_trace,
    path_trace_while,
    trace_complexity,
    trace_normals,
)


def _sample_grid(width: int, height: int, cam: CameraParams, key, spp: int = 1,
                 sampler: str = "random"):
    """Raster positions + shutter times: (S, H, W) arrays.

    sampler="random" draws plain uniform jitter (exact parity with the
    reference's active path, sampler.h:235-289 USE_RANDOM 1).
    sampler="stratified" jitters within an s1 x s2 sub-pixel grid across
    the pass's spp samples (the reference's StratifiedSample2D,
    sampler.h:6-45, which it ships but never enables) — a genuine variance
    reduction at equal spp.
    sampler="bluenoise" distributes the pass's spp sub-pixel positions as
    one best-candidate blue-noise point set (sampler.h:80-131), shared
    across pixels and decorrelated per pixel by a Cranley-Patterson
    toroidal shift (sampler.h:216-226) — wiring the generator the
    reference ships dead behind USE_RANDOM 1."""
    kx = jax.random.fold_in(key, 0)
    kt = jax.random.fold_in(key, 1)
    if sampler == "bluenoise" and spp > 1:
        from ..core.sampling import best_candidate_2d

        pts = best_candidate_2d(spp, jax.random.fold_in(key, 3))  # (spp, 2)
        shift = jax.random.uniform(kx, (1, height, width, 2))
        jitter = (pts[:, None, None, :] + shift) % 1.0
    else:
        jitter = jax.random.uniform(kx, (spp, height, width, 2))
    if sampler == "stratified" and spp > 1:
        # factor spp into the most-square s1 x s2 stratum grid
        s1 = int(np.sqrt(spp))
        while spp % s1:
            s1 -= 1
        s2 = spp // s1
        sx = (jnp.arange(spp, dtype=jnp.float32) % s1)[:, None, None]
        sy = (jnp.arange(spp, dtype=jnp.float32) // s1)[:, None, None]
        jx = (sx + jitter[..., 0]) / s1
        jy = (sy + jitter[..., 1]) / s2
    else:
        jx = jitter[..., 0]
        jy = jitter[..., 1]
    xs = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    rx = xs + jx
    ry = ys + jy
    tu = jax.random.uniform(kt, (spp, height, width))
    # shutter time stratified over the pass like the reference wavefront
    # (wavefront.cu:1135-1138) when stratification is on; blue noise uses a
    # per-pixel toroidal shift of one stratified 1-D set
    if sampler == "stratified" and spp > 1:
        tu = (jnp.arange(spp, dtype=jnp.float32)[:, None, None] + tu) / spp
    elif sampler == "bluenoise" and spp > 1:
        tshift = jax.random.uniform(kt, (1, height, width))
        tu = ((jnp.arange(spp, dtype=jnp.float32)[:, None, None] + 0.5) / spp
              + tshift) % 1.0
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
    samples_per_pass: int = 1,
    clamp: float = float("inf"),
    filter_type: str = "gaussian",
    filter_width: float = 0.75,
    filter_falloff: float = 1.0,
    mode: str = "pathtrace",
    backend: str = "scan",
    sampler: str = "random",
    rr_depth: int = 0,
    light_sampling: str = "all",
    dead_bounce_skip: bool = True,
    grad_unroll: int | None = None,
):
    """One pass of `samples_per_pass` spp -> (H, W, 4) RGBA increment.

    dead_bounce_skip=False (gradient callers): see path_trace — the cond
    is an opaque remat unit under reverse-mode AD. grad_unroll: bounce
    loop structure (None = integrator module knobs; 0 = scan; n >= 1 =
    unrolled, checkpoint every n bounces)."""
    s = samples_per_pass
    rx, ry, times = _sample_grid(width, height, cam, key, s, sampler)
    raster = jnp.stack([rx, ry], axis=-1).reshape(-1, 2)
    # thin-lens DOF draws (a fresh stream; zero aperture ignores them and
    # reproduces the pinhole rays bit-for-bit, render/camera.py)
    lens_uv = jax.random.uniform(
        jax.random.fold_in(key, 5), (s, height, width, 2)
    ).reshape(-1, 2)
    origins, dirs = generate_rays(cam, width, height, raster, lens_uv)
    times_flat = times.reshape(-1)

    if mode in ("normals", "complexity"):
        dbg = trace_normals if mode == "normals" else trace_complexity
        rgb = dbg(scene, origins, dirs, times_flat)
        rgb = rgb.reshape(s, height, width, 3).mean(axis=0)
        return jnp.concatenate(
            [rgb, jnp.ones((height, width, 1), jnp.float32)], axis=-1
        )

    if backend == "while":
        radiance = path_trace_while(
            scene, origins, dirs, times_flat, max_depth,
            jax.random.fold_in(key, 2), rr_depth=rr_depth,
            light_sampling=light_sampling,
        )
    else:
        radiance = path_trace(
            scene, origins, dirs, times_flat, max_depth,
            jax.random.fold_in(key, 2), rr_depth=rr_depth,
            light_sampling=light_sampling, dead_bounce_skip=dead_bounce_skip,
            grad_unroll=grad_unroll,
        )
    if math.isfinite(clamp):
        radiance = clamp_length(radiance, clamp)
    sample_rgb = radiance.reshape(s, height, width, 3)

    do_splat = partial(
        splat,
        filter_type=filter_type,
        filter_width=filter_width,
        filter_falloff=filter_falloff,
    )
    return jax.vmap(do_splat)(sample_rgb, rx, ry).sum(axis=0)


def make_render_pass(options: Options, samples_per_pass: int = 1):
    """Bind static options; returns render_pass(scene, cam, key) ready to jit."""
    return partial(
        render_pass,
        width=options.width,
        height=options.height,
        max_depth=options.max_depth,
        samples_per_pass=samples_per_pass,
        clamp=options.clamp,
        filter_type=options.filter_type,
        filter_width=options.filter_width,
        filter_falloff=options.filter_falloff,
        mode=options.mode,
        backend=options.backend,
        sampler=getattr(options, "sampler", "random"),
        rr_depth=getattr(options, "rr_depth", 0),
        light_sampling=getattr(options, "light_sampling", "all"),
    )


def make_accumulate_fn(options: Options, samples_per_pass: int = 1):
    """Jitted (accum, scene, cam, key, pass_idx) -> accum + one chunk.

    Key folding and accumulation both happen on-device: the host loop is
    one dispatch per chunk with zero auxiliary kernels.
    """
    pass_fn = make_render_pass(options, samples_per_pass)

    @jax.jit
    def step(accum, scene, cam, key, pass_idx):
        k = jax.random.fold_in(key, pass_idx)
        return accum + pass_fn(scene, cam, k)

    return step


def render(scene_host, spp: int, seed: int = 0, options: Options = None,
           samples_per_pass: int | None = None, report_every: int = 0):
    """Convenience host loop: flatten, jit once, accumulate spp passes.

    Returns the (H, W, 4) accumulation buffer (resolve with core.color).
    """
    options = options or scene_host.options
    flat = scene_host.flatten()
    cam = CameraParams.from_host(scene_host.camera)
    if samples_per_pass is None:
        # bound per-pass ray memory: ~1M rays per dispatch
        samples_per_pass = max(1, min(spp, (1 << 20) // max(options.width * options.height, 1)))
    n_full, rem = divmod(spp, samples_per_pass)
    step = make_accumulate_fn(options, samples_per_pass)
    key = jax.random.key(seed, impl=getattr(options, "prng", "rbg"))

    accum = jnp.zeros((options.height, options.width, 4), jnp.float32)
    for c in range(n_full):
        accum = step(accum, flat, cam, key, c)
        if report_every and (c + 1) % report_every == 0:
            accum.block_until_ready()
    if rem:
        step_rem = make_accumulate_fn(options, rem)
        accum = step_rem(accum, flat, cam, key, n_full)
    return accum
