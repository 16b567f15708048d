"""Adaptive sampling: variance-driven per-tile sample allocation.

A production feature beyond the reference (which samples every pixel
equally forever, main.cpp:242-258): after a uniform warmup, each round
re-estimates per-pixel variance of the pixel-mean and spends the whole
next sample batch on the K highest-error tiles. Unbiased per pixel — the
accumulation buffer stores (sum, count) and resolves by division, so a
pixel's estimate is the plain average of its own samples no matter how
many rounds selected it.

TPU-first shape: everything is static — 16x16 tiles, a compile-time K
(fraction of tiles per round), `lax.top_k` for selection, ray generation
for the selected tiles as one flat (spp*K*256,) batch, and the update is
a scatter-add at K *unique* tile indices (one (K,16,16,4) row scatter —
nothing like the per-sample colliding scatter the splat path avoids).
Adaptive rounds use per-pixel box reconstruction (jitter inside the
pixel); the warmup honors the scene's filter via the normal render pass
only when that filter is box — a Gaussian splat would spread samples
across tile borders and break the per-tile (sum, count) bookkeeping, so
adaptive mode forces box. Documented trade: reconstruction sharpness for
allocation control.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import lerp
from ..scene.model import SceneFlat
from .camera import CameraParams, generate_rays
from .integrator import path_trace

TILE = 16  # pixels per tile side (static)
_REL_EPS = 0.05  # luminance floor in the relative-error priority


def _check_dims(width: int, height: int):
    if width % TILE or height % TILE:
        raise ValueError(
            f"adaptive sampling needs width/height divisible by {TILE}; "
            f"got {width}x{height}"
        )


def _to_tiles(img):
    """(H, W, C) -> (T, TILE, TILE, C) row-major tile order."""
    h, w, c = img.shape
    return (
        img.reshape(h // TILE, TILE, w // TILE, TILE, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, TILE, TILE, c)
    )


def _from_tiles(tiles, height: int, width: int):
    c = tiles.shape[-1]
    return (
        tiles.reshape(height // TILE, width // TILE, TILE, TILE, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(height, width, c)
    )


def _tile_priority(accum, m2):
    """Per-tile priority: summed ABSOLUTE standard error of the pixel
    means — the quantity whose square is each pixel's expected MSE
    contribution, so ranking by its tile sum directly targets image MSE.
    (A relative metric was tried first and starves tiles where a handful
    of light-silhouette pixels carry enormous absolute variance — the
    pixels that dominate MSE.) accum: (H, W, 4) premultiplied
    (sum, count); m2: (H, W, 3) sum of squared radiance."""
    w = jnp.maximum(accum[..., 3:4], 1.0)
    mean = accum[..., :3] / w
    var = jnp.maximum(m2 / w - mean * mean, 0.0)  # per-sample variance
    sem = jnp.sqrt(var / w)  # standard error of the mean
    per_pixel = sem.sum(axis=-1, keepdims=True)
    return _to_tiles(per_pixel).sum(axis=(1, 2, 3))  # (T,)


def _trace_pixels(scene, cam, key, px, py, spp, width, height, max_depth,
                  rr_depth, light_sampling):
    """Trace spp box-filtered samples of pixels at integer raster coords
    px/py (N,). Returns (sum, sumsq, count) with shapes (N,3),(N,3),()."""
    n = px.shape[0]
    kx = jax.random.fold_in(key, 0)
    kt = jax.random.fold_in(key, 1)
    jitter = jax.random.uniform(kx, (spp, n, 2))
    rx = px[None, :].astype(jnp.float32) + jitter[..., 0]
    ry = py[None, :].astype(jnp.float32) + jitter[..., 1]
    raster = jnp.stack([rx, ry], axis=-1).reshape(-1, 2)
    lens_uv = jax.random.uniform(
        jax.random.fold_in(key, 4), (spp * n, 2)
    )  # thin-lens DOF draws (ignored at aperture 0, render/camera.py)
    origins, dirs = generate_rays(cam, width, height, raster, lens_uv)
    tu = jax.random.uniform(kt, (spp * n,))
    times = lerp(cam.shutter_start, cam.shutter_end, tu)
    rad = path_trace(
        scene, origins, dirs, times, max_depth,
        jax.random.fold_in(key, 2), rr_depth=rr_depth,
        light_sampling=light_sampling,
    ).reshape(spp, n, 3)
    return rad.sum(axis=0), (rad * rad).sum(axis=0)


@partial(
    jax.jit,
    static_argnames=(
        "k_tiles", "spp", "width", "height", "max_depth", "rr_depth",
        "uniform", "light_sampling",
    ),
)
def adaptive_round(accum, m2, scene: SceneFlat, cam: CameraParams, key,
                   *, k_tiles: int, spp: int, width: int, height: int,
                   max_depth: int, rr_depth: int = 0, uniform: bool = False,
                   light_sampling: str = "all"):
    """One adaptive round: pick the k_tiles highest-priority tiles, spend
    spp samples on each of their pixels, scatter the sums back.
    uniform=True skips selection and takes the first k_tiles tiles of a
    rotation (used for warmup scheduling); returns (accum, m2)."""
    n_tiles = (width // TILE) * (height // TILE)
    if uniform:
        start = jax.random.randint(
            jax.random.fold_in(key, 9), (), 0, n_tiles
        )
        idx = (start + jnp.arange(k_tiles)) % n_tiles
    else:
        _, idx = jax.lax.top_k(_tile_priority(accum, m2), k_tiles)

    tx = (idx % (width // TILE)) * TILE
    ty = (idx // (width // TILE)) * TILE
    dx = jnp.arange(TILE, dtype=jnp.int32)
    px = (tx[:, None, None] + dx[None, None, :])  # (K, 1, TILE)
    py = (ty[:, None, None] + dx[None, :, None])  # (K, TILE, 1)
    px = jnp.broadcast_to(px, (k_tiles, TILE, TILE)).reshape(-1)
    py = jnp.broadcast_to(py, (k_tiles, TILE, TILE)).reshape(-1)

    s, s2 = _trace_pixels(
        scene, cam, key, px, py, spp, width, height, max_depth, rr_depth,
        light_sampling,
    )
    upd = jnp.concatenate(
        [s, jnp.full((s.shape[0], 1), float(spp), jnp.float32)], axis=-1
    ).reshape(k_tiles, TILE, TILE, 4)
    upd2 = s2.reshape(k_tiles, TILE, TILE, 3)

    acc_t = _to_tiles(accum).at[idx].add(upd)
    m2_t = _to_tiles(m2).at[idx].add(upd2)
    return (
        _from_tiles(acc_t, height, width),
        _from_tiles(m2_t, height, width),
    )


def adaptive_render(scene_host, budget_spp: int, seed: int = 0,
                    options=None, frac: float = 0.25, warmup_spp: int = 2,
                    spp_round: int = 4, report=None):
    """Render with a total ray budget of `budget_spp` average samples per
    pixel: `warmup_spp` uniform passes, then adaptive rounds of
    `spp_round` samples on the top `frac` of tiles until the budget is
    spent. Returns the (H, W, 4) accumulation buffer (resolve as usual).
    """
    options = options or scene_host.options
    w, h = options.width, options.height
    _check_dims(w, h)
    flat = scene_host.flatten()
    cam = CameraParams.from_host(scene_host.camera)
    key = jax.random.key(seed)
    n_tiles = (w // TILE) * (h // TILE)
    k = max(1, min(n_tiles, int(round(frac * n_tiles))))

    accum = jnp.zeros((h, w, 4), jnp.float32)
    m2 = jnp.zeros((h, w, 3), jnp.float32)
    kwargs = dict(
        spp=spp_round, width=w, height=h,
        max_depth=options.max_depth,
        rr_depth=getattr(options, "rr_depth", 0),
        light_sampling=getattr(options, "light_sampling", "all"),
    )

    # warmup: uniform full-frame coverage (all tiles each pass)
    warm_rounds = max(1, warmup_spp // spp_round)
    r = 0
    for _ in range(warm_rounds):
        accum, m2 = adaptive_round(
            accum, m2, flat, cam, jax.random.fold_in(key, r),
            k_tiles=n_tiles, uniform=True, **kwargs,
        )
        r += 1

    budget_rays = budget_spp * w * h
    spent = warm_rounds * spp_round * w * h
    rays_per_round = k * TILE * TILE * spp_round
    while spent + rays_per_round <= budget_rays:
        accum, m2 = adaptive_round(
            accum, m2, flat, cam, jax.random.fold_in(key, r),
            k_tiles=k, uniform=False, **kwargs,
        )
        spent += rays_per_round
        r += 1
        if report:
            report(r, spent / (w * h))
    return accum
