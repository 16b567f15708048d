"""AOV (arbitrary output variable) passes: per-pixel normal, depth, and
albedo maps alongside the beauty render.

An extension over the reference (whose only auxiliary views are the
normals/complexity debug modes, render.cpp:494-519): AOVs are the guide
inputs every production denoiser expects, and they pair with the NLM
post-pass (render/nlm.py). One deterministic closest-hit trace at pixel
centers serves all three outputs — geometry AOVs should be crisp, not
jittered.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.model import SceneFlat
from .camera import CameraParams, generate_rays
from .trace import trace_closest


def render_aovs(scene: SceneFlat, cam: CameraParams, width: int,
                height: int):
    """Returns dict(normal=(H,W,3) in [-1,1], depth=(H,W,1) hit distance
    (0 on miss), albedo=(H,W,3) base color (0 on miss)); one trace."""
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]
    raster = jnp.stack(
        [jnp.broadcast_to(xs, (height, width)),
         jnp.broadcast_to(ys, (height, width))], axis=-1
    ).reshape(-1, 2)
    origins, dirs = generate_rays(cam, width, height, raster)
    times = jnp.broadcast_to(
        jnp.asarray(cam.shutter_start, jnp.float32), (height * width,)
    )
    hit = trace_closest(scene, origins, dirs, times)
    found = (hit.prim >= 0)[..., None]

    normal = jnp.where(found, hit.normal, 0.0)
    depth = jnp.where(found, hit.t[..., None], 0.0)
    albedo = jnp.where(
        found, scene.materials.select(jnp.maximum(hit.prim, 0)).color, 0.0
    )
    shp = (height, width)
    return dict(
        normal=normal.reshape(*shp, 3),
        depth=depth.reshape(*shp, 1),
        albedo=albedo.reshape(*shp, 3),
    )


def write_aovs(prefix: str, aovs: dict) -> list:
    """Write each AOV as a PFM next to the beauty image; returns paths."""
    import numpy as np

    from ..io.hdr import save_pfm

    paths = []
    for name, img in aovs.items():
        a = np.asarray(img, np.float32)
        if a.shape[-1] == 1:
            a = np.repeat(a, 3, axis=-1)  # grayscale PFM as RGB
        path = f"{prefix}_{name}.pfm"
        save_pfm(path, a)
        paths.append(path)
    return paths
