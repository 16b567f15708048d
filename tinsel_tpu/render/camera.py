"""Camera: raster -> world ray generation (util.h:45-83 parity) plus a
thin-lens depth-of-field extension the reference lacks (its CameraSampler
is pinhole-only).

Built in JAX (not host NumPy) so camera parameters (position, rotation,
fov, aperture, focal distance) stay differentiable inputs — camera
gradients are part of the framework's contract. The matrix chain
raster->screen->camera->world matches the reference's CameraSampler
exactly; aperture = 0 (the default) reproduces the pinhole rays
bit-for-bit (the lens branch selects per lane with jnp.where).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.math import normalize, quat_rotate


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraParams:
    position: jax.Array  # (3,)
    rotation: jax.Array  # (4,) quat
    fov: jax.Array  # () radians
    shutter_start: jax.Array  # ()
    shutter_end: jax.Array  # ()
    aperture: jax.Array = None  # () lens radius; 0 = pinhole
    focal_distance: jax.Array = None  # () distance to the focus plane

    @staticmethod
    def from_host(cam) -> "CameraParams":
        return CameraParams(
            position=jnp.asarray(cam.position, jnp.float32),
            rotation=jnp.asarray(cam.rotation, jnp.float32),
            fov=jnp.asarray(cam.fov, jnp.float32),
            shutter_start=jnp.asarray(cam.shutter_start, jnp.float32),
            shutter_end=jnp.asarray(cam.shutter_end, jnp.float32),
            aperture=jnp.asarray(getattr(cam, "aperture", 0.0), jnp.float32),
            focal_distance=jnp.asarray(
                getattr(cam, "focal_distance", 1.0), jnp.float32
            ),
        )


def raster_to_world_matrix(cam: CameraParams, width: int, height: int):
    """rasterToWorld = cameraToWorld @ screenToCamera @ rasterToScreen."""
    q = cam.rotation
    e = jnp.eye(3, dtype=jnp.float32)
    cols = jnp.stack([quat_rotate(q, e[i]) for i in range(3)], axis=1)  # (3,3)
    cam_to_world = jnp.zeros((4, 4), jnp.float32)
    cam_to_world = cam_to_world.at[:3, :3].set(cols)
    cam_to_world = cam_to_world.at[:3, 3].set(cam.position)
    cam_to_world = cam_to_world.at[3, 3].set(1.0)

    raster_to_screen = jnp.asarray(
        [
            [2.0 / width, 0.0, 0.0, -1.0],
            [0.0, -2.0 / height, 0.0, 1.0],
            [0.0, 0.0, 1.0, 1.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    f = jnp.tan(cam.fov * 0.5)
    aspect = width / height
    screen_to_camera = jnp.diag(
        jnp.stack([f * aspect, f, jnp.float32(-1.0), jnp.float32(1.0)])
    )
    return cam_to_world @ screen_to_camera @ raster_to_screen, cam_to_world


def generate_rays(cam: CameraParams, width: int, height: int, raster_xy,
                  lens_uv=None):
    """raster_xy (..., 2) float raster coordinates -> (origin, dir).

    lens_uv (..., 2) in [0,1): thin-lens samples for depth of field —
    the origin shifts on the lens disk (radius cam.aperture) and the
    direction is re-aimed at the pinhole ray's focal-plane point. With
    aperture 0 (or lens_uv None) the pinhole rays come back bit-equal."""
    r2w, c2w = raster_to_world_matrix(cam, width, height)
    xy1 = jnp.concatenate(
        [
            raster_xy,
            jnp.zeros_like(raster_xy[..., :1]),
            jnp.ones_like(raster_xy[..., :1]),
        ],
        axis=-1,
    )
    p = jnp.einsum("ij,...j->...i", r2w, xy1)[..., :3]
    origin = c2w[:3, 3]
    d = normalize(p - origin)
    origin = jnp.broadcast_to(origin, d.shape)

    ap = getattr(cam, "aperture", None)
    if lens_uv is not None and ap is not None:
        # concentric-free polar disk sample (adequate for a lens)
        r = jnp.sqrt(lens_uv[..., 0]) * ap
        phi = 2.0 * jnp.pi * lens_uv[..., 1]
        lx = r * jnp.cos(phi)
        ly = r * jnp.sin(phi)
        u_ax = c2w[:3, 0]
        v_ax = c2w[:3, 1]
        offset = lx[..., None] * u_ax + ly[..., None] * v_ax
        focus = origin + d * (
            getattr(cam, "focal_distance", None) / jnp.maximum(
                -jnp.einsum("...i,i->...", d, c2w[:3, 2]), 1e-6
            )
        )[..., None]
        o_dof = origin + offset
        d_dof = normalize(focus - o_dof)
        use = ap > 0.0
        origin = jnp.where(use, o_dof, origin)
        d = jnp.where(use, d_dof, d)
    return origin, d
