"""Scene-level closest-hit and shadow tracing.

TPU-first replacement for the reference's two-level traversal
(render.cpp:17-99 Trace + QueryBVH over the top-level primitive BVH): the
primitive table in every shipped scene is tiny (< 100 rows), so the top level
is a *vectorized brute-force sweep* — every ray tests every primitive with
masks, which is branch-free VPU work and faster on a lockstep machine than a
per-ray top-level tree walk. Mesh primitives recurse into the shared
MeshPool BVH (accel/traverse.py) with the ray transformed to local space and
the running closest-t passed as the truncation bound, mirroring
intersection.h:984-1013 (including smooth-normal interpolation with the
geometric-side fixup).

Motion blur: the primitive transform is interpolated at each ray's time
inside the intersection, exactly like intersection.h:953.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..accel.traverse import intersect_mesh, intersect_mesh_any
from ..core.math import (
    Transform,
    face_forward,
    dot,
    interpolate_transform,
    inverse_transform_point,
    inverse_transform_vector,
    quat_rotate,
    safe_normalize,
)
from ..geometry.intersect import (
    intersect_ray_plane,
    intersect_ray_sphere,
    intersect_ray_tri,
)
from ..scene.model import MESH, PLANE, SPHERE, SceneFlat

INF = float("inf")  # Python literal: an import-time device scalar closed
# over in jit hits a catastrophic constant path on TPU (measured 3000x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hit:
    t: jax.Array  # (R,) +inf on miss
    prim: jax.Array  # (R,) i32, -1 on miss
    normal: jax.Array  # (R, 3) shading normal, face-forwarded to -ray dir


def prim_transform(scene: SceneFlat, i: int, times):
    """Interpolated transform of primitive i at per-ray times (R,)."""
    start = Transform(
        p=scene.prims.start_p[i], q=scene.prims.start_q[i], s=scene.prims.start_s[i]
    )
    end = Transform(
        p=scene.prims.end_p[i], q=scene.prims.end_q[i], s=scene.prims.end_s[i]
    )
    return interpolate_transform(start, end, times)


def trace_closest(scene: SceneFlat, origins, dirs, times) -> Hit:
    """Closest-hit over all primitives. origins/dirs (R,3), times (R,)."""
    r = origins.shape[0]
    best_t = jnp.full((r,), INF)
    best_prim = jnp.full((r,), -1, jnp.int32)
    best_n = jnp.zeros((r, 3), jnp.float32)

    for i, ps in enumerate(scene.prim_static):
        tr = prim_transform(scene, i, times)

        if ps.type == SPHERE:
            hit, t, n = intersect_ray_sphere(
                tr.p, scene.prims.radius[i] * tr.s, origins, dirs
            )
        elif ps.type == PLANE:
            hit, t, n = intersect_ray_plane(scene.prims.plane[i], origins, dirs)
        else:  # MESH
            h = ps.mesh
            o_l = inverse_transform_point(tr, origins)
            d_l = inverse_transform_vector(tr, dirs)
            # Traversal is a *discrete search* for the winning triangle: run
            # it under stop_gradient (lax.while_loop has no reverse rule and
            # which-triangle-wins is piecewise constant anyway), then
            # re-evaluate the intersection differentiably at the found
            # triangle so gradients flow to vertices/transforms/ray params.
            sg = jax.lax.stop_gradient
            _, tri, *_ = intersect_mesh(
                sg(scene.pool), h.node_offset, h.tri_offset, sg(o_l), sg(d_l),
                sg(best_t), num_tris=h.num_tris,
            )
            hit = tri >= 0
            gt = h.tri_offset + jnp.maximum(tri, 0)
            v0, v1, v2 = scene.pool.gather_tri(gt)
            _, t, u, v, w, n_geo = intersect_ray_tri(v0, v1, v2, o_l, d_l)
            # local t equals world t: the transform maps the ray's parameter
            # linearly (uniform scale folded into |d_l|), so best_t is a
            # valid truncation bound across primitives.
            t = jnp.where(hit, t, INF)
            n0, n1, n2 = scene.pool.gather_normals(gt)
            ns = u[..., None] * n0 + v[..., None] * n1 + w[..., None] * n2
            # keep the smooth normal on the geometric side
            ns = ns * jnp.where(dot(ns, n_geo) < 0.0, -1.0, 1.0)[..., None]
            n = safe_normalize(
                quat_rotate(tr.q, ns), fallback=safe_normalize(quat_rotate(tr.q, n_geo))
            )

        closer = hit & (t > 0.0) & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_prim = jnp.where(closer, jnp.int32(i), best_prim)
        best_n = jnp.where(closer[..., None], n, best_n)

    best_n = face_forward(best_n, -dirs)
    return Hit(t=best_t, prim=best_prim, normal=best_n)


def trace_any(scene: SceneFlat, origins, dirs, times, tmax) -> jax.Array:
    """Occlusion query: any primitive hit with 0 < t < tmax. (R,) bool.

    Cheaper than trace_closest for pure visibility (probe shadow rays):
    mesh traversal exits at the first intersection — an early-out the
    reference's shadow Trace (render.cpp:17-99) does not have."""
    r = origins.shape[0]
    occ = jnp.zeros((r,), bool)
    tmax = jnp.asarray(tmax, jnp.float32)

    for i, ps in enumerate(scene.prim_static):
        tr = prim_transform(scene, i, times)
        if ps.type == SPHERE:
            hit, t, _ = intersect_ray_sphere(
                tr.p, scene.prims.radius[i] * tr.s, origins, dirs
            )
            occ = occ | (hit & (t > 0.0) & (t < tmax))
        elif ps.type == PLANE:
            hit, t, _ = intersect_ray_plane(scene.prims.plane[i], origins, dirs)
            occ = occ | (hit & (t > 0.0) & (t < tmax))
        else:  # MESH
            h = ps.mesh
            o_l = inverse_transform_point(tr, origins)
            d_l = inverse_transform_vector(tr, dirs)
            sg = jax.lax.stop_gradient
            occ = occ | intersect_mesh_any(
                sg(scene.pool), h.node_offset, h.tri_offset, sg(o_l),
                sg(d_l), sg(jnp.where(occ, 0.0, tmax)),
                num_tris=h.num_tris,
            )
    return occ
