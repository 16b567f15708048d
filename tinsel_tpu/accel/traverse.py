"""Batched BVH traversal in pure JAX (the oracle for the Pallas kernels).

TPU-first re-expression of the reference's per-thread stack traversal
(intersection.h:678-749 IntersectRayMesh, intersection.h:751-799 QueryBVH):
each ray keeps a fixed-depth int32 stack and steps in lockstep under vmap
inside one `lax.while_loop` — a leaf triangle test and an internal-node AABB
test are evaluated per step with masks instead of branches. Near-first child
ordering and closest-t ray truncation are preserved because they cut the
number of steps, which is exactly the quantity a lockstep machine pays for.

Triangles are pre-deindexed at scene-flatten time: v0/v1/v2 are (T, 3) arrays
so a leaf test is a single contiguous gather instead of the reference's
index-then-vertex double indirection (intersection.h:638-644).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.intersect import intersect_ray_aabb, intersect_ray_tri

STACK_DEPTH = 64
INF = jnp.float32(jnp.inf)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeshPool:
    """All mesh BVHs and triangle data concatenated into flat device arrays.

    Per-instance traversal addresses a sub-BVH with (node_offset, tri_offset)
    scalars — mesh instancing shares the pool exactly like the reference's
    mesh dedup by id (render.cu:1002-1011) shares device geometry.
    """

    # concatenated BVH nodes (indices are local to each mesh's sub-tree)
    node_lower: jax.Array  # (N, 3) f32
    node_upper: jax.Array  # (N, 3) f32
    node_left: jax.Array  # (N,) i32
    node_right: jax.Array  # (N,) i32
    node_leaf: jax.Array  # (N,) i32
    node_skip: jax.Array  # (N,) i32 escape links for stackless DFS (-1 = done)

    # deindexed triangles (one row per triangle)
    tri_v0: jax.Array  # (T, 3) f32
    tri_v1: jax.Array
    tri_v2: jax.Array
    tri_n0: jax.Array  # (T, 3) f32 vertex normals
    tri_n1: jax.Array
    tri_n2: jax.Array
    tri_cdf: jax.Array  # (T,) f32 per-mesh area CDF (normalized per mesh)


@dataclasses.dataclass(frozen=True)
class MeshHandle:
    """Static (Python-int) addressing of one mesh inside a MeshPool."""

    node_offset: int
    num_nodes: int
    tri_offset: int
    num_tris: int
    area: float


def _traverse_mesh_one(pool: MeshPool, node_offset, tri_offset, o, d, tmax):
    """Closest-hit traversal of one mesh sub-BVH for a single ray.

    Returns (t, tri_local, u, v, w, n_geo); miss => t == +inf, tri_local == -1.
    Designed to be vmapped over rays.
    """
    rcp = 1.0 / d

    stack = jnp.zeros((STACK_DEPTH,), jnp.int32)  # local node indices
    count = jnp.int32(1)  # root (local 0) pre-pushed

    state = (
        stack,
        count,
        jnp.asarray(tmax, jnp.float32),  # best/truncation t
        jnp.int32(-1),  # best local tri
        jnp.float32(0.0),  # u
        jnp.float32(0.0),  # v
        jnp.float32(0.0),  # w
        jnp.zeros((3,), jnp.float32),  # geometric normal (signed)
    )

    def cond(s):
        return s[1] > 0

    def body(s):
        stack, count, best_t, best_tri, bu, bv, bw, bn = s
        count = count - 1
        local = stack[count]
        g = node_offset + local
        is_leaf = pool.node_leaf[g] > 0
        item = pool.node_left[g]

        # --- leaf: triangle test (masked; harmless garbage when not leaf)
        tri = tri_offset + item
        thit, t, u, v, w, n = intersect_ray_tri(
            pool.tri_v0[tri], pool.tri_v1[tri], pool.tri_v2[tri], o, d
        )
        take = is_leaf & thit & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        best_tri = jnp.where(take, item, best_tri)
        bu = jnp.where(take, u, bu)
        bv = jnp.where(take, v, bv)
        bw = jnp.where(take, w, bw)
        bn = jnp.where(take, n, bn)

        # --- internal: AABB-test children, push far then near
        lidx = pool.node_left[g]
        ridx = pool.node_right[g]
        gl = node_offset + lidx
        gr = node_offset + ridx
        lhit, lt = intersect_ray_aabb(pool.node_lower[gl], pool.node_upper[gl], o, rcp)
        rhit, rt = intersect_ray_aabb(pool.node_lower[gr], pool.node_upper[gr], o, rcp)
        lhit = (~is_leaf) & lhit & (lt < best_t)
        rhit = (~is_leaf) & rhit & (rt < best_t)

        # near-first: if both hit and left is nearer, push right first
        swap = lhit & rhit & (lt < rt)
        first = jnp.where(swap, ridx, lidx)  # pushed first => popped last
        second = jnp.where(swap, lidx, ridx)
        first_hit = jnp.where(swap, rhit, lhit)
        second_hit = jnp.where(swap, lhit, rhit)

        stack = stack.at[count].set(jnp.where(first_hit, first, stack[count]))
        count = count + first_hit.astype(jnp.int32)
        stack = stack.at[count].set(jnp.where(second_hit, second, stack[count]))
        count = count + second_hit.astype(jnp.int32)

        return (stack, count, best_t, best_tri, bu, bv, bw, bn)

    stack, count, best_t, best_tri, bu, bv, bw, bn = jax.lax.while_loop(
        cond, body, state
    )
    return best_t, best_tri, bu, bv, bw, bn


def intersect_mesh_stack(pool: MeshPool, node_offset, tri_offset, origins, dirs, tmax):
    """Per-ray-stack traversal (reference-shaped; kept as the oracle for the
    stackless path — a vmapped 64-deep stack is a large scatter per step and
    is slow on TPU)."""
    f = jax.vmap(
        partial(_traverse_mesh_one, pool, node_offset, tri_offset),
        in_axes=(0, 0, 0),
    )
    return f(origins, dirs, tmax)


def _refit_hit(pool: MeshPool, tri_offset, origins, dirs, best_tri, best_t):
    """Recompute (u, v, w, n_geo) at the winning triangle — one vectorized
    triangle test instead of carrying barycentrics through the loop."""
    gt = tri_offset + jnp.maximum(best_tri, 0)
    hit, t, u, v, w, n = intersect_ray_tri(
        pool.tri_v0[gt], pool.tri_v1[gt], pool.tri_v2[gt], origins, dirs
    )
    found = best_tri >= 0
    t = jnp.where(found, best_t, INF)
    return t, best_tri, u, v, w, n


def intersect_mesh(pool: MeshPool, node_offset, tri_offset, origins, dirs, tmax,
                   num_tris: int | None = None):
    """Vectorized closest-hit against one mesh sub-BVH (stackless skip-link
    DFS: per-ray state is one node cursor + the running best hit, so each
    lockstep step is pure gathers + elementwise VPU work — no stack
    scatter). origins/dirs: (R, 3); tmax: (R,). Returns (t, tri_local, u, v,
    w, n_geo) with t=inf on miss.

    If num_tris is given and small, skips the tree entirely and tests all
    triangles broadcast against all rays — for tiny meshes (area-light
    quads) the O(T*R) masked sweep beats any traversal.
    """
    if num_tris is not None and num_tris <= 16:
        return _intersect_mesh_brute(
            pool, tri_offset, num_tris, origins, dirs, tmax
        )

    rcp = 1.0 / dirs
    r = origins.shape[0]

    state = (
        jnp.zeros((r,), jnp.int32),  # cursor (local node index; -1 done)
        jnp.asarray(tmax, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
    )

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        cur, best_t, best_tri = s
        live = cur >= 0
        g = node_offset + jnp.maximum(cur, 0)

        box_hit, box_t = intersect_ray_aabb(
            pool.node_lower[g], pool.node_upper[g], origins, rcp
        )
        box_ok = live & box_hit & (box_t < best_t)
        is_leaf = pool.node_leaf[g] > 0

        # leaf: test the triangle
        item = pool.node_left[g]
        tri = tri_offset + item
        thit, t, u, v, w, n = intersect_ray_tri(
            pool.tri_v0[tri], pool.tri_v1[tri], pool.tri_v2[tri], origins, dirs
        )
        take = box_ok & is_leaf & thit & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        best_tri = jnp.where(take, item, best_tri)

        # advance: descend into first child on internal hit, else escape
        descend = box_ok & ~is_leaf
        nxt = jnp.where(descend, pool.node_left[g], pool.node_skip[g])
        cur = jnp.where(live, nxt, cur)
        return cur, best_t, best_tri

    _, best_t, best_tri = jax.lax.while_loop(cond, body, state)
    return _refit_hit(pool, tri_offset, origins, dirs, best_tri, best_t)


def traversal_cost(pool: MeshPool, node_offset, tri_offset, origins, dirs,
                   tmax, num_tris: int | None = None):
    """Per-ray node-visit count for the skip-link DFS — the `eComplexity`
    debug view the reference reserves but never implements (render.h:45,
    render.cpp:516-519). Returns (R,) f32 counts."""
    if num_tris is not None and num_tris <= 16:
        return jnp.full((origins.shape[0],), float(num_tris), jnp.float32)

    rcp = 1.0 / dirs
    r = origins.shape[0]
    state = (
        jnp.zeros((r,), jnp.int32),
        jnp.asarray(tmax, jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        cur, best_t, steps = s
        live = cur >= 0
        g = node_offset + jnp.maximum(cur, 0)
        box_hit, box_t = intersect_ray_aabb(
            pool.node_lower[g], pool.node_upper[g], origins, rcp
        )
        box_ok = live & box_hit & (box_t < best_t)
        is_leaf = pool.node_leaf[g] > 0
        item = pool.node_left[g]
        tri = tri_offset + item
        thit, t, *_ = intersect_ray_tri(
            pool.tri_v0[tri], pool.tri_v1[tri], pool.tri_v2[tri], origins, dirs
        )
        take = box_ok & is_leaf & thit & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        descend = box_ok & ~is_leaf
        nxt = jnp.where(descend, pool.node_left[g], pool.node_skip[g])
        cur = jnp.where(live, nxt, cur)
        return cur, best_t, steps + live.astype(jnp.float32)

    _, _, steps = jax.lax.while_loop(cond, body, state)
    return steps


def _intersect_mesh_brute(pool: MeshPool, tri_offset, num_tris: int,
                          origins, dirs, tmax):
    """All-triangles masked sweep for tiny meshes: (T, R) broadcast."""
    sl = slice(tri_offset, tri_offset + num_tris)
    v0 = pool.tri_v0[sl][:, None, :]  # (T, 1, 3)
    v1 = pool.tri_v1[sl][:, None, :]
    v2 = pool.tri_v2[sl][:, None, :]
    o = origins[None, :, :]
    d = dirs[None, :, :]
    hit, t, u, v, w, n = intersect_ray_tri(v0, v1, v2, o, d)  # (T, R)
    t = jnp.where(hit & (t < tmax[None, :]), t, INF)
    best = jnp.argmin(t, axis=0)  # (R,)
    r_idx = jnp.arange(origins.shape[0])
    best_t = t[best, r_idx]
    found = jnp.isfinite(best_t)
    best_tri = jnp.where(found, best.astype(jnp.int32), -1)
    return (
        best_t,
        best_tri,
        u[best, r_idx],
        v[best, r_idx],
        w[best, r_idx],
        n[best, r_idx],
    )
