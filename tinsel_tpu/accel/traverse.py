"""Batched BVH traversal in pure JAX, shaped for the TPU's memory system.

TPU-first re-expression of the reference's per-thread stack traversal
(intersection.h:678-749 IntersectRayMesh, intersection.h:751-799 QueryBVH).
The design is driven by an empirically measured cost model of this runtime
(see bench notes in git history):

  * a random row gather of R indices costs ~(fixed 0.2-0.7 ms + ~12-20 ns/row)
    and the cost is FLAT in row width up to 16 floats -> pack whole node and
    triangle records into single rows and pay ONE gather per step;
  * every loop iteration has a large fixed cost -> the only lever that
    matters is the TOTAL STEP COUNT, not per-step arithmetic (elementwise
    VPU math is ~free relative to gathers);
  * 2-D arrays with a tiny minor dim ((N, 3) etc.) admit two layouts and
    XLA inserts physical transposes between gathers and elementwise
    consumers inside loops -> hot data is (N, 8)/(T, 12) rows consumed by
    column slices, never separate (N, 3) tensors;
  * import-time jnp constants captured by closures hit a pathological
    constant path (measured 3000x) -> module constants are Python floats.

Algorithm: **stackless skip-link DFS with leaf dwell**. Per-ray state is a
node cursor + a triangle counter k. At an internal hit the cursor descends;
at a leaf hit the ray *dwells*, testing one triangle of the leaf's
contiguous range per step (one extra row gather), then exits via the skip
link. A per-lane stack would be a scatter per step; an 8-wide leaf sweep
per step would pay 8x the gather bytes on every step including the ~75%
of steps that sit on internal nodes.

Rays are processed in tiles (lax.map): each tile's while_loop exits when
*its* rays finish instead of the whole batch stepping until the worst ray
finishes. Triangles are pre-deindexed at scene-flatten time in BVH-permuted
order so a leaf is a contiguous row range (intersection.h:638-644's
index-then-vertex double indirection removed).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .build import COUNT_SHIFT, ITEM_MASK

TILE = 8192  # rays per early-exit tile; tuned on TPU v5. Small tiles
# localize early exit to raster regions (16-instance scene prefers 2048);
# deep-bounce scenes amortize per-step fixed cost over longer tails
# (524k-tri env scene prefers 8192-32768). 8192 is the best compromise
# across the benchmark matrix; override per-call via intersect_mesh(tile=).
INF = float("inf")  # Python literal: an import-time device scalar closed
# over in jit hits a catastrophic constant path on TPU (measured 3000x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeshPool:
    """All mesh BVHs and triangle data concatenated into flat row tables.

    Per-instance traversal addresses a sub-BVH with (node_offset, tri_offset)
    scalars — mesh instancing shares the pool exactly like the reference's
    mesh dedup by id (render.cu:1002-1011) shares device geometry.
    """

    # packed BVH nodes, one row per node (see accel.build.pack_nodes):
    # lower.xyz | upper.xyz | bitcast(count<<26 | child-or-start) | bitcast(skip)
    node_packed: jax.Array  # (N, 8) f32

    # deindexed triangles in BVH-permuted order:
    # cols 0-8 = v0.xyz v1.xyz v2.xyz, cols 9-11 pad (row-gather width is
    # flat-cost up to 16 floats; 12 keeps 128-byte row alignment)
    tri_rows: jax.Array  # (T, 12) f32
    # vertex normals: cols 0-8 = n0.xyz n1.xyz n2.xyz, cols 9-11 pad
    nrm_rows: jax.Array  # (T, 12) f32
    tri_cdf: jax.Array  # (T,) f32 per-mesh area CDF (normalized per mesh)
    # component planes (same data as the row tables): cold paths build
    # (..., 3) vectors via three 1-D gathers + stack, which avoids the
    # (T, 12)-row -> (R, 3)-slice relayout XLA would otherwise insert
    tri_planes: tuple  # 9 x (T,) f32: v0x v0y v0z v1x ... v2z
    nrm_planes: tuple  # 9 x (T,) f32: n0x ... n2z

    # ------------------------------------------------ cold-path accessors
    def gather_tri(self, idx):
        """Vertices of triangles idx (...,) -> three (..., 3) arrays."""
        p = self.tri_planes
        return (
            jnp.stack([p[0][idx], p[1][idx], p[2][idx]], axis=-1),
            jnp.stack([p[3][idx], p[4][idx], p[5][idx]], axis=-1),
            jnp.stack([p[6][idx], p[7][idx], p[8][idx]], axis=-1),
        )

    def gather_normals(self, idx):
        """Vertex normals of triangles idx (...,) -> three (..., 3) arrays."""
        p = self.nrm_planes
        return (
            jnp.stack([p[0][idx], p[1][idx], p[2][idx]], axis=-1),
            jnp.stack([p[3][idx], p[4][idx], p[5][idx]], axis=-1),
            jnp.stack([p[6][idx], p[7][idx], p[8][idx]], axis=-1),
        )

    @property
    def num_tris(self) -> int:
        return int(self.tri_rows.shape[0])


@dataclasses.dataclass(frozen=True)
class MeshHandle:
    """Static (Python-int) addressing of one mesh inside a MeshPool."""

    node_offset: int
    num_nodes: int
    tri_offset: int
    num_tris: int
    area: float


def _split3(v):
    """(..., 3) -> component tuple; the boundary between vec-land and the
    scalarized hot loop."""
    return v[..., 0], v[..., 1], v[..., 2]


def _safe_rcp3(d):
    """Reciprocal direction components with zero components nudged to +/-tiny,
    so an axis-aligned ray whose origin sits exactly on a box bound computes
    0 * huge = 0 instead of 0 * inf = NaN (which would propagate through the
    slab min/max as a false miss). The nudge value is large enough that
    1/eps overflows to inf only for |d| < 1e-30 — far below any normalized
    direction component that matters."""
    eps = 1e-30
    return tuple(
        1.0 / jnp.where(jnp.abs(c) < eps, jnp.where(c < 0, -eps, eps), c)
        for c in d
    )


def _aabb_hit(lo, hi, o, rd):
    """Slab test, component-wise. lo/hi/o/rd: 3-tuples of (...,) arrays.
    Returns (hit, t_near). Mirrors intersection.h:373-397 with reciprocal
    directions; t_near clamped at 0 so rays starting inside hit at 0."""
    t0x = (lo[0] - o[0]) * rd[0]
    t1x = (hi[0] - o[0]) * rd[0]
    t0y = (lo[1] - o[1]) * rd[1]
    t1y = (hi[1] - o[1]) * rd[1]
    t0z = (lo[2] - o[2]) * rd[2]
    t1z = (hi[2] - o[2]) * rd[2]
    tnx = jnp.minimum(t0x, t1x)
    tfx = jnp.maximum(t0x, t1x)
    tny = jnp.minimum(t0y, t1y)
    tfy = jnp.maximum(t0y, t1y)
    tnz = jnp.minimum(t0z, t1z)
    tfz = jnp.maximum(t0z, t1z)
    tnear = jnp.maximum(jnp.maximum(tnx, tny), jnp.maximum(tnz, 0.0))
    tfar = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
    return tnear <= tfar, tnear


def _tri_hit(va, vb, vc, o, d, eps=1e-9):
    """Two-sided Moller-Trumbore, component-wise. va/vb/vc/o/d: 3-tuples of
    broadcast-compatible (...,) arrays. Returns (hit, t).
    Mirrors intersection.h:117-145 (barycentrics recomputed at refit)."""
    abx = vb[0] - va[0]
    aby = vb[1] - va[1]
    abz = vb[2] - va[2]
    acx = vc[0] - va[0]
    acy = vc[1] - va[1]
    acz = vc[2] - va[2]
    # p = d x ac
    px = d[1] * acz - d[2] * acy
    py = d[2] * acx - d[0] * acz
    pz = d[0] * acy - d[1] * acx
    det = abx * px + aby * py + abz * pz
    inv = 1.0 / jnp.where(jnp.abs(det) < eps, 1.0, det)
    ok = jnp.abs(det) >= eps
    tx = o[0] - va[0]
    ty = o[1] - va[1]
    tz = o[2] - va[2]
    u = (tx * px + ty * py + tz * pz) * inv
    # q = t x ab
    qx = ty * abz - tz * aby
    qy = tz * abx - tx * abz
    qz = tx * aby - ty * abx
    v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv
    t = (acx * qx + acy * qy + acz * qz) * inv
    hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    return hit, t


def _traverse_tile(pool: MeshPool, node_offset, tri_offset, o, d, tmax,
                   with_steps: bool = False):
    """Skip-link leaf-dwell DFS over one ray tile. o/d: component 3-tuples
    of (R,). Returns (best_t, best_tri[, steps])."""
    rd = _safe_rcp3(d)
    r = o[0].shape[0]

    state = (
        jnp.zeros((r,), jnp.int32),  # cursor (local node index; -1 done)
        jnp.zeros((r,), jnp.int32),  # k: triangles already tested in leaf
        jnp.asarray(tmax, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
    )

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        cur, k, best_t, best_tri, steps = s
        live = cur >= 0
        row = pool.node_packed[node_offset + jnp.maximum(cur, 0)]  # (R, 8)
        lo = (row[:, 0], row[:, 1], row[:, 2])
        hi = (row[:, 3], row[:, 4], row[:, 5])
        word = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
        skip = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
        count = jax.lax.shift_right_logical(word, COUNT_SHIFT)
        payload = jax.lax.bitwise_and(word, jnp.int32(ITEM_MASK))

        box_hit, box_t = _aabb_hit(lo, hi, o, rd)
        # re-checked while dwelling: any tri in this leaf has t >= box
        # entry t, so once best_t < box_t the rest of the leaf can't win
        box_ok = live & box_hit & (box_t < best_t)
        is_leaf = count > 0

        # dwell: test triangle (payload + k) of the leaf's contiguous range
        dwell = box_ok & is_leaf & (k < count)
        tri_local = payload + k
        trow = pool.tri_rows[tri_offset + jnp.where(dwell, tri_local, 0)]
        va = (trow[:, 0], trow[:, 1], trow[:, 2])
        vb = (trow[:, 3], trow[:, 4], trow[:, 5])
        vc = (trow[:, 6], trow[:, 7], trow[:, 8])
        hit, t = _tri_hit(va, vb, vc, o, d)
        hit = dwell & hit & (t < best_t)
        best_t = jnp.where(hit, t, best_t)
        best_tri = jnp.where(hit, tri_local, best_tri)

        # advance
        k2 = jnp.where(dwell, k + 1, 0)
        stay = dwell & (k2 < count)
        nxt = jnp.where(box_ok & ~is_leaf, payload, skip)
        cur = jnp.where(live, jnp.where(stay, cur, nxt), cur)
        k = jnp.where(stay, k2, 0)
        if with_steps:
            steps = steps + live.astype(jnp.float32)
        return cur, k, best_t, best_tri, steps

    _, _, best_t, best_tri, steps = jax.lax.while_loop(cond, body, state)
    if with_steps:
        return best_t, best_tri, steps
    return best_t, best_tri


def _refit_hit(pool: MeshPool, tri_offset, origins, dirs, best_tri, best_t):
    """Recompute (u, v, w, n_geo) at the winning triangle — one vectorized
    differentiable triangle test instead of carrying barycentrics through
    the loop."""
    from ..geometry.intersect import intersect_ray_tri

    gt = tri_offset + jnp.maximum(best_tri, 0)
    v0, v1, v2 = pool.gather_tri(gt)
    hit, t, u, v, w, n = intersect_ray_tri(v0, v1, v2, origins, dirs)
    found = best_tri >= 0
    t = jnp.where(found, best_t, INF)
    return t, best_tri, u, v, w, n


def _run_tiled(pool, node_offset, tri_offset, origins, dirs, tmax, tile,
               with_steps=False):
    r = origins.shape[0]
    if r > tile and r % tile != 0:
        # pad with degenerate rays (far origin, tmax 0 -> root test fails,
        # one step) so every batch size gets per-tile early exit
        pad = tile - r % tile
        origins = jnp.concatenate(
            [origins, jnp.full((pad, 3), 1e9, jnp.float32)]
        )
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
        tmax = jnp.concatenate(
            [jnp.asarray(tmax, jnp.float32), jnp.zeros((pad,), jnp.float32)]
        )
        out = _run_tiled(
            pool, node_offset, tri_offset, origins, dirs, tmax, tile,
            with_steps,
        )
        return tuple(x[:r] for x in out)

    o = _split3(origins)
    d = _split3(dirs)
    if r <= tile:
        return _traverse_tile(
            pool, node_offset, tri_offset, o, d, tmax, with_steps
        )
    n_tiles = r // tile

    def one(args):
        return _traverse_tile(
            pool, node_offset, tri_offset, args[0:3], args[3:6], args[6],
            with_steps,
        )

    parts = tuple(c.reshape(n_tiles, tile) for c in o + d) + (
        jnp.asarray(tmax, jnp.float32).reshape(n_tiles, tile),
    )
    out = jax.lax.map(one, parts)
    return tuple(x.reshape(r) for x in out)


def intersect_mesh(pool: MeshPool, node_offset, tri_offset, origins, dirs, tmax,
                   num_tris: int | None = None, tile: int | None = None):
    """Vectorized closest-hit against one mesh sub-BVH. origins/dirs: (R, 3);
    tmax: (R,). Returns (t, tri_local, u, v, w, n_geo) with t=inf on miss;
    tri_local indexes the *BVH-permuted* pool order.

    If num_tris is given and small, skips the tree entirely and tests all
    triangles broadcast against all rays — for tiny meshes (area-light
    quads) the O(T*R) masked sweep beats any traversal.
    """
    if num_tris is not None and num_tris <= 16:
        return _intersect_mesh_brute(
            pool, tri_offset, num_tris, origins, dirs, tmax
        )

    tile = TILE if tile is None else tile
    best_t, best_tri = _run_tiled(
        pool, node_offset, tri_offset, origins, dirs, tmax, tile
    )
    return _refit_hit(pool, tri_offset, origins, dirs, best_tri, best_t)


def _traverse_tile_any(pool: MeshPool, node_offset, tri_offset, o, d, tmax):
    """Any-hit (occlusion) variant of the dwell traversal: a ray terminates
    the moment any triangle hit with t < tmax is found. Shadow rays exit
    orders of magnitude earlier than closest-hit (render.cpp's shadow Trace
    has no such early-out; this is a TPU-side improvement)."""
    rd = _safe_rcp3(d)
    r = o[0].shape[0]

    state = (
        jnp.zeros((r,), jnp.int32),  # cursor; -1 done
        jnp.zeros((r,), jnp.int32),  # k
        jnp.zeros((r,), jnp.bool_),  # occluded
    )

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        cur, k, occ = s
        live = cur >= 0
        row = pool.node_packed[node_offset + jnp.maximum(cur, 0)]
        lo = (row[:, 0], row[:, 1], row[:, 2])
        hi = (row[:, 3], row[:, 4], row[:, 5])
        word = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
        skip = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
        count = jax.lax.shift_right_logical(word, COUNT_SHIFT)
        payload = jax.lax.bitwise_and(word, jnp.int32(ITEM_MASK))

        box_hit, box_t = _aabb_hit(lo, hi, o, rd)
        box_ok = live & box_hit & (box_t < tmax)
        is_leaf = count > 0

        dwell = box_ok & is_leaf & (k < count)
        trow = pool.tri_rows[tri_offset + jnp.where(dwell, payload + k, 0)]
        va = (trow[:, 0], trow[:, 1], trow[:, 2])
        vb = (trow[:, 3], trow[:, 4], trow[:, 5])
        vc = (trow[:, 6], trow[:, 7], trow[:, 8])
        hit, t = _tri_hit(va, vb, vc, o, d)
        found = dwell & hit & (t < tmax)
        occ = occ | found

        k2 = jnp.where(dwell, k + 1, 0)
        stay = dwell & (k2 < count) & ~found
        nxt = jnp.where(box_ok & ~is_leaf, payload, skip)
        nxt = jnp.where(found, jnp.int32(-1), nxt)  # early exit on hit
        cur = jnp.where(live, jnp.where(stay, cur, nxt), cur)
        k = jnp.where(stay, k2, 0)
        return cur, k, occ

    _, _, occ = jax.lax.while_loop(cond, body, state)
    return occ


def intersect_mesh_any(pool: MeshPool, node_offset, tri_offset, origins, dirs,
                       tmax, num_tris: int | None = None, tile: int | None = None):
    """Boolean occlusion query against one mesh sub-BVH: does any triangle
    intersect with t < tmax? origins/dirs: (R, 3); tmax: (R,)."""
    if num_tris is not None and num_tris <= 16:
        t, tri, *_ = _intersect_mesh_brute(
            pool, tri_offset, num_tris, origins, dirs, tmax
        )
        return tri >= 0

    tile = TILE if tile is None else tile
    r = origins.shape[0]
    if r > tile and r % tile != 0:
        pad = tile - r % tile
        origins = jnp.concatenate(
            [origins, jnp.full((pad, 3), 1e9, jnp.float32)]
        )
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
        tmax = jnp.concatenate(
            [jnp.asarray(tmax, jnp.float32), jnp.zeros((pad,), jnp.float32)]
        )
        return intersect_mesh_any(
            pool, node_offset, tri_offset, origins, dirs, tmax, tile=tile
        )[:r]

    o = _split3(origins)
    d = _split3(dirs)
    if r <= tile:
        return _traverse_tile_any(pool, node_offset, tri_offset, o, d, tmax)
    n_tiles = r // tile

    def one(args):
        return _traverse_tile_any(
            pool, node_offset, tri_offset, args[0:3], args[3:6], args[6]
        )

    parts = tuple(c.reshape(n_tiles, tile) for c in o + d) + (
        jnp.asarray(tmax, jnp.float32).reshape(n_tiles, tile),
    )
    return jax.lax.map(one, parts).reshape(r)


def traversal_cost(pool: MeshPool, node_offset, tri_offset, origins, dirs,
                   tmax, num_tris: int | None = None, tile: int | None = None):
    """Per-ray step count (node visits + leaf dwell steps) — the
    `eComplexity` debug view the reference reserves but never implements
    (render.h:45, render.cpp:516-519). Returns (R,) f32 counts."""
    if num_tris is not None and num_tris <= 16:
        return jnp.full((origins.shape[0],), float(num_tris), jnp.float32)

    tile = TILE if tile is None else tile
    out = _run_tiled(
        pool, node_offset, tri_offset, origins, dirs, tmax, tile,
        with_steps=True,
    )
    return out[2]


def _intersect_mesh_brute(pool: MeshPool, tri_offset, num_tris: int,
                          origins, dirs, tmax):
    """All-triangles masked sweep for tiny meshes, (T, R) broadcast with the
    ray dim in lanes."""
    sl = slice(tri_offset, tri_offset + num_tris)
    p = pool.tri_planes
    va = tuple(p[i][sl][:, None] for i in range(3))  # (T, 1)
    vb = tuple(p[3 + i][sl][:, None] for i in range(3))
    vc = tuple(p[6 + i][sl][:, None] for i in range(3))
    o = tuple(c[None, :] for c in _split3(origins))  # (1, R)
    d = tuple(c[None, :] for c in _split3(dirs))
    hit, t = _tri_hit(va, vb, vc, o, d)  # (T, R)
    t = jnp.where(hit & (t < tmax[None, :]), t, INF)
    t_min = t.min(axis=0)
    found = jnp.isfinite(t_min)
    tri_ids = jnp.arange(num_tris, dtype=jnp.int32)[:, None]
    win = jnp.where(t == t_min[None, :], tri_ids, jnp.int32(2**30)).min(axis=0)
    best_tri = jnp.where(found, win, -1)
    return _refit_hit(pool, tri_offset, origins, dirs, best_tri, t_min)
