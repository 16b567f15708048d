"""Batched BVH traversal in pure JAX, shaped for the TPU's memory system.

TPU-first re-expression of the reference's per-thread stack traversal
(intersection.h:678-749 IntersectRayMesh, intersection.h:751-799 QueryBVH).
The design is driven by an empirically measured cost model of this runtime
(benchmarks/microbench_r2*.py):

  * the whole cost of a traversal step is the LATENCY of one dependent row
    gather (~25-45 us per while-loop iteration at 4-16k rays); elementwise
    VPU math in the body is literally free by comparison;
  * gather cost is FLAT in row width to >=48 floats and still cheap at
    192 floats -> a step should consume as much tree as one row can carry;
  * unrolling the body does NOT amortize the cost (it is a serial
    dependency chain, not loop overhead), but bigger ray tiles do
    (per-ray marginal cost falls ~3x from R=4k to R=16k);
  * in lockstep, a tile runs until its WORST ray finishes — on the 524k-tri
    benchmark the max is ~10x the mean, so the tail, not the mean, sets
    throughput.

Algorithm: **4-ary skip-link DFS with parent-dwell leaf blocks**
(layout built by accel.build.build_wide_bvh):

  * an internal node row carries all FOUR child AABBs + child words + skip
    in one 32-float gather — one step tests four children;
  * leaves are padded 16-triangle blocks; a hit leaf child is tested in ONE
    step (a 192-float block gather + 16 lockstep Moller-Trumbore tests)
    while the cursor dwells at the parent, so leaves own no rows and no
    skip state;
  * the cursor then descends into the first hit internal child; finished
    subtrees escape along static internal-sibling skip links (a missed
    sibling reached this way costs one step: its children all miss by
    containment);
  * simulated on the 524k-tri mesh this runs max ~101 / mean ~16 steps per
    ray vs 367 / 35 for the round-1 binary leaf-dwell walk.

The lockstep tail is cut by TWO-PHASE tiling: phase 1 runs every tile with
a step cap (early-exiting tiles stop sooner); the few unfinished rays are
then compacted to the front (one stable argsort) and phase 2 finishes them
— tiles of finished rays exit after a single iteration. Triangles are
pre-deindexed at scene-flatten time in block-padded order so a leaf is one
contiguous 192-float row.

Mosaic/Pallas has no large-table per-lane dynamic gather (indices must
match the table shape), so this stays pure JAX by design — measured and
re-confirmed in round 1.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .build import BLOCK_SIZE

TILE = 8192  # rays per tile; with two-phase tail compaction bigger tiles
# amortize the per-step gather latency (per-ray marginal cost falls ~3x
# from 4k to 16k rays) without paying the worst-ray tail per tile.
PHASE1_CAP = 48  # phase-1 step cap ~ p95 of per-ray step counts on the
# 524k-tri benchmark; the tail beyond it is finished compacted in phase 2.
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

    # 4-ary internal node rows (see accel.build.WideBVH): per child c
    # cols [6c,6c+6) lower/upper, cols 24-27 bitcast child words,
    # col 28 bitcast skip
    node_rows: jax.Array  # (Ni, 32) f32

    # leaf blocks: 16 consecutive padded triangles of 12 floats each
    # (v0.xyz v1.xyz v2.xyz pad3) — one row gather tests a whole leaf
    block_rows: jax.Array  # (B, 192) f32

    tri_cdf: jax.Array  # (Tp,) f32 per-mesh area CDF over PADDED order
    # (padding slots repeat the previous cdf value: zero mass)

    # component planes (same triangle data as block_rows, padded order):
    # cold paths build (..., 3) vectors via three 1-D gathers + stack,
    # which avoids the wide-row -> (R, 3)-slice relayout XLA would
    # otherwise insert
    tri_planes: tuple  # 9 x (Tp,) f32: v0x v0y v0z v1x ... v2z
    nrm_planes: tuple  # 9 x (Tp,) f32: n0x ... n2z

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
        """Padded triangle count (16 x number of leaf blocks)."""
        return int(self.tri_planes[0].shape[0])


@dataclasses.dataclass(frozen=True)
class MeshHandle:
    """Static (Python-int) addressing of one mesh inside a MeshPool."""

    node_offset: int
    num_nodes: int
    tri_offset: int  # padded-order offset, multiple of BLOCK_SIZE
    num_tris: int  # padded count, multiple of BLOCK_SIZE
    area: float
    root_lower: tuple  # (3,) mesh-local root AABB, static floats
    root_upper: tuple


def _split3(v):
    """(..., 3) -> component tuple; the boundary between vec-land and the
    scalarized hot loop."""
    return v[..., 0], v[..., 1], v[..., 2]


def _safe_rcp3(d):
    """Reciprocal direction components with zero components nudged to +/-tiny,
    so an axis-aligned ray whose origin sits exactly on a box bound computes
    0 * huge = 0 instead of 0 * inf = NaN (which would propagate through the
    slab min/max as a false miss)."""
    eps = 1e-30
    return tuple(
        1.0 / jnp.where(jnp.abs(c) < eps, jnp.where(c < 0, -eps, eps), c)
        for c in d
    )


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


def _child_tests(row, o, rd, best_t, live):
    """Slab-test the four child AABBs packed in a node row.
    Returns (ok_c, word_c lists of 4, skip)."""
    ok = []
    words = []
    for c in range(4):
        b = 6 * c
        t0x = (row[:, b + 0] - o[0]) * rd[0]
        t1x = (row[:, b + 3] - o[0]) * rd[0]
        t0y = (row[:, b + 1] - o[1]) * rd[1]
        t1y = (row[:, b + 4] - o[1]) * rd[1]
        t0z = (row[:, b + 2] - o[2]) * rd[2]
        t1z = (row[:, b + 5] - o[2]) * rd[2]
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        ok.append(live & (tn <= tf) & (tn < best_t))
        words.append(jax.lax.bitcast_convert_type(row[:, 24 + c], jnp.int32))
    skip = jax.lax.bitcast_convert_type(row[:, 28], jnp.int32)
    return ok, words, skip


def _block_test(pool, block_base, blk_local, dwell, o, d, best_t):
    """Gather one padded 16-tri leaf block per ray and test all triangles.
    Returns (found, t_min, tri_local) where tri_local indexes padded order."""
    r = dwell.shape[0]
    brow = pool.block_rows[block_base + jnp.where(dwell, blk_local, 0)]
    blk = brow.reshape(r, BLOCK_SIZE, 12)
    ob = tuple(c[:, None] for c in o)
    db = tuple(c[:, None] for c in d)
    va = (blk[:, :, 0], blk[:, :, 1], blk[:, :, 2])
    vb = (blk[:, :, 3], blk[:, :, 4], blk[:, :, 5])
    vc = (blk[:, :, 6], blk[:, :, 7], blk[:, :, 8])
    hit, t = _tri_hit(va, vb, vc, ob, db)  # (R, 16)
    tt = jnp.where(hit & dwell[:, None] & (t < best_t[:, None]), t, INF)
    t_min = tt.min(axis=1)
    found = t_min < best_t
    slot = jnp.argmin(tt, axis=1).astype(jnp.int32)
    tri_local = blk_local * BLOCK_SIZE + slot
    return found, t_min, tri_local


def _step(pool, node_offset, block_base, o, d, rd, cur, lc, best_t, best_tri):
    """One lockstep traversal step (see module docstring)."""
    live = cur >= 0
    row = pool.node_rows[node_offset + jnp.maximum(cur, 0)]  # (R, 32)
    ok, words, skip = _child_tests(row, o, rd, best_t, live)

    # smallest hit-leaf child slot >= lc (the dwell candidate)
    s = jnp.full_like(cur, 4)
    w_s = jnp.zeros_like(cur)
    for c in range(3, -1, -1):
        cand = ok[c] & (words[c] < 0) & (lc <= c)
        s = jnp.where(cand, jnp.int32(c), s)
        w_s = jnp.where(cand, words[c], w_s)
    dwell = live & (s < 4)
    blk_local = -w_s - 1  # ~word

    found, t_min, tri_local = _block_test(
        pool, block_base, blk_local, dwell, o, d, best_t
    )
    best_t = jnp.where(found, t_min, best_t)
    best_tri = jnp.where(found, tri_local, best_tri)

    # advance: first hit internal child, else skip
    nxt = skip
    for c in range(3, -1, -1):
        nxt = jnp.where(ok[c] & (words[c] >= 0), words[c], nxt)
    cur = jnp.where(live, jnp.where(dwell, cur, nxt), cur)
    lc = jnp.where(dwell, s + 1, 0)
    return cur, lc, best_t, best_tri


def _traverse_tile(pool, node_offset, tri_offset, o, d, state, cap=None,
                   with_steps=False):
    """Run the traversal loop on one ray tile from `state`
    (cur, lc, best_t, best_tri[, steps]); optionally capped at `cap`
    iterations (phase 1 of the two-phase schedule)."""
    rd = _safe_rcp3(d)
    block_base = tri_offset // BLOCK_SIZE

    if cap is None:
        def cond(s):
            return jnp.any(s[0] >= 0)
    else:
        def cond(s):
            return jnp.any(s[0] >= 0) & (s[-1 if not with_steps else -2] < cap)

    # iteration counter only needed for the cap
    use_counter = cap is not None

    def body(s):
        if with_steps and use_counter:
            cur, lc, best_t, best_tri, it, steps = s
        elif with_steps:
            cur, lc, best_t, best_tri, steps = s
        elif use_counter:
            cur, lc, best_t, best_tri, it = s
        else:
            cur, lc, best_t, best_tri = s
        live = cur >= 0
        cur, lc, best_t, best_tri = _step(
            pool, node_offset, block_base, o, d, rd, cur, lc, best_t, best_tri
        )
        out = (cur, lc, best_t, best_tri)
        if use_counter:
            out = out + (it + 1,)
        if with_steps:
            out = out + (steps + live.astype(jnp.float32),)
        return out

    init = state
    if use_counter:
        init = state[:4] + (jnp.int32(0),) + state[4:]

    out = jax.lax.while_loop(cond, body, init)
    if use_counter:
        out = out[:4] + out[5:]
    return out


def _init_state(r, tmax, with_steps=False):
    st = (
        jnp.zeros((r,), jnp.int32),  # cur
        jnp.zeros((r,), jnp.int32),  # lc
        jnp.asarray(tmax, jnp.float32),  # best_t
        jnp.full((r,), -1, jnp.int32),  # best_tri
    )
    if with_steps:
        st = st + (jnp.zeros((r,), jnp.float32),)
    return st


def _map_tiles(pool, node_offset, tri_offset, o, d, state, tile, cap,
               with_steps):
    """lax.map the capped/uncapped loop over fixed-size tiles; each tile's
    while_loop exits when its own rays finish."""
    r = o[0].shape[0]
    if r <= tile:
        return _traverse_tile(
            pool, node_offset, tri_offset, o, d, state, cap, with_steps
        )
    n_tiles = r // tile
    n_ray_arrays = 6  # o + d components

    def one(args):
        oo = args[0:3]
        dd = args[3:6]
        st = tuple(args[6:])
        return _traverse_tile(
            pool, node_offset, tri_offset, oo, dd, st, cap, with_steps
        )

    parts = tuple(c.reshape(n_tiles, tile) for c in o + d + state)
    out = jax.lax.map(one, parts)
    return tuple(x.reshape(r) for x in out)


def _run_tiled(pool, node_offset, tri_offset, origins, dirs, tmax, tile,
               with_steps=False):
    """Two-phase tiled traversal: capped phase 1 over all tiles, then a
    stable compaction of unfinished rays to the front, then uncapped
    phase 2 (tiles of finished rays exit after one iteration).
    Returns (best_t, best_tri[, steps])."""
    r = origins.shape[0]
    if r > tile and r % tile != 0:
        # pad with degenerate rays (far origin, tmax 0 -> root children all
        # fail the t < best_t test, one step)
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
    state = _init_state(r, tmax, with_steps)

    if r <= tile:
        out = _traverse_tile(
            pool, node_offset, tri_offset, o, d, state, None, with_steps
        )
        return out[2:4] + out[4:]

    # phase 1: capped
    st1 = _map_tiles(
        pool, node_offset, tri_offset, o, d, state, tile, PHASE1_CAP,
        with_steps,
    )
    # compact unfinished rays to the front (stable: preserves coherence)
    finished = st1[0] < 0
    perm = jnp.argsort(finished.astype(jnp.int8), stable=True)
    o2 = tuple(c[perm] for c in o)
    d2 = tuple(c[perm] for c in d)
    st2 = tuple(x[perm] for x in st1)
    # phase 2: uncapped
    out = _map_tiles(
        pool, node_offset, tri_offset, o2, d2, st2, tile, None, with_steps
    )
    inv = jnp.argsort(perm)
    out = tuple(jnp.take(x, inv) for x in out)
    return out[2:4] + out[4:]


# --------------------------------------------------- collect-then-test path
#
# For BIG meshes the lockstep inline walk above is bound by the leaf-block
# gather: the block table exceeds what XLA can stage in VMEM, and an HBM
# row gather costs ~20 ns per lane per step — including every masked,
# finished, or non-dwelling lane. On the 524k-tri benchmark that is ~5.6M
# wasted-row gathers versus only ~140k blocks actually hit.
#
# The fix is to split the traversal: a cheap WALK pass (node rows only —
# the node table is ~3 MB and XLA keeps it on-chip, making walk iterations
# nearly free) records each ray's hit leaf blocks into a fixed (R, M) list;
# the lists are then compacted into ONE dense (ray, block) pair array
# (jnp.nonzero with a static size) and all pairs are tested in a single
# batched gather + 16-wide Moller-Trumbore sweep — bandwidth-bound, with no
# serial dependence and no lockstep waste. Per-ray results come back via
# sorted segment minima. Rays that overflow M list slots (or a truncated
# pair budget) are re-run through the inline walker, compacted to the
# front, exactly like phase 2 above.

COLLECT_M = 32  # per-ray block-list slots (524k-tri benchmark max: 24)
COLLECT_K_FACTOR = 4  # dense pair budget = factor * rays (benchmark: ~2.2)
COLLECT_MIN_BYTES = 8 * 2**20  # block tables under ~8 MB stay inline: XLA
# stages them in VMEM where the inline walk's block gather is cheap


def _walk_collect_tile(pool, node_offset, o, d, state):
    """Node-only walk recording hit leaf blocks. state = (cur, lc, tmax,
    nblk, blist (M, R), over). The list is carried TRANSPOSED — (M, R)
    keeps the ray dimension in vector lanes; an (R, M) list in the loop
    state hits the small-minor-dim relayout pathology (measured 135 ms vs
    ~3 ms for this walk on the 524k-tri benchmark). Prunes boxes only
    against tmax (no best_t tightening — triangles are not tested here)."""
    rd = _safe_rcp3(d)

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        cur, lc, tmax, nblk, blist, over = s
        live = cur >= 0
        row = pool.node_rows[node_offset + jnp.maximum(cur, 0)]
        ok, words, skip = _child_tests(row, o, rd, tmax, live)

        ss = jnp.full_like(cur, 4)
        w_s = jnp.zeros_like(cur)
        for c in range(3, -1, -1):
            cand = ok[c] & (words[c] < 0) & (lc <= c)
            ss = jnp.where(cand, jnp.int32(c), ss)
            w_s = jnp.where(cand, words[c], w_s)
        dwell = live & (ss < 4)
        blk_local = -w_s - 1

        # record the block: one-hot write into the (M, R) list
        fits = dwell & (nblk < COLLECT_M)
        slot_iota = jnp.arange(COLLECT_M, dtype=jnp.int32)[:, None]  # (M, 1)
        put = fits[None, :] & (slot_iota == nblk[None, :])
        blist = jnp.where(put, blk_local[None, :], blist)
        nblk = nblk + fits.astype(jnp.int32)
        over = over | (dwell & ~fits)

        nxt = skip
        for c in range(3, -1, -1):
            nxt = jnp.where(ok[c] & (words[c] >= 0), words[c], nxt)
        cur = jnp.where(live, jnp.where(dwell, cur, nxt), cur)
        lc = jnp.where(dwell, ss + 1, 0)
        return cur, lc, tmax, nblk, blist, over

    return jax.lax.while_loop(cond, body, state)


def _collect_walk(pool, node_offset, o, d, tmax, tile):
    """Tiled walk pass. Returns (nblk, blist, over) for the full batch."""
    r = o[0].shape[0]

    if r <= tile:
        state = (
            jnp.zeros((r,), jnp.int32),
            jnp.zeros((r,), jnp.int32),
            jnp.asarray(tmax, jnp.float32),
            jnp.zeros((r,), jnp.int32),
            jnp.zeros((COLLECT_M, r), jnp.int32),
            jnp.zeros((r,), jnp.bool_),
        )
        out = _walk_collect_tile(pool, node_offset, o, d, state)
        return out[3], out[4].T, out[5]

    n_tiles = r // tile

    def one(args):
        oo = args[0:3]
        dd = args[3:6]
        cur, lc, tm, nblk, blist, over = args[6:]
        out = _walk_collect_tile(
            pool, node_offset, oo, dd, (cur, lc, tm, nblk, blist, over)
        )
        # transpose outside the hot loop: (M, tile) -> (tile, M)
        return out[3], out[4].T, out[5]

    tm_full = jnp.asarray(tmax, jnp.float32).reshape(n_tiles, tile)
    parts = tuple(c.reshape(n_tiles, tile) for c in o + d) + (
        jnp.zeros((n_tiles, tile), jnp.int32),
        jnp.zeros((n_tiles, tile), jnp.int32),
        tm_full,
        jnp.zeros((n_tiles, tile), jnp.int32),
        jnp.zeros((n_tiles, COLLECT_M, tile), jnp.int32),
        jnp.zeros((n_tiles, tile), jnp.bool_),
    )
    nblk, blist, over = jax.lax.map(one, parts)
    return nblk.reshape(r), blist.reshape(r, COLLECT_M), over.reshape(r)


def _dense_block_test(pool, tri_offset, nblk, blist, origins, dirs, tmax):
    """Flatten per-ray block lists to a dense pair array, test every pair's
    16 triangles in one batched sweep, and reduce per ray via sorted
    segment minima. Returns (best_t, best_tri, over_budget)."""
    r = origins.shape[0]
    block_base = tri_offset // BLOCK_SIZE
    k_budget = COLLECT_K_FACTOR * r

    slot_iota = jnp.arange(COLLECT_M, dtype=jnp.int32)[None, :]
    mask = slot_iota < nblk[:, None]  # (R, M)
    flat_mask = mask.reshape(-1)
    flat_blk = blist.reshape(-1)

    (pos,) = jnp.nonzero(flat_mask, size=k_budget, fill_value=0)
    total = flat_mask.sum()
    valid = jnp.arange(k_budget) < total
    pair_blk = jnp.where(valid, flat_blk[pos], 0)
    pair_ray = (pos // COLLECT_M).astype(jnp.int32)

    # rays whose pairs fell past the budget must be re-run inline
    starts = jnp.cumsum(nblk) - nblk
    over_budget = (starts + nblk) > k_budget

    ob = tuple(c[pair_ray][:, None] for c in _split3(origins))
    db = tuple(c[pair_ray][:, None] for c in _split3(dirs))
    tmax_p = jnp.asarray(tmax, jnp.float32)[pair_ray]

    brow = pool.block_rows[block_base + pair_blk]  # (K, 192)
    blk = brow.reshape(-1, BLOCK_SIZE, 12)
    va = (blk[:, :, 0], blk[:, :, 1], blk[:, :, 2])
    vb = (blk[:, :, 3], blk[:, :, 4], blk[:, :, 5])
    vc = (blk[:, :, 6], blk[:, :, 7], blk[:, :, 8])
    hit, t = _tri_hit(va, vb, vc, ob, db)  # (K, 16)
    tt = jnp.where(hit & valid[:, None] & (t < tmax_p[:, None]), t, INF)
    t_pair = tt.min(axis=1)
    slot = jnp.argmin(tt, axis=1).astype(jnp.int32)
    tri_pair = pair_blk * BLOCK_SIZE + slot

    seg_t = jax.ops.segment_min(
        t_pair, pair_ray, num_segments=r, indices_are_sorted=True
    )
    big = jnp.int32(2**30)
    code = jnp.where(
        jnp.isfinite(t_pair) & (t_pair == seg_t[pair_ray]), tri_pair, big
    )
    seg_tri = jax.ops.segment_min(
        code, pair_ray, num_segments=r, indices_are_sorted=True
    )
    found = jnp.isfinite(seg_t) & (seg_tri < big)
    best_t = jnp.where(found, seg_t, jnp.asarray(tmax, jnp.float32))
    best_tri = jnp.where(found, seg_tri, -1)
    return best_t, best_tri, over_budget


def _run_collect(pool, node_offset, tri_offset, origins, dirs, tmax, tile):
    """Full collect-then-test closest hit, with an inline-walk cleanup pass
    for rays that overflowed the list slots or the pair budget."""
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
        out = _run_collect(
            pool, node_offset, tri_offset, origins, dirs, tmax, tile
        )
        return tuple(x[:r] for x in out)

    o = _split3(origins)
    d = _split3(dirs)
    nblk, blist, over = _collect_walk(pool, node_offset, o, d, tmax, tile)
    best_t, best_tri, over_budget = _dense_block_test(
        pool, tri_offset, nblk, blist, origins, dirs, tmax
    )
    redo = over | over_budget

    # cleanup: compact overflow rays to the front, re-run the inline walker
    # (non-overflow rays get tmax 0 -> one-step exit). Overflow is empty on
    # every benchmarked workload; this pass guarantees correctness anyway.
    perm = jnp.argsort(~redo, stable=True)  # overflow rays first
    inv = jnp.argsort(perm)
    tm2 = jnp.where(redo, jnp.asarray(tmax, jnp.float32), 0.0)[perm]
    state = _init_state(r, tm2)
    out = _map_tiles(
        pool, node_offset, tri_offset,
        tuple(c[perm] for c in o), tuple(c[perm] for c in d),
        state, tile, None, False,
    )
    t_fix = jnp.take(out[2], inv)
    tri_fix = jnp.take(out[3], inv)
    best_t = jnp.where(redo, t_fix, best_t)
    best_tri = jnp.where(redo, tri_fix, best_tri)
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


def intersect_mesh(pool: MeshPool, node_offset, tri_offset, origins, dirs, tmax,
                   num_tris: int | None = None, tile: int | None = None):
    """Vectorized closest-hit against one mesh sub-BVH. origins/dirs: (R, 3);
    tmax: (R,). Returns (t, tri_local, u, v, w, n_geo) with t=inf on miss;
    tri_local indexes the *block-padded* pool order.

    If num_tris is given and small, skips the tree entirely and tests all
    triangles broadcast against all rays — for tiny meshes (area-light
    quads) the O(T*R) masked sweep beats any traversal. Big meshes (block
    table beyond VMEM staging) use the collect-then-test path; mid-size
    ones the inline lockstep walk.
    """
    if num_tris is not None and num_tris <= BLOCK_SIZE:
        return _intersect_mesh_brute(
            pool, tri_offset, num_tris, origins, dirs, tmax
        )

    tile = TILE if tile is None else tile
    if pool.block_rows.size * 4 >= COLLECT_MIN_BYTES:
        best_t, best_tri = _run_collect(
            pool, node_offset, tri_offset, origins, dirs, tmax, tile
        )
    else:
        best_t, best_tri = _run_tiled(
            pool, node_offset, tri_offset, origins, dirs, tmax, tile
        )
    return _refit_hit(pool, tri_offset, origins, dirs, best_tri, best_t)


# ------------------------------------------------------------------ any-hit


def _traverse_tile_any(pool, node_offset, tri_offset, o, d, tmax):
    """Any-hit (occlusion) variant: a ray terminates the moment any
    triangle hit with t < tmax is found. Shadow rays exit orders of
    magnitude earlier than closest-hit (render.cpp's shadow Trace has no
    such early-out; this is a TPU-side improvement). Single-phase: the
    early-out keeps the lockstep tail short."""
    rd = _safe_rcp3(d)
    block_base = tri_offset // BLOCK_SIZE
    r = o[0].shape[0]

    state = (
        jnp.zeros((r,), jnp.int32),  # cur
        jnp.zeros((r,), jnp.int32),  # lc
        jnp.zeros((r,), jnp.bool_),  # occluded
    )
    tmax = jnp.asarray(tmax, jnp.float32)

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        cur, lc, occ = s
        live = cur >= 0
        row = pool.node_rows[node_offset + jnp.maximum(cur, 0)]
        ok, words, skip = _child_tests(row, o, rd, tmax, live)

        s_slot = jnp.full_like(cur, 4)
        w_s = jnp.zeros_like(cur)
        for c in range(3, -1, -1):
            cand = ok[c] & (words[c] < 0) & (lc <= c)
            s_slot = jnp.where(cand, jnp.int32(c), s_slot)
            w_s = jnp.where(cand, words[c], w_s)
        dwell = live & (s_slot < 4)
        blk_local = -w_s - 1

        found, _, _ = _block_test(
            pool, block_base, blk_local, dwell, o, d, tmax
        )
        occ = occ | found

        nxt = skip
        for c in range(3, -1, -1):
            nxt = jnp.where(ok[c] & (words[c] >= 0), words[c], nxt)
        nxt = jnp.where(found, jnp.int32(-1), nxt)  # early exit on hit
        cur = jnp.where(
            live, jnp.where(dwell & ~found, cur, nxt), cur
        )
        lc = jnp.where(dwell & ~found, s_slot + 1, 0)
        return cur, lc, occ

    return jax.lax.while_loop(cond, body, state)[2]


def intersect_mesh_any(pool: MeshPool, node_offset, tri_offset, origins, dirs,
                       tmax, num_tris: int | None = None, tile: int | None = None):
    """Boolean occlusion query against one mesh sub-BVH: does any triangle
    intersect with t < tmax? origins/dirs: (R, 3); tmax: (R,)."""
    if num_tris is not None and num_tris <= BLOCK_SIZE:
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
    """Per-ray step count (node visits + leaf-block steps) — the
    `eComplexity` debug view the reference reserves but never implements
    (render.h:45, render.cpp:516-519). Returns (R,) f32 counts."""
    if num_tris is not None and num_tris <= BLOCK_SIZE:
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
    ray dim in lanes. Padding duplicates in the block layout are harmless:
    they tie with their real source triangle."""
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
