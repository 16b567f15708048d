"""Batched BVH traversal in pure JAX, shaped for the TPU's memory system.

TPU-first re-expression of the reference's per-thread stack traversal
(intersection.h:678-749 IntersectRayMesh, intersection.h:751-799 QueryBVH).
The design is driven by an empirically measured cost model of this runtime
(r2: benchmarks/microbench_r2*.py; r3: r5_gather_shape.py, r5_overhead.py,
r5_periter_decomp.py, all measured ON TPU v5 by slope between two in-jit
iteration counts — single-dispatch timings are polluted by a 14-28 ms
SESSION-VARIABLE tunnel dispatch floor):

  * a dependent in-loop row gather step costs ~8-9 ns PER LANE, linear in
    lanes from 4096 up, and FLAT in both stored row width and consumed
    columns up to ~128-col rows (+12-15% at 192-256): the gather issue
    rate is the wall, not bandwidth and not column count;
  * a SECOND independent gather in the same step overlaps: +~4 ns/lane
    instead of double — the node gather and the deferred leaf-block
    gather pay ~half price;
  * per-child STRIDED column extracts from a gathered row are the hidden
    killer: each (row[:, c]) costs a physical relayout (measured 10x
    per-step blowup at 16 children) — all consumers must be contiguous
    (R, K) column groups;
  * elementwise VPU math on (R, K) groups is ~free next to the gathers,
    but unrolled K-deep select chains are not (they are strided extracts
    in disguise);
  * in lockstep, a tile runs until its WORST ray finishes; cost is per
    lane, so total time follows sum-over-tiles of per-tile max steps.

Algorithm: **16-ary compressed-stack DFS with parent-dwell leaf blocks**
(layout built by accel.build.build_wide_bvh; WIDE_K switchable 4/8/16):

  * an internal node row carries SIXTEEN child AABBs, bf16-packed one
    u32 per axis per child, COMPONENT-MAJOR (x cols [0,K), y [K,2K),
    z [2K,3K), child words [3K,4K)) — one 64-of-72-column read tests 16
    children at the same per-step price as 4 (flat-in-columns law), and
    every consumer slices contiguous groups;
  * leaves are padded 16-triangle blocks; a hit leaf child is tested in
    ONE deferred step (a 192-float block gather overlapped with the next
    node gather + 16 lockstep Moller-Trumbore tests on contiguous
    component-major column groups) while the cursor dwells at the parent,
    so leaves own no rows and no stack entries;
  * the advance is the wide-BVH COMPRESSED stack (the TPU cousin of
    Ylitie et al. 2017): descend into the first hit internal child at
    slot >= ic; if more hit internal slots follow, push ONE int32 entry
    (cur << 4 | next_slot). On pop the node row is re-gathered and the
    scan resumes at the stored slot — hits are re-derived and can only
    shrink under the tightened best_t (a free prune). Stack depth is
    bounded by the count of >=2-internal-children ancestors (6 slots on
    the 524k-tri sphere at K=16, vs 64 for the old value stack), and the
    push is one select chain instead of K-1.

The lockstep tail is cut by TWO-PHASE tiling: phase 1 runs every tile
with a step cap (early-exiting tiles stop sooner); the few unfinished
rays are compacted to the front (one stable argsort) and phase 2
finishes them, RESTARTING from the root with the tightened best_t.
Triangles are pre-deindexed at scene-flatten time in block-padded order
so a leaf is one contiguous 192-float row.

Measured on the 524k-tri closest-hit benchmark (machine rate, dispatch
excluded): 0.33 (r1) -> ~1.4 (r2 design re-measured honestly) -> 3.35
Mrays/s (r3: K=16 + compressed stack + component-major rows, tile 4096
cap 16). Swept-and-rejected on TPU this round: K=4/8 (1.36/2.41), tiles
1024/2048/8192/16384 (1.78-3.35 with 4096 best), BLOCK_SIZE 32/64 (2.5
-2.7 — wider block rows cost more than the halved dwell steps save),
and the K-1-push value stack (0.61 at K=16).

Swept-and-rejected r4 (on top of stacked-permute compaction, 6.3
Mrays/s): a (R, S) stack MATRIX carry with broadcast one-hot push/pop
instead of the tuple-of-(R,) slots (median 6.10 vs 6.30 over 5
interleaved runs — the one-hot iota compare costs more than the while
carry copies it removes); multi-phase cap schedules with early-exit
while tiles for the later phases (PHASE_CAPS (8,24): 5.21, (8,16,48):
4.97 vs two-phase 6.1-6.3 — each extra compaction+restart re-walks the
root for every live ray and the idle-tile exit does not pay for it);
distance-ordered descent (benchmarks/r7_order_sim.py: mean steps 5.41
static vs 5.40 tn-ordered at K=16 — at 16-wide fanout the shallow tree
leaves nothing for ordering to prune, unlike the reference's binary
tree).

Packet traversal, r5 CORRECTION: the r4 note here rejected packets as
"union-step inflation 3.4x at G=8 beats the 2.4x gather-amortization
win". The inflation/win numbers were right (the r7_packet_sim.py
docstring's RESULT block was the mis-transcription — re-run live r5),
but the CONCLUSION was wrong, for two effects the G/inflation model
misses: packets homogenize the lockstep tail (union max/mean ~2.2x vs
8.6x per-ray at 4096 lanes), and a P-lane packet step costs well under
R-lane per-ray steps even counting the (P, G, K) broadcast tests
(the VPU was the idle resource). Device A/B (benchmarks/r10_packets.py):
~2x end-to-end on the coherent 524k-tri benchmark at G=8. Shared-walk
packets now live in accel.packets (opt-in via intersect_mesh packet_g;
per-ray remains the default for incoherent bounce rays).

Mosaic/Pallas has no large-table per-lane dynamic gather (indices must
match the table shape), so this stays pure JAX by design — measured and
re-confirmed in round 1.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import build as _build

TILE = 4096  # rays per early-exit tile; swept on TPU v5 (524k-tri
# benchmark): 4096 edges out 8192 (1.21 vs 1.10 Mrays/s) — smaller tiles
# localize the worst-ray tail that two-phase compaction then mops up.
PHASE1_CAP = 16  # phase-1 step cap (~p95 of per-ray steps at WIDE_K=16 on
# the 524k-tri benchmark; r5_chained.py sweep); the tail beyond it is
# finished compacted in phase 2.
PHASE1_FORI = True  # run capped phases as fixed-trip fori_loops (no
# any()-cond per iteration, no early tile exit). Measured on TPU (524k
# bench, k=16 tile 4096): fori 3.45 vs while 3.35 Mrays/s at cap 16;
# lower caps with fori lose (12: 2.78, 10: 2.33 — the phase-2 restart
# re-walk costs more than the saved phase-1 iterations), and a 3-phase
# cap 8/16 schedule loses big (1.39).
PHASE_RESTART = True  # phase-2 entry: re-walk from the root with the
# tightened best_t (True) vs resume the carried walk state (False).
# Measured on TPU (524k bench, k=16 tile 4096 cap 16): restart 3.35 vs
# resume 2.84 Mrays/s — the tightened-best_t re-walk prunes more than
# resuming saves, even with the compressed stack's cheap permutation.
PHASE2_CAP = None  # optional cap for phase 2: when set, the schedule
# deepens to capped-phase-2 -> second compaction -> uncapped phase 3
# (each restart carries the tightened best_t). None = classic two-phase.
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

    # K-ary internal node rows (see accel.build.WideBVH; K = WIDE_K,
    # shipped 16): COMPONENT-MAJOR — cols [0,K) bf16-packed x lo/hi (one
    # u32 per child), [K,2K) y, [2K,3K) z, [3K,4K) bitcast child words,
    # plus pad to the row stride. (Ni, 72) f32 at K=16.
    node_rows: jax.Array  # (Ni, 4*K + pad) f32

    # leaf blocks: 16 padded triangles, component-major within the row
    # (16x v0x | 16x v0y | ... | 16x v2z | 48 pad) — one row gather tests
    # a whole leaf via contiguous 16-wide column groups
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
    real_tris: int = 0  # unpadded triangle count (0 = unknown: use padded).
    # The single-block brute path slices only the real rows — padding
    # repeats the last real triangle, an 8x masked-sweep waste for 2-tri
    # quads (the cornell walls) if tested
    stack_slots: int = 48  # exact worst-case DFS stack bound of this
    # sub-BVH (accel.build.wide_stack_bound); the traversal carry
    # allocates this many per-lane slots


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


def _unpack_axis(col):
    """Decode one packed-box column: u32 with bf16(upper) in the high half
    and bf16(lower) in the low half (accel.build._bf16_pack_bounds).
    NaN-filled empty slots decode to NaN and fail every comparison."""
    u = jax.lax.bitcast_convert_type(col, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitwise_and(u, jnp.uint32(0xFFFF0000)), jnp.float32
    )
    lo = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(u, jnp.uint32(16)), jnp.float32
    )
    return lo, hi


def _child_tests(row, o, rd, best_t, live):
    """Slab-test the K bf16-packed child AABBs in a node row. Layout is
    COMPONENT-MAJOR (x-packed cols [0,K), y [K,2K), z [2K,3K), words
    [3K,4K)) so the consumers are contiguous (R, K) column groups —
    per-child strided extracts cost one relayout each (measured 10x
    per-step blowup at K=16), exactly like the leaf-block row. Bounds are
    rounded outward at build time, making the test conservative; the
    stored skip column is not read (the compressed stack replaced it).
    K comes from build.WIDE_K (r5_gather_shape.py: per-step gather cost
    is flat in consumed columns to ~128-col rows, so wide nodes test
    8/16 children at the 4-child price).
    Returns (ok, words): (R, K) bool / int32."""
    from .build import WIDE_K as K

    lox, hix = _unpack_axis(row[:, 0:K])
    loy, hiy = _unpack_axis(row[:, K : 2 * K])
    loz, hiz = _unpack_axis(row[:, 2 * K : 3 * K])
    ox, oy, oz = (c[:, None] for c in o)
    rx, ry, rz = (c[:, None] for c in rd)
    t0x = (lox - ox) * rx
    t1x = (hix - ox) * rx
    t0y = (loy - oy) * ry
    t1y = (hiy - oy) * ry
    t0z = (loz - oz) * rz
    t1z = (hiz - oz) * rz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    ok = live[:, None] & (tn <= tf) & (tn < best_t[:, None])
    words = jax.lax.bitcast_convert_type(
        row[:, 3 * K : 4 * K], jnp.int32
    )
    return ok, words


def _child_tests_packet_rows(row, o, rd, best_t, live):
    """Packet variant of _child_tests: one gathered (P, 4K+pad) node row
    per PACKET, slab-tested against all G member rays as (P, G, K)
    broadcast elementwise work (accel.packets). o/rd: 3-tuples of (P, G);
    best_t: (P, G) per-ray; live: (P,). The box unpack happens once per
    packet; the broadcasts fuse into the consumers (nothing (P, G, K) is
    gathered, only computed). Returns (ok (P, G, K), words (P, K))."""
    from .build import WIDE_K as K

    lox, hix = _unpack_axis(row[:, 0:K])
    loy, hiy = _unpack_axis(row[:, K : 2 * K])
    loz, hiz = _unpack_axis(row[:, 2 * K : 3 * K])
    bx = (lox[:, None, :], hix[:, None, :])  # (P, 1, K)
    by = (loy[:, None, :], hiy[:, None, :])
    bz = (loz[:, None, :], hiz[:, None, :])
    ox, oy, oz = (c[:, :, None] for c in o)  # (P, G, 1)
    rx, ry, rz = (c[:, :, None] for c in rd)
    t0x = (bx[0] - ox) * rx
    t1x = (bx[1] - ox) * rx
    t0y = (by[0] - oy) * ry
    t1y = (by[1] - oy) * ry
    t0z = (bz[0] - oz) * rz
    t1z = (bz[1] - oz) * rz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    ok = live[:, None, None] & (tn <= tf) & (tn < best_t[:, :, None])
    words = jax.lax.bitcast_convert_type(
        row[:, 3 * K : 4 * K], jnp.int32
    )
    return ok, words


def _stack_push(stack, sp, value, mask):
    """Push `value` on lanes where `mask`. stack: tuple of (R,) i32 slot
    arrays; sp: (R,) i32 depth. Per-lane dynamic indexing is an unrolled
    select chain — elementwise VPU work, ~free next to the row gathers."""
    out = tuple(
        jnp.where(mask & (sp == j), value, s) for j, s in enumerate(stack)
    )
    return out, sp + mask.astype(jnp.int32)


def _stack_pop(stack, sp, mask):
    """Pop on lanes where `mask`; returns (value, sp'). Lanes popping an
    empty stack get -1 (the walk-finished sentinel)."""
    top = sp - 1
    val = jnp.full_like(sp, -1)
    for j, s in enumerate(stack):
        val = jnp.where(mask & (top == j), s, val)
    return val, sp - (mask & (sp > 0)).astype(jnp.int32)


def _block_test(pool, block_base, blk_local, dwell, o, d, best_t):
    """Gather one padded 16-tri leaf block per ray and test all triangles.
    Returns (found, t_min, tri_local) where tri_local indexes padded order."""
    brow = pool.block_rows[block_base + jnp.where(dwell, blk_local, 0)]
    return _block_test_row(brow, blk_local, dwell, o, d, best_t)


def _block_test_row(brow, blk_local, dwell, o, d, best_t):
    ob = tuple(c[:, None] for c in o)
    db = tuple(c[:, None] for c in d)
    B = _build.BLOCK_SIZE
    va = (brow[:, 0:B], brow[:, B : 2 * B], brow[:, 2 * B : 3 * B])
    vb = (brow[:, 3 * B : 4 * B], brow[:, 4 * B : 5 * B], brow[:, 5 * B : 6 * B])
    vc = (brow[:, 6 * B : 7 * B], brow[:, 7 * B : 8 * B], brow[:, 8 * B : 9 * B])
    hit, t = _tri_hit(va, vb, vc, ob, db)  # (R, 16)
    tt = jnp.where(hit & dwell[:, None] & (t < best_t[:, None]), t, INF)
    t_min = tt.min(axis=1)
    found = t_min < best_t
    slot = jnp.argmin(tt, axis=1).astype(jnp.int32)
    tri_local = blk_local * B + slot
    return found, t_min, tri_local


def _step(pool, node_offset, block_base, o, d, rd, st):
    """One lockstep traversal step with a DEFERRED leaf-block test.

    The step-k node gather (indexed by `cur`) and the step-k block gather
    (indexed by `pend`, the leaf block found at step k-1) both depend only
    on the carry, so the memory system overlaps them — measured 19.7 ->
    12.5 us/iter at 4096 lanes vs chaining them in one step
    (benchmarks/microbench_r3_gatherdep.py). The deferral costs one extra
    flush iteration per ray and a one-step-stale best_t in the child prune
    (visits never drop a closer hit: best_t only shrinks), and preserves
    block visit ORDER.

    Advance, COMPRESSED-STACK form (the TPU cousin of Ylitie et al.'s
    wide-BVH traversal): descend into the first hit internal child at
    slot >= ic; if another hit internal slot follows, push ONE entry
    (cur << 4 | that_slot). On pop, the node row is re-gathered and the
    child scan resumes at the stored slot — hit results are re-derived,
    and can only SHRINK under the tightened best_t (a free prune). This
    replaces pushing up to K-1 child words: the r3 k=16 A/B showed the
    unrolled (K-1) x slots push chains dominating the step (0.61 vs 1.58
    Mrays/s); one push into a depth-bounded stack makes the VPU side
    O(slots), and stack depth drops from sum(m-1) to internal depth."""
    from .build import WIDE_K as K

    cur, lc, ic, pend, sp, stack = (
        st["cur"], st["lc"], st["ic"], st["pend"], st["sp"], st["stack"]
    )
    best_t, best_tri = st["best_t"], st["best_tri"]

    live = cur >= 0
    row = pool.node_rows[node_offset + jnp.maximum(cur, 0)]  # gather 1
    has_pend = pend >= 0
    brow = pool.block_rows[
        block_base + jnp.where(has_pend, pend, 0)
    ]  # gather 2 — independent of gather 1

    # test the block found LAST step; its best_t tighten lands before the
    # child prune below (elementwise, does not re-serialize the gathers)
    found, t_min, tri_local = _block_test_row(
        brow, pend, has_pend, o, d, best_t
    )
    best_t = jnp.where(found, t_min, best_t)
    best_tri = jnp.where(found, tri_local, best_tri)

    ok, words = _child_tests(row, o, rd, best_t, live)  # (R, K)

    # smallest hit-leaf child slot >= lc (the next pending block);
    # resumed visits arrive with lc == K, skipping re-tested leaves.
    # All scans are vectorized (R, K) masked reductions — unrolled
    # per-slot select chains cost a relayout per extracted column.
    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    leafm = ok & (words < 0) & (slots >= lc[:, None])
    s = jnp.min(jnp.where(leafm, slots, K), axis=1)
    w_s = jnp.where(slots == s[:, None], words, 0).sum(axis=1)
    dwell = live & (s < K)
    pend = jnp.where(dwell, -w_s - 1, jnp.int32(-1))  # ~word

    # descend target: first hit internal child slot >= ic; the NEXT hit
    # internal slot (if any) goes into one compressed stack entry
    intm = ok & (words >= 0) & (slots >= ic[:, None])
    first_c = jnp.min(jnp.where(intm, slots, K), axis=1)
    desc = jnp.where(slots == first_c[:, None], words, 0).sum(axis=1)
    second_c = jnp.min(
        jnp.where(intm & (slots > first_c[:, None]), slots, K), axis=1
    )
    has_desc = first_c < K
    adv = live & ~dwell
    sbits = (K - 1).bit_length()  # slot field width (4 @ K=16, 5 @ K=32)
    stack, sp = _stack_push(
        stack, sp,
        jax.lax.shift_left(cur, sbits) | second_c,
        adv & (second_c < K),
    )
    popped, sp = _stack_pop(stack, sp, adv & ~has_desc)
    resumed = popped >= 0
    cur = jnp.where(
        adv,
        jnp.where(
            has_desc, desc,
            jnp.where(resumed, jax.lax.shift_right_logical(popped, sbits),
                      jnp.int32(-1)),
        ),
        cur,
    )
    ic = jnp.where(
        adv,
        jnp.where(has_desc, jnp.int32(0),
                  jnp.where(resumed, popped & ((1 << sbits) - 1), jnp.int32(0))),
        ic,
    )
    # descend -> fresh node (lc 0); pop-resume -> leaves already done
    lc = jnp.where(
        dwell, s + 1,
        jnp.where(adv, jnp.where(has_desc, jnp.int32(0), jnp.int32(K)), lc),
    )
    return dict(
        cur=cur, lc=lc, ic=ic, pend=pend, sp=sp, stack=stack,
        best_t=best_t, best_tri=best_tri,
    )


def _traverse_tile(pool, node_offset, tri_offset, o, d, state, cap=None,
                   with_steps=False):
    """Run the traversal loop on one ray tile from `state` (the dict built
    by _init_state); optionally capped at `cap` iterations (phase 1 of the
    two-phase schedule)."""
    rd = _safe_rcp3(d)
    block_base = tri_offset // _build.BLOCK_SIZE
    use_counter = cap is not None

    # a lane is unfinished while it has a node to visit OR a block to flush
    def unfinished(s):
        return (s["cur"] >= 0) | (s["pend"] >= 0)

    if cap is None:
        def cond(s):
            return jnp.any(unfinished(s))
    else:
        def cond(s):
            return jnp.any(unfinished(s)) & (s["it"] < cap)

    def body(s):
        live = unfinished(s)
        out = _step(pool, node_offset, block_base, o, d, rd, s)
        if with_steps:
            out["steps"] = s["steps"] + live.astype(jnp.float32)
        if use_counter:
            out["it"] = s["it"] + 1
        return out

    init = dict(state)
    if use_counter and PHASE1_FORI:
        # capped phase as a fixed-trip fori: drops the per-iteration
        # any()-reduce cond at the price of early-exiting tiles running
        # to the cap anyway (A/B knob; measured on TPU — see PHASE1_FORI)
        def fbody(i, s):
            live = unfinished(s)
            out = _step(pool, node_offset, block_base, o, d, rd, s)
            if with_steps:
                out["steps"] = s["steps"] + live.astype(jnp.float32)
            return out

        return jax.lax.fori_loop(0, cap, fbody, init)
    if use_counter:
        init["it"] = jnp.int32(0)
    out = jax.lax.while_loop(cond, body, init)
    out.pop("it", None)
    return out


DEFAULT_STACK_SLOTS = 48  # conservative fallback when the caller does not
# pass the exact per-tree bound (accel.build.wide_stack_bound; flatten
# refuses trees needing more, so the fallback is always safe)


def _permute_many(perm, cols):
    """Permute many (R,) arrays by ONE row gather over a stacked (R, C)
    f32 matrix. Measured (r4 profiler timeline): a scalar (R,) permute
    costs a full gather dispatch (~0.5 ms at 65k lanes — per-lane gather
    cost is FLAT in row width from 1 to ~96 cols), and the r3 compaction
    did ~13 of them, costing as much as all of phase 1. Stacking makes it
    one gather; the stack/unstack are dense stream ops XLA fuses."""
    f32 = [
        c if c.dtype == jnp.float32
        else jax.lax.bitcast_convert_type(c, jnp.float32)
        for c in cols
    ]
    m = jnp.stack(f32, axis=-1)[perm]
    out = []
    for i, c in enumerate(cols):
        v = m[:, i]
        if c.dtype != jnp.float32:
            v = jax.lax.bitcast_convert_type(v, c.dtype)
        out.append(v)
    return out


def _unpermute_many(perm, cols):
    """Invert a permutation on many (R,) arrays with ONE row scatter of
    the stacked matrix (replaces the r3 inverse-argsort + per-array takes
    — an extra SORT plus one gather per array)."""
    f32 = [
        c if c.dtype == jnp.float32
        else jax.lax.bitcast_convert_type(c, jnp.float32)
        for c in cols
    ]
    m = jnp.stack(f32, axis=-1)
    inv = jnp.zeros_like(m).at[perm].set(m)
    out = []
    for i, c in enumerate(cols):
        v = inv[:, i]
        if c.dtype != jnp.float32:
            v = jax.lax.bitcast_convert_type(v, c.dtype)
        out.append(v)
    return out


def _init_state(r, tmax, stack_slots, with_steps=False):
    st = dict(
        cur=jnp.zeros((r,), jnp.int32),
        lc=jnp.zeros((r,), jnp.int32),
        ic=jnp.zeros((r,), jnp.int32),  # internal-child resume cursor
        pend=jnp.full((r,), -1, jnp.int32),  # deferred leaf block (-1=none)
        sp=jnp.zeros((r,), jnp.int32),
        stack=tuple(
            jnp.zeros((r,), jnp.int32) for _ in range(stack_slots)
        ),
        best_t=jnp.asarray(tmax, jnp.float32),
        best_tri=jnp.full((r,), -1, jnp.int32),
    )
    if with_steps:
        st["steps"] = jnp.zeros((r,), jnp.float32)
    return st


def _map_tiles(pool, node_offset, tri_offset, o, d, state, tile, cap,
               with_steps):
    """lax.map the capped/uncapped loop over fixed-size tiles; each tile's
    while_loop exits when its own rays finish. node_offset/tri_offset are
    per-ray (R,) arrays (vector offsets: every ray may traverse a
    different sub-BVH — how all mesh instances of a scene run in ONE
    compiled traversal instead of one subgraph per mesh)."""
    r = o[0].shape[0]
    if r <= tile:
        return _traverse_tile(
            pool, node_offset, tri_offset, o, d, state, cap, with_steps
        )
    n_tiles = r // tile

    def one(args):
        oo, dd, no, to, st = args
        return _traverse_tile(pool, no, to, oo, dd, st, cap, with_steps)

    resh = lambda x: x.reshape(n_tiles, tile)
    parts = (
        tuple(resh(c) for c in o),
        tuple(resh(c) for c in d),
        resh(node_offset),
        resh(tri_offset),
        jax.tree_util.tree_map(resh, state),
    )
    out = jax.lax.map(one, parts)
    return jax.tree_util.tree_map(lambda x: x.reshape(r), out)


def _run_tiled(pool, node_offset, tri_offset, origins, dirs, tmax, tile,
               stack_slots, with_steps=False):
    """Two-phase tiled traversal: capped phase 1 over all tiles, then a
    stable compaction of unfinished rays to the front, then uncapped
    phase 2 (tiles of finished rays exit after one iteration).
    PHASE_RESTART picks the phase-2 entry state: True re-walks from the
    root with the tightened best_t (the r2 design, small permutation);
    False carries the WHOLE walk state through the compaction — with the
    compressed stack that is only ~10 extra (R,) int32 permutes, and the
    tail rays resume instead of re-walking.
    Returns (best_t, best_tri[, steps])."""
    r = origins.shape[0]
    node_offset = jnp.broadcast_to(
        jnp.asarray(node_offset, jnp.int32), (r,)
    )
    tri_offset = jnp.broadcast_to(jnp.asarray(tri_offset, jnp.int32), (r,))
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
        node_offset = jnp.concatenate(
            [node_offset, jnp.zeros((pad,), jnp.int32)]
        )
        tri_offset = jnp.concatenate(
            [tri_offset, jnp.zeros((pad,), jnp.int32)]
        )
        out = _run_tiled(
            pool, node_offset, tri_offset, origins, dirs, tmax, tile,
            stack_slots, with_steps,
        )
        return tuple(x[:r] for x in out)

    o = _split3(origins)
    d = _split3(dirs)
    state = _init_state(r, tmax, stack_slots, with_steps)

    def results(out):
        res = (out["best_t"], out["best_tri"])
        if with_steps:
            res = res + (out["steps"],)
        return res

    if r <= tile:
        out = _traverse_tile(
            pool, node_offset, tri_offset, o, d, state, None, with_steps
        )
        return results(out)

    # capped phases, each followed by a stable compaction of unfinished
    # rays to the front and a restart from the root with the tightened
    # best_t; the final phase runs uncapped. All compaction data movement
    # is ONE stacked row gather per phase + ONE row scatter at the end
    # (the r3 per-array permutes + inverse argsort cost ~6 ms of the
    # 15 ms bigmesh pipeline — as much as phase 1 itself).
    caps = [PHASE1_CAP]
    if PHASE2_CAP is not None:
        caps.append(PHASE2_CAP)
    no = node_offset
    to = tri_offset
    st = state
    total_perm = jnp.arange(r)
    for cap_i in caps:
        st1 = _map_tiles(pool, no, to, o, d, st, tile, cap_i, with_steps)
        finished = (st1["cur"] < 0) & (st1["pend"] < 0)
        perm = jnp.argsort(finished.astype(jnp.int8), stable=True)
        if PHASE_RESTART:
            cols = list(o) + list(d) + [
                no, to, total_perm.astype(jnp.int32),
                st1["best_t"], st1["best_tri"],
                finished.astype(jnp.float32),
            ] + ([st1["steps"]] if with_steps else [])
            pc = _permute_many(perm, cols)
            o, d = tuple(pc[0:3]), tuple(pc[3:6])
            no, to, total_perm = pc[6], pc[7], pc[8]
            bt_p, tri_p, fin_p = pc[9], pc[10], pc[11]
            st = _init_state(r, bt_p, stack_slots, with_steps)
            st["cur"] = jnp.where(fin_p > 0.5, jnp.int32(-1), jnp.int32(0))
            st["best_tri"] = tri_p
            if with_steps:
                st["steps"] = pc[12]
        else:
            total_perm = total_perm[perm]
            o = tuple(c[perm] for c in o)
            d = tuple(c[perm] for c in d)
            no = no[perm]
            to = to[perm]
            st = jax.tree_util.tree_map(lambda x: x[perm], st1)
    out = _map_tiles(pool, no, to, o, d, st, tile, None, with_steps)
    return tuple(
        _unpermute_many(total_perm.astype(jnp.int32), list(results(out)))
    )


def _refit_hit(pool: MeshPool, tri_offset, origins, dirs, best_tri, best_t):
    """Recompute (u, v, w, n_geo) at the winning triangle — one vectorized
    differentiable triangle test instead of carrying barycentrics through
    the loop. Vertices come from ONE block-row gather + (R, B) one-hot
    column reduces (~24 ns/row) instead of nine 1-D plane gathers
    (~12 ns/lane each — measured ~4.7 ms of the r3 bigmesh walk)."""
    from ..geometry.intersect import intersect_ray_tri

    B = _build.BLOCK_SIZE
    gt = tri_offset + jnp.maximum(best_tri, 0)
    brow = pool.block_rows[gt // B]
    onehot = (
        jnp.arange(B, dtype=jnp.int32)[None, :] == (gt % B)[:, None]
    ).astype(brow.dtype)
    comps = [
        (onehot * brow[:, i * B : (i + 1) * B]).sum(axis=1) for i in range(9)
    ]
    v0 = jnp.stack(comps[0:3], axis=-1)
    v1 = jnp.stack(comps[3:6], axis=-1)
    v2 = jnp.stack(comps[6:9], axis=-1)
    hit, t, u, v, w, n = intersect_ray_tri(v0, v1, v2, origins, dirs)
    found = best_tri >= 0
    t = jnp.where(found, best_t, INF)
    return t, best_tri, u, v, w, n


def intersect_mesh(pool: MeshPool, node_offset, tri_offset, origins, dirs, tmax,
                   num_tris: int | None = None, tile: int | None = None,
                   stack_slots: int | None = None,
                   packet_g: int | None = None):
    """Vectorized closest-hit against one mesh sub-BVH. origins/dirs: (R, 3);
    tmax: (R,). Returns (t, tri_local, u, v, w, n_geo) with t=inf on miss;
    tri_local indexes the *block-padded* pool order.

    If num_tris is given and small, skips the tree entirely and tests all
    triangles broadcast against all rays — for tiny meshes (area-light
    quads) the O(T*R) masked sweep beats any traversal.

    stack_slots: worst-case DFS stack bound of the (deepest) sub-BVH
    traversed, from MeshHandle.stack_slots / accel.build.wide_stack_bound.
    None falls back to DEFAULT_STACK_SLOTS (always safe — flatten refuses
    deeper trees — but costs extra elementwise push/pop selects).

    packet_g: opt into shared-walk PACKET traversal (accel.packets) with
    packets of this many consecutive rays — for COHERENT batches (camera
    tiles, frontal sweeps) it is ~2x the per-ray walk on the 524k-tri
    benchmark (device A/B, benchmarks/r10_packets.py). Requires scalar
    node/tri offsets (one sub-BVH per call) and R % packet_g == 0;
    incoherent rays should stay on the per-ray walk (union inflation
    eats the gather win — r7_packet_sim.py diffuse rows).
    """
    if num_tris is not None and num_tris <= _build.BLOCK_SIZE:
        return _intersect_mesh_brute(
            pool, tri_offset, num_tris, origins, dirs, tmax
        )

    ss = DEFAULT_STACK_SLOTS if stack_slots is None else stack_slots
    if packet_g is not None and origins.shape[0] % packet_g == 0:
        from .packets import intersect_mesh_packets

        best_t, best_tri = intersect_mesh_packets(
            pool, node_offset, tri_offset, origins, dirs, tmax,
            g=packet_g, stack_slots=ss, tile=tile,
        )
        return _refit_hit(pool, tri_offset, origins, dirs, best_tri, best_t)

    tile = TILE if tile is None else tile
    best_t, best_tri = _run_tiled(
        pool, node_offset, tri_offset, origins, dirs, tmax, tile, ss
    )
    return _refit_hit(pool, tri_offset, origins, dirs, best_tri, best_t)


# ------------------------------------------------------------------ any-hit


def _traverse_tile_any(pool, node_offset, tri_offset, o, d, tmax,
                       stack_slots):
    """Any-hit (occlusion) variant: a ray terminates the moment any
    triangle hit with t < tmax is found. Shadow rays exit orders of
    magnitude earlier than closest-hit (render.cpp's shadow Trace has no
    such early-out; this is a TPU-side improvement). Single-phase: the
    early-out keeps the lockstep tail short."""
    from .build import WIDE_K as K

    rd = _safe_rcp3(d)
    block_base = tri_offset // _build.BLOCK_SIZE
    r = o[0].shape[0]

    state = (
        jnp.zeros((r,), jnp.int32),  # cur
        jnp.zeros((r,), jnp.int32),  # lc
        jnp.zeros((r,), jnp.int32),  # ic (internal resume cursor)
        jnp.full((r,), -1, jnp.int32),  # pend (deferred leaf block)
        jnp.zeros((r,), jnp.int32),  # sp
        tuple(jnp.zeros((r,), jnp.int32) for _ in range(stack_slots)),
        jnp.zeros((r,), jnp.bool_),  # occluded
    )
    tmax = jnp.asarray(tmax, jnp.float32)

    def cond(s):
        return jnp.any((s[0] >= 0) | (s[3] >= 0))

    def body(s):
        cur, lc, ic, pend, sp, stack, occ = s
        live = cur >= 0
        row = pool.node_rows[node_offset + jnp.maximum(cur, 0)]
        has_pend = pend >= 0
        brow = pool.block_rows[
            block_base + jnp.where(has_pend, pend, 0)
        ]  # independent of the node gather: both index only the carry

        found, _, _ = _block_test_row(brow, pend, has_pend, o, d, tmax)
        occ = occ | found

        act = live & ~occ  # occluded lanes stop walking immediately
        ok, words = _child_tests(row, o, rd, tmax, act)  # (R, K)

        slots = jnp.arange(K, dtype=jnp.int32)[None, :]
        leafm = ok & (words < 0) & (slots >= lc[:, None])
        s_slot = jnp.min(jnp.where(leafm, slots, K), axis=1)
        w_s = jnp.where(slots == s_slot[:, None], words, 0).sum(axis=1)
        dwell = act & (s_slot < K)
        pend = jnp.where(dwell, -w_s - 1, jnp.int32(-1))

        # compressed stack (see _step): one (cur << 4 | slot) entry
        intm = ok & (words >= 0) & (slots >= ic[:, None])
        first_c = jnp.min(jnp.where(intm, slots, K), axis=1)
        desc = jnp.where(slots == first_c[:, None], words, 0).sum(axis=1)
        second_c = jnp.min(
            jnp.where(intm & (slots > first_c[:, None]), slots, K), axis=1
        )
        has_desc = first_c < K
        adv = act & ~dwell
        sbits = (K - 1).bit_length()
        stack, sp = _stack_push(
            stack, sp,
            jax.lax.shift_left(cur, sbits) | second_c,
            adv & (second_c < K),
        )
        popped, sp = _stack_pop(stack, sp, adv & ~has_desc)
        resumed = popped >= 0
        nxt = jnp.where(
            has_desc, desc,
            jnp.where(resumed, jax.lax.shift_right_logical(popped, sbits),
                      jnp.int32(-1)),
        )
        cur = jnp.where(
            live,
            jnp.where(occ, jnp.int32(-1), jnp.where(dwell, cur, nxt)),
            cur,
        )
        ic = jnp.where(
            adv,
            jnp.where(has_desc, jnp.int32(0),
                      jnp.where(resumed, popped & ((1 << sbits) - 1), jnp.int32(0))),
            ic,
        )
        lc = jnp.where(
            dwell, s_slot + 1,
            jnp.where(adv, jnp.where(has_desc, jnp.int32(0), jnp.int32(K)),
                      lc),
        )
        return cur, lc, ic, pend, sp, stack, occ

    return jax.lax.while_loop(cond, body, state)[6]


def intersect_mesh_any(pool: MeshPool, node_offset, tri_offset, origins, dirs,
                       tmax, num_tris: int | None = None,
                       tile: int | None = None,
                       stack_slots: int | None = None):
    """Boolean occlusion query against one mesh sub-BVH: does any triangle
    intersect with t < tmax? origins/dirs: (R, 3); tmax: (R,)."""
    if num_tris is not None and num_tris <= _build.BLOCK_SIZE:
        t, tri, *_ = _intersect_mesh_brute(
            pool, tri_offset, num_tris, origins, dirs, tmax
        )
        return tri >= 0

    tile = TILE if tile is None else tile
    ss = DEFAULT_STACK_SLOTS if stack_slots is None else stack_slots
    r = origins.shape[0]
    node_offset = jnp.broadcast_to(
        jnp.asarray(node_offset, jnp.int32), (r,)
    )
    tri_offset = jnp.broadcast_to(jnp.asarray(tri_offset, jnp.int32), (r,))
    if r > tile and r % tile != 0:
        pad = tile - r % tile
        origins = jnp.concatenate(
            [origins, jnp.full((pad, 3), 1e9, jnp.float32)]
        )
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
        tmax = jnp.concatenate(
            [jnp.asarray(tmax, jnp.float32), jnp.zeros((pad,), jnp.float32)]
        )
        node_offset = jnp.concatenate(
            [node_offset, jnp.zeros((pad,), jnp.int32)]
        )
        tri_offset = jnp.concatenate(
            [tri_offset, jnp.zeros((pad,), jnp.int32)]
        )
        return intersect_mesh_any(
            pool, node_offset, tri_offset, origins, dirs, tmax, tile=tile,
            stack_slots=ss,
        )[:r]

    o = _split3(origins)
    d = _split3(dirs)
    if r <= tile:
        return _traverse_tile_any(
            pool, node_offset, tri_offset, o, d, tmax, ss
        )
    n_tiles = r // tile

    def one(args):
        return _traverse_tile_any(
            pool, args[7], args[8], args[0:3], args[3:6], args[6], ss
        )

    parts = tuple(c.reshape(n_tiles, tile) for c in o + d) + (
        jnp.asarray(tmax, jnp.float32).reshape(n_tiles, tile),
        node_offset.reshape(n_tiles, tile),
        tri_offset.reshape(n_tiles, tile),
    )
    return jax.lax.map(one, parts).reshape(r)


def traversal_cost(pool: MeshPool, node_offset, tri_offset, origins, dirs,
                   tmax, num_tris: int | None = None, tile: int | None = None,
                   stack_slots: int | None = None):
    """Per-ray step count (node visits + leaf-block steps) — the
    `eComplexity` debug view the reference reserves but never implements
    (render.h:45, render.cpp:516-519). Returns (R,) f32 counts."""
    if num_tris is not None and num_tris <= _build.BLOCK_SIZE:
        return jnp.full((origins.shape[0],), float(num_tris), jnp.float32)

    tile = TILE if tile is None else tile
    ss = DEFAULT_STACK_SLOTS if stack_slots is None else stack_slots
    out = _run_tiled(
        pool, node_offset, tri_offset, origins, dirs, tmax, tile, ss,
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
