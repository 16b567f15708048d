"""Shared-walk PACKET traversal: G coherent rays amortize one BVH walk.

The per-ray walk (accel.traverse) is gather-issue bound: every ray-lane
pays ~8.5 ns/step for its dependent node-row gather while the VPU sits
~5% utilized (measured, benchmarks/r7_stepcost.py). A packet of G rays
shares ONE walk: per step one node gather and one deferred leaf-block
gather indexed per PACKET (P = R/G lanes instead of R), and the child /
triangle tests broadcast to all G member rays as (P, G, K) elementwise
VPU work — the resource that was idle. The packet visits the UNION of
the nodes its rays need (per-ray best_t still prunes each ray's tests),
so the model is

    time ~ union_steps x (gather_ns x P  +  ~free VPU)
    win  ~ G / union_inflation            in gather lane-steps

The union inflation was simulated in benchmarks/r7_packet_sim.py
(frontal G=8: 1.22x -> 6.6x fewer gather lane-steps; diffuse rays
pre-sorted by direction octant + origin Morton: 3.1x -> 2.6x win) and
relitigated ON DEVICE this round (VERDICT r4 #1) — device numbers in
benchmarks/r10_packets.py and the design-log below.

Correctness: identical best_t to the per-ray walk (same tests, same
pruning bound, visits are a superset ordering of each ray's own);
winning-triangle ties can resolve differently (both minima are exact).
Tests: tests/test_geometry.py::test_packet_matches_per_ray.

Walk rule (mirrors _step's compressed-stack 16-ary DFS): a slot is HIT
if ANY member ray's slab test passes under its own best_t; dwell the
first hit leaf slot >= lc (deferred one step, overlapped block gather),
else descend the first hit internal slot >= ic pushing at most one
(cur << 4 | next_slot) entry; pop re-derives hits under the tightened
per-ray best_t (a free prune, per ray).

Reference anchor: a CUDA thread amortizes node work across its ray's
whole traversal for free (intersection.h:678-749); the TPU analog is
sharing the *gather* across a warp-like packet and paying with lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import build as _build
from .traverse import (
    INF,
    _child_tests_packet_rows,
    _init_state,
    _safe_rcp3,
    _stack_pop,
    _stack_push,
    _tri_hit,
)

PACKET_G = 8  # default packet width; device sweep (r10_packets.py):
# g=8 edges g=4 and beats g=16 (union inflation grows faster than the
# lane saving beyond 8 on this tree)
PACKET_TILE = 1024  # packets per early-exit tile (G=8 -> 8192 rays);
# swept 256-2048 on device, 1024 best at cap 28 (med 16.7 Mrays/s)
PACKET_PHASE1_CAP = 28  # union steps run ~3.4x per-ray steps (r7 sim
# re-run); device sweep (benchmarks/r10_packets.py) put cap 24-28 ahead
# of 10/16/20/32/40/48/64
STACK_MATRIX = False  # carry the DFS stack as ONE (P, S) i32 matrix
# with one-hot push/pop instead of a tuple of S (P,) slot arrays.
# Measured-and-rejected HERE TOO (r5, interleaved same-session A/B at
# g=8 tile 512 cap 24: tuple 7.07 vs matrix 6.51 Mrays/s end-to-end),
# even though the isolated step-chain slope showed the matrix step
# cheaper (13.5 vs 20 us) — the isolated chain overweights the carry
# copies that the real tiled loop overlaps. Kept as an A/B knob.
PHASE2_PERRAY = False  # finish the post-compaction tail with the
# PER-RAY walk instead of packet unions (a phase-2 restart only consumes
# best_t, so tail rays CAN re-walk alone). Measured-and-rejected (r5,
# interleaved same-session A/B, g=8 tile 512 cap 24: perray-tail 6.38 vs
# packet-tail 8.02 Mrays/s; per-ray baseline 6.21): tail rays pay fewer
# steps per ray but each step costs R-lane gathers — the packet tail's
# union steps at P lanes are cheaper per tile despite ~3x inflation.
# Kept as an A/B knob.
PHASE_RESTART = False  # phase-2 entry: resume the carried walk state
# (False) vs re-walk from the root with tightened best_t (True). The
# phase breakdown (r10_packets.py RESULT) put tail+compaction at 5.4 ms
# of the 8.6 ms total under restart — tail packets re-paid their ~24
# capped union steps before making progress; resuming carries ~11 extra
# (P,) columns through the ONE stacked permute (~free at P lanes) and
# skips the re-walk. (The per-ray walk measured the OPPOSITE —
# traverse.PHASE_RESTART=True: per-ray re-walks are shallow and the
# tightened best_t prunes them; union re-walks are deep.)


def _mstack_push(stk, sp, value, mask):
    """Push `value` where `mask` into the (P, S) stack matrix at row
    depth sp. One select against an iota compare — a single fused op."""
    S = stk.shape[1]
    onehot = (
        jnp.arange(S, dtype=jnp.int32)[None, :] == sp[:, None]
    ) & mask[:, None]
    return jnp.where(onehot, value[:, None], stk), sp + mask.astype(
        jnp.int32
    )


def _mstack_pop(stk, sp, mask):
    """Pop where `mask`; empty-stack lanes get -1."""
    S = stk.shape[1]
    onehot = jnp.arange(S, dtype=jnp.int32)[None, :] == (sp - 1)[:, None]
    val_raw = jnp.sum(jnp.where(onehot, stk, 0), axis=1)
    ok = mask & (sp > 0)
    return jnp.where(ok, val_raw, -1), sp - ok.astype(jnp.int32)


def _pblock_test(brow, has_pend, o, d, best_t):
    """Test one gathered (P, 192) leaf-block row against all G member
    rays: (P, G, B) Moller-Trumbore on broadcast component groups.
    o/d: 3-tuples of (P, G). Returns (found, t_min, slot) all (P, G)."""
    B = _build.BLOCK_SIZE
    va = tuple(brow[:, i * B:(i + 1) * B][:, None, :] for i in range(3))
    vb = tuple(brow[:, (3 + i) * B:(4 + i) * B][:, None, :] for i in range(3))
    vc = tuple(brow[:, (6 + i) * B:(7 + i) * B][:, None, :] for i in range(3))
    ob = tuple(c[:, :, None] for c in o)  # (P, G, 1)
    db = tuple(c[:, :, None] for c in d)
    hit, t = _tri_hit(va, vb, vc, ob, db)  # (P, G, B)
    tt = jnp.where(
        hit & has_pend[:, None, None] & (t < best_t[:, :, None]), t, INF
    )
    t_min = tt.min(axis=2)  # (P, G)
    found = t_min < best_t
    slot = jnp.argmin(tt, axis=2).astype(jnp.int32)  # (P, G)
    return found, t_min, slot


def _pstep(pool, node_offset, block_base, o, d, rd, st):
    """One lockstep PACKET step. Carries: cur/lc/ic/pend/sp/stack (P,)
    per packet; best_t/best_tri (P, G) per ray. o/d/rd: 3-tuples (P, G).
    Mirrors traverse._step (deferred overlapped block gather, compressed
    stack) with the hit masks reduced any-over-G for the advance."""
    from .build import WIDE_K as K

    cur, lc, ic, pend, sp, stack = (
        st["cur"], st["lc"], st["ic"], st["pend"], st["sp"], st["stack"]
    )
    best_t, best_tri = st["best_t"], st["best_tri"]

    live = cur >= 0
    row = pool.node_rows[node_offset + jnp.maximum(cur, 0)]  # (P, 4K+pad)
    has_pend = pend >= 0
    brow = pool.block_rows[
        block_base + jnp.where(has_pend, pend, 0)
    ]  # (P, 192) — independent of the node gather (overlaps)

    found, t_min, slot = _pblock_test(brow, has_pend, o, d, best_t)
    best_t = jnp.where(found, t_min, best_t)
    best_tri = jnp.where(found, pend[:, None] * _build.BLOCK_SIZE + slot,
                         best_tri)

    ok, words = _child_tests_packet_rows(row, o, rd, best_t, live)
    okany = ok.any(axis=1)  # (P, K): hit by ANY member ray

    # PACKED-KEY child scans: (slot << 26 | payload) lets ONE masked min
    # deliver both the winning slot and its child word — 3 reductions
    # instead of the per-ray walk's 5 (two select-sum extractions fuse
    # away). Packing bounds: slot < K <= 32, payload (node index within
    # the sub-BVH / leaf block id) < 2^26; accel.build.flatten refuses
    # larger pools. BIG = 2^30 exceeds every real key (max 31<<26 | m).
    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    BIG = jnp.int32(1 << 30)
    leafm = okany & (words < 0) & (slots >= lc[:, None])
    leaf_key = jnp.min(
        jnp.where(
            leafm,
            jax.lax.shift_left(slots, 26) | (-words - 1),
            BIG,
        ),
        axis=1,
    )
    dwell = live & (leaf_key < BIG)
    s = jax.lax.shift_right_logical(leaf_key, 26)
    pend = jnp.where(dwell, leaf_key & ((1 << 26) - 1), jnp.int32(-1))

    intm = okany & (words >= 0) & (slots >= ic[:, None])
    int_keys = jnp.where(
        intm, jax.lax.shift_left(slots, 26) | words, BIG
    )
    int_key = jnp.min(int_keys, axis=1)
    has_desc = int_key < BIG
    first_c = jax.lax.shift_right_logical(int_key, 26)
    desc = int_key & ((1 << 26) - 1)
    second_c = jax.lax.shift_right_logical(
        jnp.min(
            jnp.where(slots > first_c[:, None], int_keys, BIG), axis=1
        ),
        26,
    )
    second_c = jnp.minimum(second_c, K)  # BIG >> 26 = 16 at K=16; clamp
    # for K < 16 so "no second child" stays the K sentinel
    adv = live & ~dwell
    sbits = (K - 1).bit_length()
    push_val = jax.lax.shift_left(cur, sbits) | second_c
    push_mask = adv & (second_c < K)
    pop_mask = adv & ~has_desc
    if STACK_MATRIX:
        stack, sp = _mstack_push(stack, sp, push_val, push_mask)
        popped, sp = _mstack_pop(stack, sp, pop_mask)
    else:
        stack, sp = _stack_push(stack, sp, push_val, push_mask)
        popped, sp = _stack_pop(stack, sp, pop_mask)
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
                  jnp.where(resumed, popped & ((1 << sbits) - 1),
                            jnp.int32(0))),
        ic,
    )
    lc = jnp.where(
        dwell, s + 1,
        jnp.where(adv, jnp.where(has_desc, jnp.int32(0), jnp.int32(K)), lc),
    )
    return dict(
        cur=cur, lc=lc, ic=ic, pend=pend, sp=sp, stack=stack,
        best_t=best_t, best_tri=best_tri,
    )


def _pinit_state(p, g, tmax, stack_slots):
    st = _init_state(p, jnp.zeros((p,), jnp.float32), stack_slots)
    if STACK_MATRIX:
        st["stack"] = jnp.zeros((p, stack_slots), jnp.int32)
    st["best_t"] = jnp.asarray(tmax, jnp.float32).reshape(p, g)
    st["best_tri"] = jnp.full((p, g), -1, jnp.int32)
    return st


def _ptraverse_tile(pool, node_offset, tri_offset, o, d, state, cap=None):
    rd = _safe_rcp3(d)
    block_base = tri_offset // _build.BLOCK_SIZE

    def unfinished(s):
        return (s["cur"] >= 0) | (s["pend"] >= 0)

    def body(s):
        return _pstep(pool, node_offset, block_base, o, d, rd, s)

    if cap is not None:
        # capped phase as a fixed-trip fori (see traverse.PHASE1_FORI)
        return jax.lax.fori_loop(0, cap, lambda i, s: body(s), dict(state))

    return jax.lax.while_loop(
        lambda s: jnp.any(unfinished(s)), body, dict(state)
    )


def _pmap_tiles(pool, node_offset, tri_offset, o, d, state, tile, cap):
    p = o[0].shape[0]
    if p <= tile:
        return _ptraverse_tile(pool, node_offset, tri_offset, o, d, state,
                               cap)
    n_tiles = p // tile

    def one(args):
        oo, dd, no, to, st = args
        return _ptraverse_tile(pool, no, to, oo, dd, st, cap)

    resh = lambda x: x.reshape((n_tiles, tile) + x.shape[1:])
    parts = (
        tuple(resh(c) for c in o),
        tuple(resh(c) for c in d),
        resh(node_offset),
        resh(tri_offset),
        jax.tree_util.tree_map(resh, state),
    )
    out = jax.lax.map(one, parts)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((p,) + x.shape[2:]), out
    )


def intersect_mesh_packets(pool, node_offset, tri_offset, origins, dirs,
                           tmax, g: int, stack_slots: int,
                           tile: int | None = None,
                           cap: int | None = None):
    """Closest-hit via shared-walk packets of g CONSECUTIVE rays.

    origins/dirs (R, 3) with R % g == 0; rays should be pre-sorted so
    consecutive rays are coherent (frontal tiles already are; bounce rays
    want the octant+Morton sort, render.trace coherence sort). Offsets
    are scalars (one sub-BVH per call). Returns (best_t, best_tri) in the
    ORIGINAL ray order; best_tri indexes padded pool order.

    Two-phase schedule like traverse._run_tiled: capped phase 1, stable
    compaction of unfinished PACKETS to the front (one stacked-permute),
    uncapped phase 2 restarting from the root with tightened best_t."""
    r = origins.shape[0]
    assert r % g == 0, "ray count must be a multiple of the packet size"
    p = r // g
    tile = PACKET_TILE if tile is None else tile
    cap = PACKET_PHASE1_CAP if cap is None else cap

    o = tuple(origins[:, i].reshape(p, g) for i in range(3))
    d = tuple(dirs[:, i].reshape(p, g) for i in range(3))
    # offsets: scalars, or per-ray (R,) vectors whose packets are
    # offset-uniform (instance blocks g-aligned — render/trace.py keeps
    # each instance's lane block a multiple of g); the packet takes its
    # head ray's offsets
    no = jnp.asarray(node_offset, jnp.int32)
    to = jnp.asarray(tri_offset, jnp.int32)
    if no.ndim:
        no = no.reshape(p, g)[:, 0]
    else:
        no = jnp.broadcast_to(no, (p,))
    if to.ndim:
        to = to.reshape(p, g)[:, 0]
    else:
        to = jnp.broadcast_to(to, (p,))
    state = _pinit_state(p, g, tmax, stack_slots)

    if p <= tile:
        out = _ptraverse_tile(pool, no, to, o, d, state, None)
        return out["best_t"].reshape(r), out["best_tri"].reshape(r)

    pad = (-p) % tile
    if pad:
        # degenerate pad packets: far origin, tmax 0 -> root children all
        # fail the t < best_t test, walk ends in one step
        o = tuple(jnp.concatenate([c, jnp.full((pad, g), 1e9, jnp.float32)])
                  for c in o)
        d = tuple(jnp.concatenate([c, jnp.ones((pad, g), jnp.float32)])
                  for c in d)
        no = jnp.concatenate([no, jnp.zeros((pad,), jnp.int32)])
        to = jnp.concatenate([to, jnp.zeros((pad,), jnp.int32)])
        state = jax.tree_util.tree_map(
            lambda a: jnp.concatenate([
                a, jnp.zeros((pad,) + a.shape[1:], a.dtype)
            ]),
            state,
        )
        p += pad

    st1 = _pmap_tiles(pool, no, to, o, d, state, tile, cap)
    finished = (st1["cur"] < 0) & (st1["pend"] < 0)
    perm = jnp.argsort(finished.astype(jnp.int8), stable=True)
    total_perm = jnp.arange(p, dtype=jnp.int32)

    # BLOCK-MATRIX compaction: the (P, g) ray fields and the scalar /
    # walk carries concatenate into ONE (P, C) matrix, permute is ONE
    # row gather, and the fields slice back out as contiguous column
    # groups. (The first cut reused traverse._permute_many on ~80
    # individual (P,) columns; the ~170 split/stack ops around it cost
    # ~0.2 us fixed each — more than the gather itself at P lanes.)
    bc = jax.lax.bitcast_convert_type
    i2f = lambda a: bc(a, jnp.float32)  # noqa: E731
    f2i = lambda a: bc(a, jnp.int32)  # noqa: E731
    parts = [
        o[0], o[1], o[2], d[0], d[1], d[2],
        st1["best_t"], i2f(st1["best_tri"]),
        i2f(jnp.stack(
            [no, to, total_perm, finished.astype(jnp.int32)], axis=1
        )),
    ]
    n_stack = len(st1["stack"])
    if not PHASE_RESTART:
        # resume mode: the whole walk state rides the same gather
        parts.append(i2f(jnp.stack(
            [st1["cur"], st1["lc"], st1["ic"], st1["pend"], st1["sp"]]
            + list(st1["stack"]), axis=1,
        )))
    m = jnp.concatenate(parts, axis=1)[perm]
    o = tuple(m[:, i * g:(i + 1) * g] for i in range(3))
    d = tuple(m[:, (3 + i) * g:(4 + i) * g] for i in range(3))
    bt_p = m[:, 6 * g:7 * g]
    tri_p = f2i(m[:, 7 * g:8 * g])
    sc = f2i(m[:, 8 * g:8 * g + 4])
    no, to, total_perm = sc[:, 0], sc[:, 1], sc[:, 2]
    fin_p = sc[:, 3]

    if not PHASE_RESTART:
        w = f2i(m[:, 8 * g + 4:8 * g + 9 + n_stack])
        st = dict(
            cur=w[:, 0], lc=w[:, 1], ic=w[:, 2], pend=w[:, 3], sp=w[:, 4],
            stack=tuple(w[:, 5 + i] for i in range(n_stack)),
            best_t=bt_p, best_tri=tri_p,
        )
        out = _pmap_tiles(pool, no, to, o, d, st, tile, None)
        bt_o, tri_o = out["best_t"], out["best_tri"]
    elif PHASE2_PERRAY:
        # tail rays re-walk from the root INDIVIDUALLY under their
        # tightened best_t: the restart needs no packet walk state, and
        # per-ray steps (mean ~6.6) beat tail-packet union steps —
        # measured-and-rejected, see PHASE2_PERRAY
        from .traverse import TILE as RAY_TILE
        from .traverse import _init_state as _rinit
        from .traverse import _map_tiles as _rmap

        rr = p * g
        o_r = tuple(c.reshape(rr) for c in o)
        d_r = tuple(c.reshape(rr) for c in d)
        no_r = jnp.repeat(no, g)
        to_r = jnp.repeat(to, g)
        rst = _rinit(rr, bt_p.reshape(rr), stack_slots)
        fin_r = jnp.repeat(fin_p > 0, g)
        rst["cur"] = jnp.where(fin_r, jnp.int32(-1), jnp.int32(0))
        rst["best_tri"] = tri_p.reshape(rr)
        out = _rmap(pool, no_r, to_r, o_r, d_r, rst,
                    min(RAY_TILE, rr), None, False)
        bt_o = out["best_t"].reshape(p, g)
        tri_o = out["best_tri"].reshape(p, g)
    else:
        st = _pinit_state(p, g, bt_p, stack_slots)
        st["cur"] = jnp.where(fin_p > 0, jnp.int32(-1), jnp.int32(0))
        st["best_tri"] = tri_p
        out = _pmap_tiles(pool, no, to, o, d, st, tile, None)
        bt_o, tri_o = out["best_t"], out["best_tri"]

    # invert the compaction with ONE row scatter of the (P, 2g) results
    mo = jnp.concatenate([bt_o, i2f(tri_o)], axis=1)
    inv = jnp.zeros_like(mo).at[total_perm].set(mo)
    best_t = inv[:, :g][: r // g].reshape(r)
    best_tri = f2i(inv[:, g:])[: r // g].reshape(r)
    return best_t, best_tri
