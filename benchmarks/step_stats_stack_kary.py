#!/usr/bin/env python
"""Step-count simulator for the SHIPPED stack-advance traversal at wider
arity, on the bigmesh workload (524k-tri sphere, coherent frontal rays).

Models accel/traverse.py exactly at the step level:
  - internal node row: k child AABBs + k words (one wide gather/step)
  - hit LEAF children are tested while dwelling at the parent, one extra
    step per hit leaf child beyond the first (lc cursor), zero stack
  - the cursor descends into the first hit INTERNAL child; other hit
    internal children are pushed; exhausted subtree -> pop
  - missed children cost nothing (never visited)

Lockstep tile time = max steps over the tile; projected wall time uses
the measured per-iteration cost model

    iter_cost(k, lanes) = FLOOR + lanes * NS_PER_LANE_COL * (3k + k)

with FLOOR ~ 35 us (serial gather latency, microbench_r2c) and
NS_PER_LANE_COL calibrated so k=4 reproduces the measured 12.5 us
marginal at 4096 lanes (includes the overlapped block gather + carry).

Purpose: decide whether an 8/16-ary rebuild is worth doing before the
chip is available to measure it directly.

RESULT (this machine, 64x64 frontal rays, 524k-tri sphere):
    k= 4 cols=16: steps mean 8.3 p95 17 max 59  -> est 2.30 ms/tile
    k= 8 cols=32: steps mean 6.1 p95 13 max 47  -> est 2.01 ms/tile
    k=16 cols=64: steps mean 5.5 p95 12 max 38  -> est 2.00 ms/tile
The dwell (leaf-block) steps are ~irreducible, so wider nodes shave only
the advance steps while growing every step's column cost — modeled net
<=1.15x. NOT worth the rebuild; the remaining lever is the two-phase
schedule itself (phase-2 restart economics), not arity.
"""

import numpy as np

from tinsel_tpu.scene.procedural import sphere
from tinsel_tpu.accel.build import build_bvh, triangle_bounds

FLOOR_US = 35.0
# calibration: k=4 consumed node cols = 16, measured marginal 12.5 us at
# 4096 lanes -> 12.5e3 ns / (4096*16) = 0.19 ns per lane-column, ALL
# overheads (block gather, carry) folded in proportionally
NS_PER_LANE_COL = 12.5e3 / (4096 * 16)


def collapse_kary(bvh, k):
    """Binary -> k-ary frontier collapse (same policy as build_wide_bvh:
    expand the internal child with the largest box span until k)."""
    children = {}
    stack = [0]
    while stack:
        i = stack.pop()
        if bvh.count[i] > 0:
            continue
        front = [int(bvh.left[i]), int(bvh.right[i])]
        while len(front) < k:
            pick, best_span = None, -1.0
            for j, c in enumerate(front):
                if bvh.count[c] == 0:
                    span = float(
                        np.prod(bvh.upper[c] - bvh.lower[c]) + 1e-30
                    )
                    if span > best_span:
                        best_span, pick = span, j
            if pick is None:
                break
            c = front.pop(pick)
            front[pick:pick] = [int(bvh.left[c]), int(bvh.right[c])]
        children[i] = front
        stack.extend(front)
    return children


def main():
    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    lo_b, hi_b = triangle_bounds(m.positions, m.indices)

    side = 64
    g = np.linspace(-1.2, 1.2, side, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    R = side * side
    O = np.stack([x.ravel(), y.ravel(), np.full(R, -3.0, np.float32)], -1)
    D = np.tile(np.array([1e-5, 1e-5, 1.0], np.float32), (R, 1))

    bvh = build_bvh(lo_b, hi_b, max_items_per_leaf=16)
    tris = m.positions[m.indices[bvh.perm]]
    lower, upper, left, count = bvh.lower, bvh.upper, bvh.left, bvh.count

    for k in (4, 8, 16):
        children = collapse_kary(bvh, k)

        steps_all = np.zeros(R)
        depth_all = np.zeros(R)
        for ri in range(R):
            o, d = O[ri], D[ri]
            rd = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)

            def slab(i, best_t):
                t0 = (lower[i] - o) * rd
                t1 = (upper[i] - o) * rd
                tn = max(np.minimum(t0, t1).max(), 0.0)
                tf = np.maximum(t0, t1).min()
                return (tn <= tf) and (tn < best_t)

            def leaf_best(i, best_t):
                for j in range(left[i], left[i] + count[i]):
                    a, b, c = tris[j]
                    e1, e2 = b - a, c - a
                    p = np.cross(d, e2)
                    det = e1 @ p
                    if abs(det) < 1e-9:
                        continue
                    inv = 1.0 / det
                    tv = o - a
                    u = (tv @ p) * inv
                    if u < 0 or u > 1:
                        continue
                    q = np.cross(tv, e1)
                    v = (d @ q) * inv
                    if v < 0 or u + v > 1:
                        continue
                    t = (e2 @ q) * inv
                    if 0 < t < best_t:
                        best_t = t
                return best_t

            # stack-advance walk: one step per DWELL (a hit leaf child
            # tested) or per ADVANCE (descend/pop); matches _step's
            # one-gather-pair-per-iteration structure (the deferred block
            # test overlaps, so a dwell and an advance cost the same)
            steps = 0
            best_t = np.inf
            stack = []
            cur = 0
            maxdepth = 0
            while cur >= 0:
                ch = children.get(cur, [])
                hit_leaf = [c for c in ch if count[c] > 0 and slab(c, best_t)]
                hit_int = [c for c in ch if count[c] == 0 and slab(c, best_t)]
                # parent-dwell: each hit leaf child is one step
                for c in hit_leaf:
                    steps += 1
                    best_t = leaf_best(c, best_t)
                # the parent visit itself (the node-row gather step)
                steps += 1
                if hit_int:
                    cur = hit_int[0]
                    stack.extend(reversed(hit_int[1:]))
                    maxdepth = max(maxdepth, len(stack))
                elif stack:
                    cur = stack.pop()
                else:
                    cur = -1
            steps_all[ri] = steps
            depth_all[ri] = maxdepth

        cols = 3 * k + k
        tiles = steps_all.reshape(-1, 64 * 4)  # 256-ray "tiles" scaled up
        # report at 4096-lane economics: scale the per-tile max from the
        # 4096-ray grid directly
        tile_max = steps_all.max()
        mean = steps_all.mean()
        p95 = np.percentile(steps_all, 95)
        iter_us = FLOOR_US + 4096 * NS_PER_LANE_COL * cols * 1e-3
        # two-phase estimate at one 4096-tile: cap at p95, then finish the
        # tail (~5% lanes) in a second pass of (max - p95) steps
        t_est = (p95 + (tile_max - p95)) * iter_us  # upper bound, 1 tile
        t_capped = p95 * iter_us + (tile_max - p95) * (
            FLOOR_US + 4096 * 0.05 * NS_PER_LANE_COL * cols * 1e-3
        )
        print(
            f"k={k:2d} cols={cols:3d}: steps mean {mean:5.1f} p95 {p95:5.1f} "
            f"max {tile_max:5.1f} maxstack {depth_all.max():4.0f} "
            f"iter {iter_us:5.1f}us est/tile {t_est*1e-3:6.2f}ms "
            f"capped {t_capped*1e-3:6.2f}ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
