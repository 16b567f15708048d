#!/usr/bin/env python
"""Step-count simulator for k-ary skip-link traversal with leaf-block
testing, on the bigmesh workload.

Planned TPU design being modeled:
  - internal node row: k child AABBs + k words + skip  (one wide gather)
  - visit internal: test all k children vs best_t; next = FIRST hit child
    (static order); when a child's subtree finishes it skips to the next
    sibling (static), so a missed later-sibling costs 1 wasted step
    (its own children/blocks all miss by containment)
  - leaf node: its row is the triangle block; visit = 1 step testing all
    tris at once
Counts steps per ray; tile time in lockstep = max over tile.
"""

import numpy as np

from tinsel_tpu.scene.procedural import sphere
from tinsel_tpu.accel.build import build_bvh, triangle_bounds


def collapse_kary(bvh, k):
    """Binary -> k-ary: each internal node's children = frontier from
    expanding binary descendants (internal-first) until k entries."""
    children = {}
    stack = [0]
    while stack:
        i = stack.pop()
        if bvh.count[i] > 0:
            continue
        front = [int(bvh.left[i]), int(bvh.right[i])]
        while len(front) < k:
            pick = None
            best_span = -1
            for j, c in enumerate(front):
                if bvh.count[c] == 0:
                    # expand widest box (largest surface area proxy: volume
                    # of bounds diagonal) to balance the frontier
                    span = float(np.prod(bvh.upper[c] - bvh.lower[c]) + 1e-30)
                    if span > best_span:
                        best_span = span
                        pick = j
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

    for leaf_size in (16, 32):
        bvh = build_bvh(lo_b, hi_b, max_items_per_leaf=leaf_size)
        tris = m.positions[m.indices[bvh.perm]]
        lower, upper, left, count = bvh.lower, bvh.upper, bvh.left, bvh.count

        for k in (2, 4, 8):
            children = collapse_kary(bvh, k)
            n_internal = len(children)
            n_leaves = int((count > 0).sum())
            # k-ary skip links: child j escapes to sibling j+1, last to
            # parent's escape
            skip = {0: -1}
            st = [0]
            while st:
                i = st.pop()
                ch = children.get(i)
                if not ch:
                    continue
                esc = skip[i]
                for j, c in enumerate(ch):
                    skip[c] = ch[j + 1] if j + 1 < len(ch) else esc
                st.extend(ch)

            steps_all = np.zeros(R)
            for ri in range(R):
                o, d = D[ri], None
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

                steps = 0
                best_t = np.inf
                cur = 0
                while cur >= 0:
                    steps += 1
                    if count[cur] > 0:  # leaf block visit
                        if slab(cur, best_t):
                            best_t = leaf_best(cur, best_t)
                        cur = skip[cur]
                    else:
                        nxt = -2
                        for c in children[cur]:
                            if slab(c, best_t):
                                nxt = c
                                break
                        cur = nxt if nxt != -2 else skip[cur]
                steps_all[ri] = steps

            row_f = k * 6 + k + 1
            print(
                f"leaf={leaf_size:2d} k={k}: internal={n_internal} "
                f"leaves={n_leaves} row={row_f}f "
                f"mean {steps_all.mean():6.1f} "
                f"p95 {np.percentile(steps_all, 95):5.0f} "
                f"max {steps_all.max():5.0f}"
            )


if __name__ == "__main__":
    main()
