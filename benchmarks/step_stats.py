#!/usr/bin/env python
"""Host-side step-count simulator for traversal design variants on the
bigmesh workload. Counts, per ray:

  current : skip-link DFS, 1 step per node visit, 1 step per tri test
  leafblk : same walk, but a leaf visit = 1 step (all tris tested at once)
  ordered : leafblk + near-child-first ordering (needs a stack; counts the
            visits an ideal ordered traversal would make) — upper bound on
            what ordering could buy

Reports mean and max per 4096-ray tile (tile time = max in lockstep).
"""

import numpy as np

from tinsel_tpu.scene.procedural import sphere
from tinsel_tpu.accel.build import build_bvh, triangle_bounds, compute_skip_links


def main():
    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    lo, hi = triangle_bounds(m.positions, m.indices)
    bvh = build_bvh(lo, hi)
    skip = compute_skip_links(bvh)
    print(f"nodes={bvh.num_nodes} tris={len(m.indices)} "
          f"leaves={int((bvh.count > 0).sum())}")

    # deindexed tris in perm order
    tris = m.positions[m.indices[bvh.perm]]  # (T, 3, 3)

    rng = np.random.default_rng(0)
    side = 64
    g = np.linspace(-1.2, 1.2, side, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    R = side * side
    O = np.stack([x.ravel(), y.ravel(), np.full(R, -3.0, np.float32)], -1)
    D = np.tile(np.array([1e-5, 1e-5, 1.0], np.float32), (R, 1))

    lower, upper = bvh.lower, bvh.upper
    left, count = bvh.left, bvh.count

    stats = {k: np.zeros(R) for k in ("cur", "leafblk", "ordered")}

    for ri in range(R):
        o, d = O[ri], D[ri]
        rd = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)

        # --- skip-link walk (current + leafblk share the same node path,
        # but best_t evolves differently; simulate current faithfully)
        def slab(i, best_t):
            t0 = (lower[i] - o) * rd
            t1 = (upper[i] - o) * rd
            tn = max(np.minimum(t0, t1).max(), 0.0)
            tf = np.maximum(t0, t1).min()
            return (tn <= tf) and (tn < best_t), tn

        def tri_t(j):
            a, b, c = tris[j]
            e1, e2 = b - a, c - a
            p = np.cross(d, e2)
            det = e1 @ p
            if abs(det) < 1e-9:
                return None
            inv = 1.0 / det
            tv = o - a
            u = (tv @ p) * inv
            if u < 0 or u > 1:
                return None
            q = np.cross(tv, e1)
            v = (d @ q) * inv
            if v < 0 or u + v > 1:
                return None
            t = (e2 @ q) * inv
            return t if t > 0 else None

        # current scheme
        steps = 0
        best_t = np.inf
        cur = 0
        k = 0
        while cur >= 0:
            steps += 1
            ok, tn = slab(cur, best_t)
            if ok and count[cur] > 0:
                if k < count[cur]:
                    t = tri_t(left[cur] + k)
                    if t is not None and t < best_t:
                        best_t = t
                    k += 1
                    if k < count[cur]:
                        continue
            k = 0
            if ok and count[cur] == 0:
                cur = left[cur]
            else:
                cur = skip[cur]
        stats["cur"][ri] = steps

        # leaf-block scheme: leaf visit = 1 step, tests all tris at once
        steps = 0
        best_t = np.inf
        cur = 0
        while cur >= 0:
            steps += 1
            ok, tn = slab(cur, best_t)
            if ok and count[cur] > 0:
                for j in range(left[cur], left[cur] + count[cur]):
                    t = tri_t(j)
                    if t is not None and t < best_t:
                        best_t = t
            if ok and count[cur] == 0:
                cur = left[cur]
            else:
                cur = skip[cur]
        stats["leafblk"][ri] = steps

        # ordered (stack, near-first, prune by best_t): ideal visit count
        steps = 0
        best_t = np.inf
        stack = [0]
        while stack:
            i = stack.pop()
            steps += 1
            ok, tn = slab(i, best_t)
            if not ok:
                continue
            if count[i] > 0:
                for j in range(left[i], left[i] + count[i]):
                    t = tri_t(j)
                    if t is not None and t < best_t:
                        best_t = t
            else:
                l, r = left[i], bvh.right[i]
                okl, tl = slab(l, np.inf)
                okr, tr = slab(r, np.inf)
                if tl < tr:
                    stack += [r, l]  # near first
                else:
                    stack += [l, r]
        stats["ordered"][ri] = steps

    for k, v in stats.items():
        print(f"{k:8s}: mean {v.mean():7.1f}  p50 {np.percentile(v,50):6.0f} "
              f" p95 {np.percentile(v,95):6.0f}  max {v.max():6.0f}")


if __name__ == "__main__":
    main()
