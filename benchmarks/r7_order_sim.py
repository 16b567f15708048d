#!/usr/bin/env python
"""Step-count simulator for DISTANCE-ORDERED wide descent (VERDICT r3 #1).

Compares child-visit ordering policies for the shipped compressed-stack
k-ary walk (accel/traverse.py) on the bigmesh workload, counting exactly
what the device loop counts: one step per node visit (including pop
re-visits at the parent) plus one step per hit-leaf dwell.

Policies:
  static   — shipped r3 behavior: children visited in build slot order
             (leaves dwelled first at each visit via the lc cursor, then
             descend into the first hit internal child at slot >= ic).
  tn       — full per-ray distance order: at each visit pick the
             UNVISITED hit child (leaf or internal) with smallest slab
             entry tn; leaf -> dwell, internal -> descend (visited-mask
             resume). This is the reference's tLeft<tRight near-first
             descent (intersection.h:717-722) generalized to k-ary.
  tn_leaf  — leaves first (in tn order), then internals in tn order:
             tightens best_t with real triangle hits before any descent.

Lockstep economics: a 4096-lane tile runs to its WORST ray, so the
per-tile max matters as much as the mean. Rays here are the bench's
coherent frontal grid; we also report a diffuse-bounce proxy (random
origins on the sphere surface, random hemisphere dirs) where ordering
matters more.

RESULT (524k-tri sphere, 64x64 frontal grid + 4096 diffuse proxies,
k=16; run 2026-08-20):
    frontal  static : mean 10.57 p95 21 max 43   tilemax(4096) 43
    frontal  tn     : mean  7.71 p95 16 max 29   tilemax(4096) 29
    frontal  tn_leaf: mean  7.79 p95 16 max 30
    diffuse  static : mean 10.42 p95 23 max 47
    diffuse  tn     : mean  7.92 p95 18 max 33
    diffuse  tn_leaf: mean  8.01 p95 18 max 34
i.e. full tn ordering cuts mean steps ~1.35x and the lockstep tail
(max) ~1.45x on both workloads; interleaving leaves into the tn order
(vs leaves-first) is equal-or-better, so the device implementation uses
ONE visited mask + ONE argmin over (tn, slot) for all children.
"""

import numpy as np

from tinsel_tpu.scene.procedural import sphere
from tinsel_tpu.accel.build import build_bvh, triangle_bounds

K = 16


def collapse_kary(bvh, k):
    """Binary -> k-ary frontier collapse (same policy as build_wide_bvh)."""
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
                    span = float(np.prod(bvh.upper[c] - bvh.lower[c]) + 1e-30)
                    if span > best_span:
                        best_span, pick = span, j
            if pick is None:
                break
            c = front.pop(pick)
            front[pick:pick] = [int(bvh.left[c]), int(bvh.right[c])]
        children[i] = front
        stack.extend(front)
    return children


def walk(policy, children, bvh, tris, o, d):
    """One ray's walk; returns (steps, best_t, max_stack_depth)."""
    lower, upper, left, count = bvh.lower, bvh.upper, bvh.left, bvh.count
    rd = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)

    def slab(i, best_t):
        t0 = (lower[i] - o) * rd
        t1 = (upper[i] - o) * rd
        tn = max(np.minimum(t0, t1).max(), 0.0)
        tf = np.maximum(t0, t1).min()
        return (tn if (tn <= tf and tn < best_t) else None)

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
    maxsp = 0

    if policy == "static":
        # shipped r3: (node, lc, ic) cursors; one compressed entry per push
        stack = []  # (node, resume_ic)
        cur, lc, ic = 0, 0, K
        cur_ic = 0
        cur, cur_ic = 0, 0
        while cur >= 0:
            steps += 1  # the node-row gather step
            ch = children.get(cur, [])
            # dwell the first hit leaf child at slot >= lc
            dwelled = False
            for s in range(lc, len(ch)):
                c = ch[s]
                if count[c] > 0 and slab(c, best_t) is not None:
                    steps_extra = 0
                    best_t = leaf_best(c, best_t)
                    lc = s + 1
                    dwelled = True
                    break
            if dwelled:
                continue  # stay at cur (this step WAS the dwell)
            # descend into first hit internal child at slot >= ic
            first, second = None, None
            for s in range(cur_ic, len(ch)):
                c = ch[s]
                if count[c] == 0 and slab(c, best_t) is not None:
                    if first is None:
                        first = (s, c)
                    elif second is None:
                        second = s
                        break
            if first is not None:
                if second is not None:
                    stack.append((cur, second))
                    maxsp = max(maxsp, len(stack))
                cur, lc, cur_ic = first[1], 0, 0
            elif stack:
                cur, cur_ic = stack.pop()
                lc = K  # leaves already dwelled on the first visit
            else:
                cur = -1
    else:
        # visited-mask designs: one mask per (node on path), stack holds
        # (node, mask); each visit = 1 step, each dwell = 1 step
        stack = []
        cur, mask = 0, 0
        while cur >= 0:
            steps += 1
            ch = children.get(cur, [])
            cands = []
            for s, c in enumerate(ch):
                if mask & (1 << s):
                    continue
                tn = slab(c, best_t)
                if tn is None:
                    continue
                is_leaf = count[c] > 0
                if policy == "tn":
                    key = (tn, s)
                elif policy == "tn_leaf":
                    key = (0 if is_leaf else 1, tn, s)
                cands.append((key, s, c, is_leaf))
            if not cands:
                if stack:
                    cur, mask = stack.pop()
                else:
                    cur = -1
                continue
            cands.sort()
            _, s, c, is_leaf = cands[0]
            mask |= 1 << s
            if is_leaf:
                best_t = leaf_best(c, best_t)
                # dwell: stay at cur; this step was the dwell
            else:
                if len(cands) > 1:
                    stack.append((cur, mask))
                    maxsp = max(maxsp, len(stack))
                cur, mask = c, 0
    return steps, best_t, maxsp


def main():
    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    lo_b, hi_b = triangle_bounds(m.positions, m.indices)
    bvh = build_bvh(lo_b, hi_b, max_items_per_leaf=16)
    tris = m.positions[m.indices[bvh.perm]]
    children = collapse_kary(bvh, K)

    side = 64
    g = np.linspace(-1.2, 1.2, side, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    R = side * side
    O_f = np.stack([x.ravel(), y.ravel(), np.full(R, -3.0, np.float32)], -1)
    D_f = np.tile(np.array([1e-5, 1e-5, 1.0], np.float32), (R, 1))

    # diffuse-bounce proxy: origins just above the sphere surface, random
    # outward-hemisphere directions (secondary rays, incoherent)
    rng = np.random.default_rng(0)
    n_d = 4096
    zs = rng.uniform(-1, 1, n_d)
    ph = rng.uniform(0, 2 * np.pi, n_d)
    r_ = np.sqrt(1 - zs * zs)
    N = np.stack([r_ * np.cos(ph), r_ * np.sin(ph), zs], -1)
    O_d = (N * 1.02).astype(np.float32)
    V = rng.normal(size=(n_d, 3))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    flip = (V * N).sum(1) < 0
    V[flip] -= 2 * (V[flip] * N[flip]).sum(1, keepdims=True) * N[flip]
    D_d = V.astype(np.float32)

    for name, O, D in (("frontal", O_f, D_f), ("diffuse", O_d, D_d)):
        ref_t = None
        for policy in ("static", "tn", "tn_leaf"):
            steps = np.zeros(len(O))
            ts = np.zeros(len(O))
            sps = np.zeros(len(O))
            for ri in range(len(O)):
                steps[ri], ts[ri], sps[ri] = walk(
                    policy, children, bvh, tris, O[ri], D[ri]
                )
            if ref_t is None:
                ref_t = ts
            else:
                assert np.allclose(
                    np.where(np.isfinite(ts), ts, -1),
                    np.where(np.isfinite(ref_t), ref_t, -1),
                    rtol=1e-6,
                ), f"{name}/{policy}: closest hits differ from static order"
            print(
                f"{name:8s} {policy:8s}: mean {steps.mean():6.2f} "
                f"p95 {np.percentile(steps, 95):5.1f} "
                f"max {steps.max():5.0f} maxstack {sps.max():3.0f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
