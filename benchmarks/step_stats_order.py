#!/usr/bin/env python
"""Step-count simulator: static slot order (the shipped skip-link walk)
vs per-ray nearest-child-first (an oracle for any ordering scheme, e.g.
per-octant word/skip variants) on the production WideBVH layout.

If the oracle saves little, ordering work (8 per-octant skip trees or a
short-stack walk) is not worth building; if it saves a lot, it bounds the
payoff.
"""

import numpy as np

from tinsel_tpu.accel.build import (
    BLOCK_SIZE,
    NODE_SKIP_COL,
    NODE_WORD_COL,
    WIDE_K,
    _bf16_unpack_bounds,
    build_bvh,
    build_wide_bvh,
    triangle_bounds,
)
from tinsel_tpu.scene.procedural import sphere


def main():
    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    b = build_bvh(*triangle_bounds(m.positions, m.indices))
    w = build_wide_bvh(b)
    tris = m.positions[m.indices[w.perm_padded]]  # (16B, 3, 3)

    rows = w.node_rows
    words = rows[:, NODE_WORD_COL : NODE_WORD_COL + WIDE_K].view(np.int32)
    skips = rows[:, NODE_SKIP_COL].view(np.int32)
    packed = rows[:, : 3 * WIDE_K].view(np.uint32)
    lo_c, hi_c = _bf16_unpack_bounds(packed)  # (Ni, 12) each
    lo_c = lo_c.reshape(-1, WIDE_K, 3)
    hi_c = hi_c.reshape(-1, WIDE_K, 3)

    side = 64
    g = np.linspace(-1.2, 1.2, side, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    R = side * side
    O = np.stack([x.ravel(), y.ravel(), np.full(R, -3.0, np.float32)], -1)
    D = np.tile(np.array([1e-5, 1e-5, 1.0], np.float32), (R, 1))

    def slab(node, o, rd, best_t):
        """(hit4, tn4) for the 4 children of node."""
        t0 = (lo_c[node] - o) * rd
        t1 = (hi_c[node] - o) * rd
        tn = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0)
        tf = np.maximum(t0, t1).min(axis=1)
        with np.errstate(invalid="ignore"):
            ok = (tn <= tf) & (tn < best_t)
        return np.where(np.isnan(ok.astype(float)), False, ok), tn

    def block_best(blk, o, d, best_t):
        base = BLOCK_SIZE * blk
        for j in range(base, base + BLOCK_SIZE):
            a, bb, c = tris[j]
            e1, e2 = bb - a, c - a
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

    def walk_static(o, d):
        rd = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)
        steps, best_t, cur, lc = 0, np.inf, 0, 0
        while cur >= 0:
            steps += 1
            ok, _ = slab(cur, o, rd, best_t)
            s = next(
                (c for c in range(WIDE_K) if ok[c] and words[cur, c] < 0 and c >= lc),
                None,
            )
            if s is not None:
                best_t = block_best(~words[cur, s], o, d, best_t)
                lc = s + 1
                continue
            nxt = skips[cur]
            for c in range(WIDE_K - 1, -1, -1):
                if ok[c] and words[cur, c] >= 0:
                    nxt = words[cur, c]
            cur, lc = nxt, 0
        return steps, best_t

    def walk_nearfirst(o, d):
        rd = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)
        steps, best_t = 0, np.inf
        stack = [0]
        while stack:
            cur = stack.pop()
            steps += 1
            ok, tn = slab(cur, o, rd, best_t)
            cand = [(tn[c], c) for c in range(WIDE_K) if ok[c]]
            cand.sort()  # nearest first
            for _, c in cand:
                if words[cur, c] < 0:
                    steps += 1  # dwell-equivalent block step
                    best_t = block_best(~words[cur, c], o, d, best_t)
            # push far-to-near so nearest pops first
            for _, c in reversed(cand):
                if words[cur, c] >= 0:
                    stack.append(words[cur, c])
        return steps, best_t

    centers = 0.5 * (lo_c + hi_c)  # (Ni, 4, 3); NaN for empty slots

    # ---- per-octant SKIP-LINK layouts: permute each node's child slots by
    # dot(center, sign_v) ascending, rewire per-variant skip links, walk
    # with the production skip semantics (missed later-siblings reached by
    # skip cost one step each).
    def build_variant(sign):
        key = np.where(
            np.isnan(centers[..., 0]), np.inf,
            centers[..., 0] * sign[0] + centers[..., 1] * sign[1]
            + centers[..., 2] * sign[2],
        )  # (Ni, 4)
        order_v = np.argsort(key, axis=1, kind="stable")  # slot permutation
        words_v = np.take_along_axis(words, order_v, axis=1)
        lo_v = np.take_along_axis(lo_c, order_v[..., None], axis=1)
        hi_v = np.take_along_axis(hi_c, order_v[..., None], axis=1)
        # per-variant skip wiring over internal children in new slot order
        skip_v = np.full(words.shape[0], -1, np.int32)
        stack = [(0, -1)]
        while stack:
            node, esc = stack.pop()
            skip_v[node] = esc
            internals = [
                int(words_v[node, c]) for c in range(WIDE_K)
                if words_v[node, c] >= 0 and not np.isnan(lo_v[node, c, 0])
            ]
            for j, c in enumerate(internals):
                stack.append(
                    (c, internals[j + 1] if j + 1 < len(internals) else esc)
                )
        return words_v, lo_v, hi_v, skip_v

    variants = {}

    def walk_octant_skip(o, d):
        sign = tuple(1.0 if d[a] >= 0 else -1.0 for a in range(3))
        if sign not in variants:
            variants[sign] = build_variant(np.asarray(sign))
        words_v, lo_v, hi_v, skip_v = variants[sign]
        rd = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)
        steps, best_t, cur, lc = 0, np.inf, 0, 0
        while cur >= 0:
            steps += 1
            t0 = (lo_v[cur] - o) * rd
            t1 = (hi_v[cur] - o) * rd
            tn = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0)
            tf = np.maximum(t0, t1).min(axis=1)
            with np.errstate(invalid="ignore"):
                ok = (tn <= tf) & (tn < best_t)
            ok = np.where(np.isnan(ok.astype(float)), False, ok)
            s = next(
                (c for c in range(WIDE_K)
                 if ok[c] and words_v[cur, c] < 0 and c >= lc),
                None,
            )
            if s is not None:
                best_t = block_best(~words_v[cur, s], o, d, best_t)
                lc = s + 1
                continue
            nxt = skip_v[cur]
            for c in range(WIDE_K - 1, -1, -1):
                if ok[c] and words_v[cur, c] >= 0:
                    nxt = words_v[cur, c]
            cur, lc = nxt, 0
        return steps, best_t

    out = {"static": [], "octant": [], "nearfirst": []}
    for name, walk in (("static", walk_static),
                       ("octant", walk_octant_skip),
                       ("nearfirst", walk_nearfirst)):
        ts = []
        for ri in range(R):
            s, t = walk(O[ri], D[ri])
            out[name].append(s)
            ts.append(t)
        a = np.asarray(out[name])
        print(
            f"{name:10s}: mean {a.mean():6.1f}  p95 {np.percentile(a, 95):5.0f}"
            f"  max {a.max():5.0f}",
            flush=True,
        )
    # same hits?
    print("t agreement check passed" if np.allclose(
        [walk_static(O[i], D[i])[1] for i in range(0, R, 97)],
        [walk_nearfirst(O[i], D[i])[1] for i in range(0, R, 97)],
        rtol=1e-5, atol=1e-6, equal_nan=True,
    ) else "t MISMATCH", flush=True)


if __name__ == "__main__":
    main()
