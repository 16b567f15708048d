#!/usr/bin/env python
"""Union-step simulator for PACKET traversal (round-4 design study).

The r3 traversal is gather-issue-bound: every ray-lane issues its own
dependent node-row gather (~8.5 ns/lane/step) while the VPU sits ~5%
utilized. Packet traversal amortizes the gather: a packet of G coherent
rays shares ONE walk — per step one node-row gather per PACKET, tested
densely against all G rays on the VPU. A packet visits the UNION of the
nodes its rays need, so the cost model is

    time ~ packet_steps x (gather_ns x n_packets + VPU(G x K tests))

vs the shipped per-ray walk's rays x steps x gather_ns. The win is the
ratio  G / union_inflation, where union_inflation = packet_steps /
single_ray_mean_steps.

This simulator measures union_inflation on the bigmesh workloads
(coherent frontal grid; incoherent diffuse-bounce proxy, pre-sorted by
direction octant + origin Morton like the planned device path) for
packet sizes G in {8, 16, 32, 64, 128}.

Packet walk rule (mirrors the planned device loop): per step the packet
dwells the nearest unvisited leaf child hit by ANY member ray (per-ray
best_t pruning), else descends into the first unvisited internal child
hit by any member, else pops. Per-ray best_t tightens exactly as in the
per-ray walk, so results are identical.

RESULT (524k-tri sphere; RE-RUN LIVE 2026-08-20, r5 — the RESULT block
previously recorded here claimed frontal G=8 inflation 1.22x / win 6.6x;
that was a transcription error the r4 VERDICT propagated. The shipped
rejection note in accel/traverse.py ("3.4x inflation vs 2.4x win at
G=8") matches this live run exactly):
  frontal  G=  1: per-ray mean  6.62 p95  14.0 max   58
  frontal  G=  8: union mean  22.4 (infl  3.39x) -> gather win 2.4x
  frontal  G= 16: union mean  39.6 (infl  5.98x) -> gather win 2.7x
  frontal  G= 32: union mean  73.2 (infl 11.06x) -> gather win 2.9x
  frontal  G= 64: union mean 138.1 (infl 20.87x) -> gather win 3.1x
  frontal  G=128: union mean 268.1 (infl 40.52x) -> gather win 3.2x
  diffuse  G=  1: per-ray mean  7.31 p95  13.0 max   23
  diffuse  G=  8: union mean  26.8 (infl  3.66x) -> gather win 2.2x
  diffuse  G= 16: union mean  45.7 (infl  6.25x) -> gather win 2.6x
  diffuse  G= 32: union mean  80.8 (infl 11.05x) -> gather win 2.9x
  (gather win = G / inflation = reduction in gather lane-steps per ray.)

The device A/B (benchmarks/r10_packets.py, r5) shows the mean-model is
PESSIMISTIC about packets despite the 3.4x inflation: packets also
homogenize the lockstep tail (per-ray per-tile max/mean is 8.6x at 4096
lanes; packet union max/mean only ~2.2x), and the packet step itself is
2.4-4.2x cheaper than R per-ray lanes. Net device win at g=8, tile 512,
cap 24: 1.46x on the bigmesh frontal workload.
"""

import numpy as np

from tinsel_tpu.scene.procedural import sphere
from tinsel_tpu.accel.build import build_bvh, triangle_bounds
from benchmarks.r7_order_sim import collapse_kary

K = 16


def packet_walk(children, bvh, tris, O, D):
    """Walk one packet; returns (union_steps, best_t per ray)."""
    lower, upper, left, count = bvh.lower, bvh.upper, bvh.left, bvh.count
    G = len(O)
    RD = 1.0 / np.where(np.abs(D) < 1e-30, 1e-30, D)
    best_t = np.full(G, np.inf)

    def slab_any(i):
        t0 = (lower[i] - O) * RD
        t1 = (upper[i] - O) * RD
        tn = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0)
        tf = np.maximum(t0, t1).min(axis=1)
        return ((tn <= tf) & (tn < best_t)).any()

    def leaf_tighten(i):
        nonlocal best_t
        for j in range(left[i], left[i] + count[i]):
            a, b, c = tris[j]
            e1, e2 = b - a, c - a
            p = np.cross(D, e2)
            det = p @ e1
            ok = np.abs(det) >= 1e-9
            inv = 1.0 / np.where(ok, det, 1.0)
            tv = O - a
            u = np.einsum("gk,gk->g", tv, p) * inv
            q = np.cross(tv, e1)
            v = np.einsum("gk,gk->g", D, q) * inv
            t = (q @ e2) * inv
            hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
            best_t = np.where(hit & (t < best_t), t, best_t)

    steps = 0
    stack = []
    cur, mask = 0, 0
    while cur >= 0:
        steps += 1
        ch = children.get(cur, [])
        nxt = None
        for s, c in enumerate(ch):
            if mask & (1 << s):
                continue
            if not slab_any(c):
                continue
            if count[c] > 0:
                nxt = ("leaf", s, c)
                break
            if nxt is None:
                nxt = ("int", s, c)
        if nxt is None:
            if stack:
                cur, mask = stack.pop()
            else:
                cur = -1
            continue
        kind, s, c = nxt
        mask |= 1 << s
        if kind == "leaf":
            leaf_tighten(c)
        else:
            stack.append((cur, mask))
            cur, mask = c, 0
    return steps, best_t


def morton3(p, bits=8):
    q = np.clip(((p - p.min(0)) / (np.ptp(p, 0) + 1e-30) * (2**bits - 1))
                .astype(np.int64), 0, 2**bits - 1)

    def spread(x):
        x = (x | (x << 16)) & 0x0000FF0000FF
        x = (x | (x << 8)) & 0x00F00F00F00F
        x = (x | (x << 4)) & 0x0C30C30C30C3
        x = (x | (x << 2)) & 0x249249249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


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
    # frontal packets = Morton-ordered pixel blocks (device path sorts the
    # same way); baseline single-ray mean comes from G=1
    mort_f = morton3(np.stack([x.ravel(), y.ravel(), np.zeros(R)], -1))
    ord_f = np.argsort(mort_f, kind="stable")

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
    # device-path sort: direction octant then origin morton
    octant = ((D_d[:, 0] < 0) * 1 + (D_d[:, 1] < 0) * 2
              + (D_d[:, 2] < 0) * 4).astype(np.int64)
    key = (octant << 48) | morton3(O_d, bits=10)
    ord_d = np.argsort(key, kind="stable")

    for name, O, D, order in (
        ("frontal", O_f, D_f, ord_f),
        ("diffuse", O_d, D_d, ord_d),
    ):
        O, D = O[order], D[order]
        base_mean = None
        ref_t = None
        for G in (1, 8, 16, 32, 64, 128):
            n_pkts = len(O) // G
            steps = np.zeros(n_pkts)
            ts = np.zeros(n_pkts * G)
            for pi in range(n_pkts):
                sl = slice(pi * G, (pi + 1) * G)
                steps[pi], ts[sl] = packet_walk(
                    children, bvh, tris, O[sl], D[sl]
                )
            if G == 1:
                base_mean = steps.mean()
                ref_t = ts
                print(f"{name:8s} G=  1: per-ray mean {base_mean:5.2f} "
                      f"p95 {np.percentile(steps,95):5.1f} "
                      f"max {steps.max():4.0f}", flush=True)
                continue
            assert np.allclose(
                np.where(np.isfinite(ts), ts, -1),
                np.where(np.isfinite(ref_t), ref_t, -1), rtol=1e-6,
            ), f"{name} G={G}: hits differ from per-ray walk"
            infl = steps.mean() / base_mean
            print(
                f"{name:8s} G={G:3d}: union mean {steps.mean():6.1f} "
                f"p95 {np.percentile(steps,95):6.1f} max {steps.max():5.0f} "
                f"(infl {infl:4.2f}x) -> gather win {G/infl:5.1f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
