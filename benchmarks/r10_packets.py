#!/usr/bin/env python
"""DEVICE A/B of shared-walk packet traversal (VERDICT r4 #1).

The r7 simulator recorded frontal G=8 union inflation 1.22x -> 6.6x
fewer gather lane-steps (benchmarks/r7_packet_sim.py RESULT block); the
r4 rejection note mis-transcribed those numbers. This relitigates ON
DEVICE: the 524k-tri bigmesh closest-hit workload (bench.py's exact
rays: 65k coherent frontal grid rays in row-major order, so consecutive
G rays are adjacent pixels), per-ray walk vs accel.packets for
G in {4, 8, 16} x tile/cap sweeps. Slope between two in-jit chain
lengths, host-transfer synced (bench.py methodology).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/r10_packets.py

RESULT (TPU v5 lite, 2026-08-20, interleaved same-session slopes; the
tunnel's session drift is +-15-20%, so only same-run comparisons count):

  stage 1 — first cut (tuple stack, per-column compaction glue):
    per-ray walk 5.71-6.68 / packets g=8 tile 512 cap 24: 6.3-8.6
    -> 1.1-1.5x; phase breakdown: phase1 3.2 ms, tail+compaction 5.4 ms
    of 8.6 ms total (restart re-paid capped union steps; ~170 glue ops
    at ~0.2 us fixed cost each).
  stage 2 — measured-and-rejected: STACK_MATRIX (tuple 7.07 vs matrix
    6.51), PHASE2_PERRAY tail (6.38 vs 8.02 packet-tail), perm-resume
    vs restart initially tied (7.95 vs 7.20).
  stage 3 — packed-key child scans (3 masked min-reductions instead of
    5 + select-sums) + block-matrix compaction (ONE (P, C) gather, ~15
    ops) + resume tail:
    per-ray 6.35-6.39 / packets g8 t512 c24: 11.2 -> 1.76x
    final sweep (13 reps, median-of-slope): g8 t1024 c28 16.7 (best
    run) / 13.3 (best-slope), g4 t1536 c24 15.4/13.0, g8 t768 c28
    12.3/11.0, per-ray 6.37.
  DEFAULTS shipped: G=8, PACKET_TILE=1024, PACKET_PHASE1_CAP=28,
  tuple stack, packet-tail resume. Headline: ~2.1-2.6x the per-ray
  walk on the coherent bigmesh workload; the ray-order strips (8
  consecutive row-major pixels) needed NO Morton sort (host sim: strip
  union mean 24.8 vs morton 22.4 at G=8 — within noise of the win).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import bench
    from tinsel_tpu.accel import traverse as trav
    from tinsel_tpu.accel.packets import intersect_mesh_packets

    flat, h, origins, dirs, tmax = bench._bigmesh_workload()
    pool = flat.pool
    r = origins.shape[0]

    def chain_perray(n):
        def run(pool, o, d, t):
            def body(i, bt):
                o2 = o + (0.0 * bt[:1]).reshape(1, 1)
                tt, *_ = trav.intersect_mesh(
                    pool, h.node_offset, h.tri_offset, o2, d, t,
                    stack_slots=h.stack_slots,
                )
                return jnp.where(jnp.isfinite(tt), tt, 0.0)
            return jax.lax.fori_loop(0, n, body, t * 0.0)
        return jax.jit(run)

    def chain_packets(n, g, tile, cap):
        def run(pool, o, d, t):
            def body(i, bt):
                o2 = o + (0.0 * bt[:1]).reshape(1, 1)
                tt, tri = intersect_mesh_packets(
                    pool, h.node_offset, h.tri_offset, o2, d, t,
                    g=g, stack_slots=h.stack_slots, tile=tile, cap=cap,
                )
                return jnp.where(tri >= 0, tt, 0.0)
            return jax.lax.fori_loop(0, n, body, t * 0.0)
        return jax.jit(run)

    def mrays(make):
        ts = {}
        for n in (1, 4):
            fn = make(n)
            np.asarray(fn(pool, origins, dirs, tmax).ravel()[:1])
            ss = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(pool, origins, dirs, tmax)
                np.asarray(out.ravel()[:1])
                ss.append(time.perf_counter() - t0)
            ts[n] = sorted(ss)[1]
        return r / ((ts[4] - ts[1]) / 3) / 1e6

    base = mrays(chain_perray)
    print(f"per-ray walk (shipped)          : {base:7.2f} Mrays/s", flush=True)

    # correctness on device for one config
    t_ref, tri_ref, *_ = trav.intersect_mesh(
        pool, h.node_offset, h.tri_offset, origins, dirs, tmax,
        stack_slots=h.stack_slots,
    )
    t_p, tri_p = intersect_mesh_packets(
        pool, h.node_offset, h.tri_offset, origins, dirs, tmax,
        g=8, stack_slots=h.stack_slots,
    )
    tp = np.where(np.asarray(tri_p) >= 0, np.asarray(t_p), np.inf)
    assert np.allclose(tp, np.asarray(t_ref), rtol=1e-6), "packet mismatch"
    print("device correctness: packets g=8 == per-ray walk", flush=True)

    for g in (4, 8, 16):
        for tile, cap in ((4096 // g, 16), (8192 // g, 16), (2048 // g, 16),
                          (4096 // g, 10), (4096 // g, 24)):
            m = mrays(lambda n, g=g, t=tile, c=cap: chain_packets(n, g, t, c))
            print(
                f"packets g={g:2d} tile={tile:4d} cap={cap:2d}   : "
                f"{m:7.2f} Mrays/s  ({m/base:4.2f}x)",
                flush=True,
            )


if __name__ == "__main__":
    main()
