#!/usr/bin/env python
"""On-TPU A/B of WIDE_K=16 vs 32 on the 524k-tri bench (slope method).

K=32 node rows are 136 cols — just past the measured flat-cost window
(~128), so the bet is: ~0.75x the steps (depth log32 vs log16) against a
few-percent wider row. Timing is the same dispatch-free chain slope as
bench.py's _bigmesh_metric (single-dispatch timings measure the tunnel).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/r6_k32_ab.py [k ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def measure(k, caps):
    import tinsel_tpu.accel.build as ab
    import tinsel_tpu.accel.traverse as trav
    from tinsel_tpu.scene.procedural import sphere
    from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH

    ab.set_wide_k(k)
    t0 = time.perf_counter()
    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    h = flat.prim_static[0].mesh
    print(
        f"k={k}: build {time.perf_counter()-t0:.1f}s nodes {h.num_nodes} "
        f"stack {h.stack_slots}",
        flush=True,
    )

    r = 256 * 256
    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), np.inf, jnp.float32)

    for cap in caps:
        trav.PHASE1_CAP = cap

        def chain(n):
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

        ts = {}
        for n in (1, 4):
            fn = chain(n)
            np.asarray(fn(flat.pool, origins, dirs, tmax).ravel()[:1])
            ss = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(flat.pool, origins, dirs, tmax)
                np.asarray(out.ravel()[:1])
                ss.append(time.perf_counter() - t0)
            ts[n] = sorted(ss)[1]
        per = (ts[4] - ts[1]) / 3
        print(
            f"  k={k} cap {cap:2d}: {per*1e3:7.1f} ms/iter "
            f"{r/per/1e6:6.3f} Mrays/s",
            flush=True,
        )


def main(ks):
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    caps_by_k = {16: (16,), 32: (8, 12, 16)}
    for k in ks:
        measure(k, caps_by_k.get(k, (12, 16)))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [16, 32])
