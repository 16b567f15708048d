#!/usr/bin/env python
"""On-TPU A/B of node fan-out (WIDE_K 4/8/16) on the 524k-tri benchmark.

r5_gather_shape.py: per-step gather cost is flat in consumed columns up
to ~128-col rows (36 us @ 4096 lanes), so wider nodes buy their step
reduction (simulated mean 8.3 -> 5.5, max 59 -> 38 steps at k=16) for
free. This measures the real wall clock per k with a small (tile, cap)
sweep each (the cap tracks p95 steps, which shrinks with k).

Usage: PYTHONPATH=... python benchmarks/r5_kary_ab.py [k ...]  (TPU)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main(ks):
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import tinsel_tpu.accel.build as ab
    import tinsel_tpu.accel.traverse as trav
    from tinsel_tpu.scene.procedural import sphere
    from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH

    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    r = 65536
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), np.inf, jnp.float32)

    caps_by_k = {4: (16, 20, 24), 8: (10, 14, 18), 16: (8, 12, 16)}

    ref = None
    for k in ks:
        ab.set_wide_k(k)
        t0 = time.perf_counter()
        m = sphere(radius=1.0, n_theta=512, n_phi=512)
        m.build()
        sc = Scene()
        sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
        flat = sc.flatten()
        h = flat.prim_static[0].mesh
        print(
            f"k={k}: build {time.perf_counter()-t0:.1f}s, "
            f"nodes {h.num_nodes}, stack {h.stack_slots}",
            flush=True,
        )

        for tile in (4096, 8192):
            for cap in caps_by_k[k]:
                trav.PHASE1_CAP = cap
                run = jax.jit(
                    lambda pool, o, d, t, tile=tile: trav.intersect_mesh(
                        pool, h.node_offset, h.tri_offset, o, d, t,
                        tile=tile, stack_slots=h.stack_slots,
                    )
                )
                out0 = run(flat.pool, origins, dirs, tmax)
                tt = np.asarray(out0[0])
                if ref is None:
                    ref = tt
                else:
                    same = (np.isfinite(ref) == np.isfinite(tt)).mean()
                    finite = np.isfinite(ref) & np.isfinite(tt)
                    md = float(np.abs(ref[finite] - tt[finite]).max())
                    assert same > 0.9999 and md < 1e-3, (same, md)
                samples = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    out = run(flat.pool, origins, dirs, tmax)
                    np.asarray(out[0].ravel()[:1])
                    samples.append(time.perf_counter() - t0)
                dt = sorted(samples)[2]
                print(
                    f"  k={k} tile {tile:5d} cap {cap:2d}: {dt*1e3:7.1f} ms "
                    f"{r/dt/1e6:6.3f} Mrays/s",
                    flush=True,
                )


if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [4, 8, 16]
    main(ks)
