#!/usr/bin/env python
"""Round-4 bigmesh sweep: large tiles against the two-phase cap schedule.

Per-iteration economics measured in r2/r3: ~30-40 us fixed floor per
while-loop step plus ~12.5 us marginal at 4096 lanes. At tile 4096 the
floor is ~3/4 of each step — larger tiles amortize it, at the price of a
worse lockstep tail, which the phase-1 cap + argsort compaction exists to
mop up. r3 swept tiles to 16384 at the OLD per-iter cost; this pushes to
the whole-batch single tile and jointly sweeps the cap, plus a cap for
phase 2 (a third phase catching the extreme tail).

Usage: python benchmarks/bigmesh_sweep_r4.py  (TPU)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def make_rays(r_side):
    r = r_side * r_side
    g = np.linspace(-1.2, 1.2, r_side, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), jnp.inf, jnp.float32)
    return origins, dirs, tmax


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import tinsel_tpu.accel.traverse as trav
    from tinsel_tpu.scene.procedural import sphere
    from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH

    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    h = flat.prim_static[0].mesh

    origins, dirs, tmax = make_rays(256)
    r = origins.shape[0]

    # NOTE: PHASE1_CAP=36 was tuned for the old skip-link walk (p95 ~34);
    # the stack advance cut per-ray p95 to ~19 (step_stats_stack_kary.py),
    # so low caps are the first thing to re-test. PHASE2_CAP deepens the
    # schedule to three phases (second compaction) — sweep it at the best
    # (tile, cap) afterwards.
    for tile in (2048, 4096, 8192, 16384, 65536):
        for cap in (12, 16, 20, 24, 28, 36):
            trav.PHASE1_CAP = cap
            run = jax.jit(
                lambda pool, o, d, t, tile=tile: trav.intersect_mesh(
                    pool, h.node_offset, h.tri_offset, o, d, t, tile=tile,
                    stack_slots=h.stack_slots,
                )
            )
            np.asarray(run(flat.pool, origins, dirs, tmax)[0].ravel()[:1])
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                out = run(flat.pool, origins, dirs, tmax)
            np.asarray(out[0].ravel()[:1])
            dt = (time.perf_counter() - t0) / n
            print(
                f"tile {tile:6d} cap {cap:3d}: {dt*1e3:7.1f} ms "
                f"{r/dt/1e6:6.3f} Mrays/s",
                flush=True,
            )


if __name__ == "__main__":
    import sys

    import tinsel_tpu.accel.traverse as trav

    if len(sys.argv) > 1 and sys.argv[1] == "phase2":
        # usage: bigmesh_sweep_r4.py phase2 [tile] [cap]
        tile = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
        cap = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        trav.PHASE1_CAP = cap
        import numpy as np
        import jax
        import jax.numpy as jnp
        import time
        from tinsel_tpu.utils.compile_cache import enable_compile_cache
        from tinsel_tpu.scene.procedural import sphere
        from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH

        enable_compile_cache()
        m = sphere(radius=1.0, n_theta=512, n_phi=512)
        m.build()
        sc = Scene()
        sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
        flat = sc.flatten()
        h = flat.prim_static[0].mesh
        origins, dirs, tmax = make_rays(256)
        r = origins.shape[0]
        for p2 in (None, 8, 12, 16, 24):
            trav.PHASE2_CAP = p2
            run = jax.jit(
                lambda pool, o, d, t: trav.intersect_mesh(
                    pool, h.node_offset, h.tri_offset, o, d, t, tile=tile,
                    stack_slots=h.stack_slots,
                )
            )
            np.asarray(run(flat.pool, origins, dirs, tmax)[0].ravel()[:1])
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(flat.pool, origins, dirs, tmax)
            np.asarray(out[0].ravel()[:1])
            dt = (time.perf_counter() - t0) / 3
            print(
                f"tile {tile} cap {cap} p2 {str(p2):4s}: {dt*1e3:7.1f} ms "
                f"{r/dt/1e6:6.3f} Mrays/s",
                flush=True,
            )
        trav.PHASE2_CAP = None
    else:
        main()
