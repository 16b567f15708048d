#!/usr/bin/env python
"""Dispatch-free bigmesh rate: chain N dependent traversals inside ONE
jit and take the slope between two N values — the ~28 ms tunnel dispatch
floor (measured r5_overhead.py) cancels. This is the honest machine rate:
in production the traversal runs inside the integrator megaloop at many
traversals per dispatch.

Usage: PYTHONPATH=... python benchmarks/r5_chained.py [k] [tile] [cap]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import os

    import tinsel_tpu.accel.build as ab
    argv = sys.argv[1:]
    if argv:
        ab.set_wide_k(int(argv[0]))
    if os.environ.get("TINSEL_BLOCK"):
        ab.set_block_size(int(os.environ["TINSEL_BLOCK"]))
    import tinsel_tpu.accel.traverse as trav
    tile = int(argv[1]) if len(argv) > 1 else 4096
    if len(argv) > 2:
        trav.PHASE1_CAP = int(argv[2])
    from tinsel_tpu.scene.procedural import sphere
    from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH

    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    h = flat.prim_static[0].mesh

    r = 65536
    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), np.inf, jnp.float32)

    def chain(n):
        def run(pool, o, d, t):
            def body(i, carry):
                bt = carry
                # dependency: nudge origins by a value XLA cannot fold
                o2 = o + (0.0 * bt[:1]).reshape(1, 1)
                tt, tri, *_ = trav.intersect_mesh(
                    pool, h.node_offset, h.tri_offset, o2, d, t,
                    stack_slots=h.stack_slots, tile=tile,
                )
                return jnp.where(jnp.isfinite(tt), tt, 0.0)
            return jax.lax.fori_loop(0, n, body, t * 0.0)
        return jax.jit(run)

    ts = {}
    for n in (1, 4):
        fn = chain(n)
        np.asarray(fn(flat.pool, origins, dirs, tmax).ravel()[:1])
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(flat.pool, origins, dirs, tmax)
            np.asarray(out.ravel()[:1])
            samples.append(time.perf_counter() - t0)
        ts[n] = sorted(samples)[2]
        print(f"  n={n}: {ts[n]*1e3:.1f} ms", flush=True)
    per = (ts[4] - ts[1]) / 3
    print(
        f"k={ab.WIDE_K} tile={tile} cap={trav.PHASE1_CAP}: "
        f"{per*1e3:.1f} ms/traversal = {r/per/1e6:.2f} Mrays/s (machine)",
        flush=True,
    )


if __name__ == "__main__":
    main()
