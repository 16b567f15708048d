#!/usr/bin/env python
"""Round-3 sweep of traversal tile size and phase-1 cap on the 524k-tri
closest-hit benchmark, after the deferred-block-test change (gathers now
overlap, so the optimal tile/cap may have shifted)."""

import time

import numpy as np
import jax
import jax.numpy as jnp


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

    r = 256 * 256
    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), jnp.inf, jnp.float32)

    for tile in (2048, 4096, 8192, 16384):
        for cap in (16, 22, 28, 36):
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
    main()
