#!/usr/bin/env python
"""One-config bigmesh closest-hit measurement (bench.py's _bigmesh_metric
with the persistent compile cache enabled), for fast iteration on the
traversal loop."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tinsel_tpu.scene.procedural import sphere
    from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH
    from tinsel_tpu.accel.traverse import intersect_mesh

    t0 = time.perf_counter()
    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    h = flat.prim_static[0].mesh
    print(f"scene build: {time.perf_counter() - t0:.1f}s", flush=True)

    r = 256 * 256
    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), jnp.inf, jnp.float32)

    run = jax.jit(
        lambda pool, o, d, t: intersect_mesh(
            pool, h.node_offset, h.tri_offset, o, d, t,
            stack_slots=h.stack_slots,
        )
    )
    t0 = time.perf_counter()
    out = run(flat.pool, origins, dirs, tmax)
    tt = np.asarray(out[0])
    print(
        f"compile+first run: {time.perf_counter() - t0:.1f}s, "
        f"hits {int(np.isfinite(tt).sum())}/{r}, "
        f"t[hit].mean {tt[np.isfinite(tt)].mean():.6f}",
        flush=True,
    )
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = run(flat.pool, origins, dirs, tmax)
    np.asarray(out[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / n
    print(f"{dt * 1e3:7.1f} ms  {r / dt / 1e6:6.3f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
