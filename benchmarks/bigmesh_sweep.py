#!/usr/bin/env python
"""Tune the new 4-ary leaf-block traversal on the bigmesh workload:
sweep tile size and the phase-1 cap. Honest sync via 1-element transfer
after a full-result np.asarray warmup.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import tinsel_tpu.accel.traverse as tv
from tinsel_tpu.scene.procedural import sphere
from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH
from tinsel_tpu.accel.traverse import intersect_mesh


def main():
    t0 = time.perf_counter()
    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    h = flat.prim_static[0].mesh
    print(f"scene build: {time.perf_counter()-t0:.1f}s, nodes={h.num_nodes}, "
          f"padded tris={h.num_tris}")

    r = 256 * 256
    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), jnp.inf, jnp.float32)

    ref_t = None
    combos = (
        [(48, t) for t in (4096, 8192, 16384, 32768)]
        + [(32, 16384), (64, 16384)]
    )
    for cap, tile in combos:
        tv.PHASE1_CAP = cap
        if True:
            run = jax.jit(
                lambda pool, o, d, t, _tile=tile: intersect_mesh(
                    pool, h.node_offset, h.tri_offset, o, d, t, tile=_tile
                )
            )
            out = run(flat.pool, origins, dirs, tmax)
            tt = np.asarray(out[0])
            if ref_t is None:
                ref_t = tt
                n_hit = int(np.isfinite(tt).sum())
                print(f"hits: {n_hit}/{r}")
            else:
                assert np.array_equal(np.isfinite(tt), np.isfinite(ref_t)), (
                    "hit mask mismatch!"
                )
                np.testing.assert_allclose(
                    tt[np.isfinite(tt)], ref_t[np.isfinite(ref_t)], rtol=1e-5
                )
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                out = run(flat.pool, origins, dirs, tmax)
            np.asarray(out[0].ravel()[:1])
            dt = (time.perf_counter() - t0) / n
            print(
                f"cap={cap:3d} tile={tile:6d}: {dt*1e3:7.1f} ms  "
                f"{r/dt/1e6:6.2f} Mrays/s"
            )


if __name__ == "__main__":
    main()
