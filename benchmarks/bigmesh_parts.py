#!/usr/bin/env python
"""Decompose the bigmesh intersect_mesh call: tiled loops only vs
two-phase (adds argsort compaction) vs full (adds refit)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from tinsel_tpu.scene.procedural import sphere
from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH
from tinsel_tpu.accel.traverse import (
    _init_state, _split3, _map_tiles, _run_tiled, _refit_hit, intersect_mesh,
)


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def main():
    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    h = flat.pool, None
    handle = sc.primitives and flat.prim_static[0].mesh
    pool = flat.pool

    r = 65536
    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), jnp.inf, jnp.float32)
    tile = 8192

    no, to = handle.node_offset, handle.tri_offset

    def loops_only(pool, origins, dirs, tmax):
        o = _split3(origins)
        d = _split3(dirs)
        state = _init_state(r, tmax)
        out = _map_tiles(pool, no, to, o, d, state, tile, None, False)
        return out[2]

    def twophase(pool, origins, dirs, tmax):
        return _run_tiled(pool, no, to, origins, dirs, tmax, tile)[0]

    def full(pool, origins, dirs, tmax):
        return intersect_mesh(pool, no, to, origins, dirs, tmax, tile=tile)[0]

    for name, fn in (
        ("loops only (single-phase)", loops_only),
        ("two-phase (adds compaction)", twophase),
        ("full (adds refit)", full),
    ):
        dt = timed(jax.jit(fn), pool, origins, dirs, tmax)
        print(f"{name:28s}: {dt*1e3:7.1f} ms  {r/dt/1e6:6.2f} Mrays/s")

    # dispatch floor for reference
    tiny = jax.jit(lambda x: x + 1)
    xsmall = jnp.ones((8,), jnp.float32)
    print(f"dispatch floor: {timed(tiny, xsmall, reps=10)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
