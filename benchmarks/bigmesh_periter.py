#!/usr/bin/env python
"""Per-iteration cost of the REAL new traversal body via cap slope, plus
step-count accounting, to find where bigmesh_sweep's time goes."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from tinsel_tpu.scene.procedural import sphere
from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH
from tinsel_tpu.accel.traverse import (
    _init_state, _split3, _traverse_tile, traversal_cost,
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
    h = flat.prim_static[0].mesh

    for r in (8192, 16384):
        side = 256
        g = np.linspace(-1.2, 1.2, side, dtype=np.float32)
        x, y = np.meshgrid(g, g)
        o3 = np.stack(
            [x.ravel(), y.ravel(), np.full(side * side, -3.0, np.float32)], -1
        )[:r]
        d3 = np.tile(np.array([[1e-5, 1e-5, 1.0]], np.float32), (r, 1))
        o = _split3(jnp.asarray(o3))
        d = _split3(jnp.asarray(d3))

        def run(cap, o, d):
            state = _init_state(r, jnp.full((r,), jnp.inf, jnp.float32))
            out = _traverse_tile(
                flat.pool, h.node_offset, h.tri_offset, o, d, state, cap=cap
            )
            return out[2]

        jrun = jax.jit(run, static_argnums=0)
        t64 = timed(jrun, 64, o, d)
        t512 = timed(jrun, 512, o, d)
        per = (t512 - t64) / (512 - 64)
        print(
            f"R={r}: cap64 {t64*1e3:.1f} ms, cap512 {t512*1e3:.1f} ms "
            f"-> {per*1e6:.1f} us/iter"
        )

    # step accounting on the full 65536-ray batch
    r = 65536
    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), jnp.inf, jnp.float32)
    steps = np.asarray(
        jax.jit(
            lambda p, o, d, t: traversal_cost(
                p, h.node_offset, h.tri_offset, o, d, t, tile=8192
            )
        )(flat.pool, origins, dirs, tmax)
    )
    print(
        f"steps: mean {steps.mean():.1f} p95 {np.percentile(steps,95):.0f} "
        f"max {steps.max():.0f}"
    )
    per_tile = steps.reshape(-1, 8192)
    print("per-tile max:", per_tile.max(axis=1))


if __name__ == "__main__":
    main()
