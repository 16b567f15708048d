#!/usr/bin/env python
"""Decompose the full bigmesh intersect_mesh wall time into pipeline
stages (TPU, slope-of-chain method): phase-1 capped walk, compaction
argsort+permutes, phase-2 finish, and the refit. The r7_stepcost per-step
marginal (26 us/step at 4096 lanes) explains only ~7 of the measured
18.5 ms — this finds the rest.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from tinsel_tpu.utils.compile_cache import enable_compile_cache
from tinsel_tpu.scene.procedural import sphere
from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH
import tinsel_tpu.accel.traverse as trav


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def med_time(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def chain_cost(make, *args, lo=2, hi=8):
    return (med_time(make(hi), *args) - med_time(make(lo), *args)) / (hi - lo)


def main():
    enable_compile_cache()
    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    h = flat.prim_static[0].mesh
    pool = flat.pool

    r = 256 * 256
    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), np.inf, jnp.float32)
    tile = trav.TILE

    def serialize(o, acc):
        return o + (0.0 * acc[:1]).reshape(1, 1)

    # ---- 1. full intersect_mesh (the bench number)
    def make_full(n):
        @jax.jit
        def run(pool, o, d, t):
            def body(i, acc):
                o2 = serialize(o, acc)
                tt, *_ = trav.intersect_mesh(
                    pool, h.node_offset, h.tri_offset, o2, d, t,
                    stack_slots=h.stack_slots,
                )
                return jnp.where(jnp.isfinite(tt), tt, 0.0)
            return jax.lax.fori_loop(0, n, body, t * 0.0)
        return run

    c = chain_cost(make_full, pool, origins, dirs, tmax)
    print(f"full intersect_mesh : {c*1e3:7.2f} ms  "
          f"({r/c/1e6:5.2f} Mrays/s)", flush=True)

    # ---- 2. phase-1 only (16 tiles x cap-16 fori) + init
    def make_p1(n):
        @jax.jit
        def run(pool, o, d, t):
            def body(i, acc):
                o2 = serialize(o, acc)
                no = jnp.broadcast_to(jnp.int32(h.node_offset), (r,))
                to = jnp.broadcast_to(jnp.int32(h.tri_offset), (r,))
                o3 = trav._split3(o2)
                d3 = trav._split3(d)
                st = trav._init_state(r, t, h.stack_slots)
                st1 = trav._map_tiles(
                    pool, no, to, o3, d3, st, tile, trav.PHASE1_CAP, False
                )
                return jnp.where(jnp.isfinite(st1["best_t"]),
                                 st1["best_t"], 0.0)
            return jax.lax.fori_loop(0, n, body, t * 0.0)
        return run

    c_p1 = chain_cost(make_p1, pool, origins, dirs, tmax)
    print(f"phase-1 capped walk : {c_p1*1e3:7.2f} ms", flush=True)

    # ---- 3. compaction: argsort(i8) + permutes of the full state
    def make_sort(n):
        @jax.jit
        def run(pool, o, d, t):
            o3 = trav._split3(o)
            d3 = trav._split3(d)
            st = trav._init_state(r, t, h.stack_slots)
            no = jnp.broadcast_to(jnp.int32(h.node_offset), (r,))
            to = jnp.broadcast_to(jnp.int32(h.tri_offset), (r,))

            def body(i, carry):
                acc, o3c = carry
                finished = (st["cur"] + i) < 0
                perm = jnp.argsort(finished.astype(jnp.int8), stable=True)
                o3p = tuple(c[perm] for c in o3c)
                d3p = tuple(c[perm] for c in d3)
                nop = no[perm]
                top = to[perm]
                bt = st["best_t"][perm]
                tri = st["best_tri"][perm]
                inv = jnp.argsort(perm)
                out = jnp.take(bt, inv) + jnp.take(tri, inv)
                return acc + out * 1e-20, tuple(
                    c + acc[:1] * 0.0 for c in o3p
                )
            acc, _ = jax.lax.fori_loop(0, n, body, (t * 0.0, o3))
            return acc
        return run

    c_sort = chain_cost(make_sort, pool, origins, dirs, tmax)
    print(f"compaction (2x argsort + permutes): {c_sort*1e3:7.2f} ms",
          flush=True)

    # ---- 4. phase-2: map_tiles uncapped on the ALREADY-FINISHED state
    # (the floor cost of 16 while-loop tiles where ~1 has work)
    # approximated by running phase 1 then phase 2 and subtracting p1.
    def make_p12(n):
        @jax.jit
        def run(pool, o, d, t):
            def body(i, acc):
                o2 = serialize(o, acc)
                no = jnp.broadcast_to(jnp.int32(h.node_offset), (r,))
                to = jnp.broadcast_to(jnp.int32(h.tri_offset), (r,))
                bt, tri = trav._run_tiled(
                    pool, no, to, o2, d, t, tile, h.stack_slots
                )
                return jnp.where(jnp.isfinite(bt), bt, 0.0)
            return jax.lax.fori_loop(0, n, body, t * 0.0)
        return run

    c_p12 = chain_cost(make_p12, pool, origins, dirs, tmax)
    print(f"run_tiled (p1+sort+p2): {c_p12*1e3:7.2f} ms "
          f"(=> p2+sort = {(c_p12-c_p1)*1e3:6.2f} ms; "
          f"refit = {(c-c_p12)*1e3:6.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
