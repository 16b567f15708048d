#!/usr/bin/env python
"""Measure the SHIPPED traversal's true per-step cost and step counts on
the bigmesh workload (TPU), decomposing where the r3 cost model's ~8.5
ns/lane/step actually goes.

Method: an outer in-jit fori chains N independent capped tile-walks
(fresh state each, serialized through a data dependency); the slope
between two N values gives the cost of ONE capped walk dispatch-free;
the difference between two CAP values divided by the cap delta gives the
per-step marginal. (Directly slope-ing two cap values is swamped by the
14-31 ms session-variable tunnel dispatch: 32 steps x 35 us ~ 1 ms.)

Also reports measured steps/ray (mean / p95 / per-tile max) via
traversal_cost for the full 65536-ray bench — the numbers bench.py's
roofline should use instead of the hardcoded 5.5 (VERDICT r3 #4).
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


def per_walk_cost(make_chain, *args, n_lo=8, n_hi=40):
    t_lo = med_time(make_chain(n_lo), *args)
    t_hi = med_time(make_chain(n_hi), *args)
    return (t_hi - t_lo) / (n_hi - n_lo)


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

    # ---- measured steps/ray over the full bench (the roofline inputs)
    steps = np.asarray(
        trav.traversal_cost(
            pool, h.node_offset, h.tri_offset, origins, dirs, tmax,
            stack_slots=h.stack_slots,
        )
    )
    tile_max = steps.reshape(-1, trav.TILE).max(axis=1)
    print(
        f"steps/ray: mean {steps.mean():.2f} p95 "
        f"{np.percentile(steps, 95):.1f} max {steps.max():.0f}; "
        f"per-4096-tile max mean {tile_max.mean():.1f}",
        flush=True,
    )

    tile = trav.TILE
    o1 = origins[:tile]
    d1 = dirs[:tile]
    t1 = tmax[:tile]
    block_base = h.tri_offset // 16

    def make_chain(n, cap, body_kind):
        from tinsel_tpu.accel.build import WIDE_K as K

        @jax.jit
        def run(pool, o, d, t):
            o3 = tuple(o[:, i] for i in range(3))
            d3 = tuple(d[:, i] for i in range(3))
            rd = trav._safe_rcp3(d3)

            def one_walk(w, acc):
                # serialize walks: nudge tmax by 0*acc
                st = trav._init_state(tile, t + 0.0 * acc, h.stack_slots)

                if body_kind == "full":
                    def body(i, s):
                        return trav._step(
                            pool, h.node_offset, block_base, o3, d3, rd, s
                        )
                else:
                    def body(i, s):
                        cur = s["cur"]
                        live = cur >= 0
                        row = pool.node_rows[
                            h.node_offset + jnp.maximum(cur, 0)
                        ]
                        best_t = s["best_t"]
                        if body_kind == "node+block":
                            pend = s["pend"]
                            has_pend = pend >= 0
                            brow = pool.block_rows[
                                block_base + jnp.where(has_pend, pend, 0)
                            ]
                            found, t_min, _ = trav._block_test_row(
                                brow, pend, has_pend, o3, d3, best_t
                            )
                            best_t = jnp.where(found, t_min, best_t)
                        ok, words = trav._child_tests(
                            row, o3, rd, best_t, live
                        )
                        s2 = dict(s)
                        # cheap dependent advance (no stack logic)
                        s2["cur"] = jnp.abs(
                            cur + words[:, 0] + i
                        ) % (h.num_nodes)
                        s2["best_t"] = best_t
                        if body_kind == "node+block":
                            s2["pend"] = jnp.abs(
                                jnp.where(ok[:, 0], words[:, 1], pend) + i
                            ) % pool.block_rows.shape[0]
                        return s2

                out = jax.lax.fori_loop(0, cap, body, st)
                return acc + out["best_t"] * 0.0 + out["cur"].astype(
                    jnp.float32
                ) * 1e-9

            return jax.lax.fori_loop(
                0, n, one_walk, jnp.zeros((tile,), jnp.float32)
            )
        return run

    for body_kind in ("full", "node-only", "node+block"):
        costs = {}
        for cap in (8, 32):
            costs[cap] = per_walk_cost(
                lambda n, c=cap: make_chain(n, c, body_kind),
                pool, o1, d1, t1,
            )
        per_step = (costs[32] - costs[8]) / 24
        print(
            f"{body_kind:11s}: per-walk cap8 {costs[8]*1e6:7.1f} us  "
            f"cap32 {costs[32]*1e6:7.1f} us  -> per-step "
            f"{per_step*1e6:6.2f} us = {per_step*1e9/tile:5.2f} ns/lane",
            flush=True,
        )


if __name__ == "__main__":
    main()
