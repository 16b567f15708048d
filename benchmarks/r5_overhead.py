#!/usr/bin/env python
"""Where do the NON-loop milliseconds go in intersect_mesh?

At k=16 the measured step costs ~30 us @ 4096 lanes and phase 1 runs
~240 tile-iterations (~7 ms), yet end-to-end is ~45 ms. This times the
pipeline pieces separately on the 524k-tri benchmark:

  walk       — _run_tiled only (no refit)
  refit      — intersect_mesh minus walk
  1-phase    — _map_tiles uncapped, no compaction, no restart
  compact    — the argsort + permutation block alone

Usage: PYTHONPATH=... python benchmarks/r5_overhead.py [k]  (TPU)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import tinsel_tpu.accel.build as ab
    if len(sys.argv) > 1:
        ab.set_wide_k(int(sys.argv[1]))
    import tinsel_tpu.accel.traverse as trav
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
    tile = 4096
    trav.PHASE1_CAP = 16 if ab.WIDE_K >= 8 else 20

    full = jax.jit(
        lambda pool, o, d, t: trav.intersect_mesh(
            pool, h.node_offset, h.tri_offset, o, d, t, tile=tile,
            stack_slots=h.stack_slots,
        )
    )
    t_full = timed(full, flat.pool, origins, dirs, tmax)

    walk = jax.jit(
        lambda pool, o, d, t: trav._run_tiled(
            pool, h.node_offset, h.tri_offset, o, d, t, tile,
            h.stack_slots,
        )
    )
    t_walk = timed(walk, flat.pool, origins, dirs, tmax)

    def one_phase(pool, o, d, t):
        no = jnp.broadcast_to(jnp.int32(h.node_offset), (r,))
        to = jnp.broadcast_to(jnp.int32(h.tri_offset), (r,))
        o3 = trav._split3(o)
        d3 = trav._split3(d)
        st = trav._init_state(r, t, h.stack_slots)
        out = trav._map_tiles(pool, no, to, o3, d3, st, tile, None, False)
        return out["best_t"], out["best_tri"]

    t_1p = timed(jax.jit(one_phase), flat.pool, origins, dirs, tmax)

    # compaction block alone: argsort(int8) + permute the phase-carried set
    def compact(fin, o, d, t):
        perm = jnp.argsort(fin.astype(jnp.int8), stable=True)
        o2 = tuple(c[perm] for c in trav._split3(o))
        d2 = tuple(c[perm] for c in trav._split3(d))
        t2 = t[perm]
        inv = jnp.argsort(perm)
        return o2[0], d2[0], t2, inv

    fin = jnp.asarray(np.random.default_rng(0).random(r) < 0.95)
    t_comp = timed(jax.jit(compact), fin, origins, dirs, tmax)

    # empty dispatch floor on this tunnel
    t_disp = timed(jax.jit(lambda x: x + 1.0), tmax)

    print(
        f"k={ab.WIDE_K}: full {t_full*1e3:7.1f} ms | walk {t_walk*1e3:7.1f}"
        f" | 1-phase {t_1p*1e3:7.1f} | compact {t_comp*1e3:6.1f}"
        f" | dispatch {t_disp*1e3:6.1f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
