#!/usr/bin/env python
"""Round-3 decomposition of the traversal per-iteration cost.

Times the REAL _step body in a fori_loop with a root-restart (finished
lanes rewind to the root with best_t reset) so the iteration count is
EXACT — the cap-slope method under-counts when tiles finish early. Sweeps
(lanes, stack_slots) to split the cost into:
  floor + gather(lanes) + stack(lanes * slots)
The shipped 48-slot unrolled select-chain stack is the suspect for why a
4096-lane iteration costs ~5x the measured two-gather floor (12.5 us).

Usage: PYTHONPATH=... python benchmarks/r5_periter_decomp.py  (TPU)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import sys

    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import tinsel_tpu.accel.build as ab
    if len(sys.argv) > 1:
        ab.set_wide_k(int(sys.argv[1]))

    from tinsel_tpu.accel.traverse import (
        _init_state, _safe_rcp3, _split3, _step,
    )
    from tinsel_tpu.accel.build import BLOCK_SIZE
    from tinsel_tpu.scene.procedural import sphere
    from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH

    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    h = flat.prim_static[0].mesh
    print(f"exact stack bound for 524k sphere: {h.stack_slots}", flush=True)

    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    o_all = np.stack(
        [x.ravel(), y.ravel(), np.full(65536, -3.0, np.float32)], -1
    )
    d_all = np.tile(np.array([[1e-5, 1e-5, 1.0]], np.float32), (65536, 1))

    block_base = h.tri_offset // BLOCK_SIZE

    for lanes in (4096, 16384):
        o = _split3(jnp.asarray(o_all[:lanes]))
        d = _split3(jnp.asarray(d_all[:lanes]))
        rd = _safe_rcp3(d)
        tmax = jnp.full((lanes,), np.inf, np.float32)

        for slots in (8, 16):

            def run(k, pool):
                st = _init_state(lanes, tmax, slots)

                def body(i, s):
                    s = _step(pool, h.node_offset, block_base, o, d, rd, s)
                    done = (s["cur"] < 0) & (s["pend"] < 0)
                    s["cur"] = jnp.where(done, 0, s["cur"])
                    s["best_t"] = jnp.where(done, tmax, s["best_t"])
                    return s

                out = jax.lax.fori_loop(0, k, body, st)
                return out["best_t"]

            jrun = jax.jit(run, static_argnums=0)
            ts = {}
            for k in (32, 128):
                np.asarray(jrun(k, flat.pool).ravel()[:1])
                t0 = time.perf_counter()
                for _ in range(3):
                    out = jrun(k, flat.pool)
                np.asarray(out.ravel()[:1])
                ts[k] = (time.perf_counter() - t0) / 3
            per = (ts[128] - ts[32]) / 96
            print(
                f"lanes {lanes:6d} slots {slots:2d}: {per*1e6:8.2f} us/iter "
                f"({per/lanes*1e9:6.3f} ns/lane)",
                flush=True,
            )


if __name__ == "__main__":
    main()
