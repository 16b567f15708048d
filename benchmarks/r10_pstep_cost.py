#!/usr/bin/env python
"""Marginal cost of ONE packet step (_pstep) vs one per-ray step (_step)
in ns per GATHER LANE (packet lane = P, per-ray lane = R), by the nested
chained-capped-walk slope of bench._bigmesh_step_stats. If a packet step
at P lanes costs >> P x 12.5 ns, the (P, G[, K]) broadcast VPU side or
the G-minor layout is the overhead, not the gathers.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import bench
    from tinsel_tpu.accel import traverse as trav
    from tinsel_tpu.accel import packets as pk
    from tinsel_tpu.accel import build as _b

    flat, h, origins, dirs, tmax = bench._bigmesh_workload()
    pool = flat.pool
    block_base = h.tri_offset // _b.BLOCK_SIZE

    def med_time(fn, *args, reps=5):
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        ss = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out.ravel()[:1])
            ss.append(time.perf_counter() - t0)
        return sorted(ss)[len(ss) // 2]

    def per_step(make_chain, *args):
        per_walk = {}
        for cap in (8, 32):
            t_lo = med_time(make_chain(8, cap), *args)
            t_hi = med_time(make_chain(40, cap), *args)
            per_walk[cap] = (t_hi - t_lo) / 32
        return (per_walk[32] - per_walk[8]) / 24

    # per-ray reference at R = 4096
    tile = 4096
    o1, d1, t1 = origins[:tile], dirs[:tile], tmax[:tile]

    def make_ray_chain(n, cap):
        @jax.jit
        def run(pool, o, d, t):
            o3 = tuple(o[:, i] for i in range(3))
            d3 = tuple(d[:, i] for i in range(3))
            rd = trav._safe_rcp3(d3)

            def one_walk(w, acc):
                st = trav._init_state(tile, t + 0.0 * acc, h.stack_slots)
                out = jax.lax.fori_loop(
                    0, cap,
                    lambda i, s: trav._step(
                        pool, h.node_offset, block_base, o3, d3, rd, s
                    ),
                    st,
                )
                return acc + out["best_t"] * 0.0 + out["cur"].astype(
                    jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, n, one_walk,
                                     jnp.zeros((tile,), jnp.float32))
        return run

    ps = per_step(make_ray_chain, pool, o1, d1, t1)
    print(f"per-ray  _step  R={tile}: {ps*1e6:8.2f} us "
          f"({ps*1e9/tile:5.2f} ns/lane)", flush=True)

    for g in (4, 8, 16):
        p = tile // g

        def make_pkt_chain(n, cap, g=g, p=p):
            @jax.jit
            def run(pool, o, d, t):
                o3 = tuple(o[:, i].reshape(p, g) for i in range(3))
                d3 = tuple(d[:, i].reshape(p, g) for i in range(3))
                rd = trav._safe_rcp3(d3)

                def one_walk(w, acc):
                    st = pk._pinit_state(
                        p, g, t.reshape(p, g) + 0.0 * acc[:, None],
                        h.stack_slots,
                    )
                    out = jax.lax.fori_loop(
                        0, cap,
                        lambda i, s: pk._pstep(
                            pool, h.node_offset, block_base, o3, d3, rd, s
                        ),
                        st,
                    )
                    return acc + out["best_t"][:, 0] * 0.0 + out[
                        "cur"].astype(jnp.float32) * 1e-9
                return jax.lax.fori_loop(0, n, one_walk,
                                         jnp.zeros((p,), jnp.float32))
            return run

        psg = per_step(make_pkt_chain, pool, o1, d1, t1)
        print(
            f"packet  _pstep g={g:2d} P={p:4d}: {psg*1e6:8.2f} us "
            f"({psg*1e9/p:5.2f} ns/packet-lane, "
            f"{psg*1e9/tile:5.2f} ns/ray-lane)",
            flush=True,
        )


if __name__ == "__main__":
    main()
