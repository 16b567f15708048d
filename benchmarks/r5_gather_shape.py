#!/usr/bin/env python
"""What does an in-loop dependent row gather REALLY cost on this TPU?

The r2 cost model (30-40us floor + 0.3-0.7 ns/lane/consumed-col) does not
fit the r3 decomp (8 ns/lane/iter, linear in lanes, 160 consumed cols).
This sweeps the primitives in isolation inside a fori_loop with a
dependent index chain:

  * gathers per step (1 vs 2 independent)
  * stored row width vs consumed column count
  * lanes

to decide between a unified-table single-gather step (win if cost is
per-ROW) and column reduction (win if cost is per consumed column).

Usage: PYTHONPATH=... python benchmarks/r5_gather_shape.py  (TPU)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed_periter(fn, k_lo=256, k_hi=4096, reps=5):
    """Per-iteration slope with median-of-reps at each k — the tunnel
    dispatch jitter (~ms) must not leak into a ~10us/iter estimate."""
    jfn = jax.jit(fn, static_argnums=0)
    ts = {}
    for k in (k_lo, k_hi):
        np.asarray(jfn(k).ravel()[:1])
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jfn(k)
            np.asarray(out.ravel()[:1])
            samples.append(time.perf_counter() - t0)
        ts[k] = sorted(samples)[len(samples) // 2]
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    n_rows = 1 << 15  # 32k rows, comparable to the 524k-tri node table

    for lanes in (4096,):
        idx0 = jnp.asarray(
            np.random.default_rng(0).integers(0, n_rows, lanes), jnp.int32
        )

        for width, consume in (
            (24, 16), (32, 16), (32, 32), (64, 16), (64, 32), (64, 64),
            (128, 16), (128, 128), (192, 16), (192, 144), (192, 192),
            (256, 16), (256, 144), (256, 192), (256, 256),
        ):
            tbl = jnp.asarray(
                np.random.default_rng(1).random((n_rows, width), np.float32)
            )

            def one_gather(k, tbl=tbl, consume=consume):
                def body(i, c):
                    idx, acc = c
                    row = tbl[idx]
                    s = row[:, :consume].sum(axis=1)
                    nidx = (
                        idx + jax.lax.bitcast_convert_type(s, jnp.int32)
                    ) & (n_rows - 1)
                    return nidx, acc + s

                _, acc = jax.lax.fori_loop(0, k, body, (idx0, jnp.zeros(lanes)))
                return acc

            per = timed_periter(one_gather)
            print(
                f"lanes {lanes:6d} 1x gather w{width:3d} c{consume:3d}: "
                f"{per*1e6:8.2f} us/iter ({per/lanes*1e9:6.3f} ns/lane)",
                flush=True,
            )

        # two INDEPENDENT gathers per step (the shipped _step shape):
        # both index only the carry
        for width2 in (24, 192, 256):
            tbl1 = jnp.asarray(
                np.random.default_rng(2).random((n_rows, 24), np.float32)
            )
            tbl2 = jnp.asarray(
                np.random.default_rng(3).random((n_rows, width2), np.float32)
            )

            def two_gathers(k, tbl1=tbl1, tbl2=tbl2):
                def body(i, c):
                    idx, jdx, acc = c
                    row1 = tbl1[idx]
                    row2 = tbl2[jdx]
                    s1 = row1[:, :16].sum(axis=1)
                    s2 = row2[:, :16].sum(axis=1)
                    ni = (idx + jax.lax.bitcast_convert_type(s1, jnp.int32)) & (
                        n_rows - 1
                    )
                    nj = (jdx + jax.lax.bitcast_convert_type(s2, jnp.int32)) & (
                        n_rows - 1
                    )
                    return ni, nj, acc + s1 + s2

                _, _, acc = jax.lax.fori_loop(
                    0, k, body, (idx0, idx0 + 1, jnp.zeros(lanes))
                )
                return acc

            per = timed_periter(two_gathers)
            print(
                f"lanes {lanes:6d} 2x gather w24+w{width2:3d} c16+16: "
                f"{per*1e6:8.2f} us/iter ({per/lanes*1e9:6.3f} ns/lane)",
                flush=True,
            )


if __name__ == "__main__":
    main()
