#!/usr/bin/env python
"""Round-2 microbenchmarks: quantify the cost structure that bounds BVH
traversal on this TPU runtime, and measure HBM bandwidth for the
speed-of-light model.

Questions:
  A. per-iteration fixed cost of a while/fori loop (elementwise-only body)
  B. gather cost vs row width (8..48 f32) at fixed R and table size
  C. effective HBM bandwidth (large saxpy, read+write)
  D. cost of 1-gather and 2-gather loop bodies (the traversal shape)
  E. one-hot matmul lookup vs gather for small node tables
  F. gather cost vs R (tile size scaling)

All timings end with a real host transfer (np.asarray) — block_until_ready
returns early on this runtime.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


R = 4096          # rays per tile (current traversal tile)
N_ITER = 256      # loop iterations per measurement
TABLE = 65536     # node-table rows (~bigmesh node count)


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile+sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def loop_elementwise(r=R):
    """A: while loop with pure-VPU body, no gathers."""
    x0 = jnp.arange(r, dtype=jnp.float32)

    @jax.jit
    def run(x):
        def body(s):
            i, x = s
            x = x * 1.000001 + 0.5
            x = jnp.where(x > 10.0, x - 10.0, x)
            return i + 1, x

        return jax.lax.while_loop(lambda s: s[0] < N_ITER, body, (0, x))[1]

    return timed(run, x0) / N_ITER


def loop_gather(width, r=R, table=TABLE, n_gathers=1):
    """B/D: while loop whose body does n dependent row gathers of `width`."""
    rows = jnp.asarray(
        np.random.default_rng(0).random((table, width), np.float32)
    )
    idx0 = jnp.asarray(
        np.random.default_rng(1).integers(0, table, r).astype(np.int32)
    )

    @jax.jit
    def run(rows, idx):
        def body(s):
            i, idx, acc = s
            for _ in range(n_gathers):
                row = rows[idx]  # (r, width)
                acc = acc + row[:, 0]
                # next index depends on gathered data (serial dependence,
                # like a BVH cursor)
                idx = (
                    jax.lax.bitcast_convert_type(row[:, width - 1], jnp.int32)
                    % table
                )
                idx = jnp.abs(idx)
            return i + 1, idx, acc

        init = (0, idx, jnp.zeros((r,), jnp.float32))
        return jax.lax.while_loop(lambda s: s[0] < N_ITER, body, init)[2]

    return timed(run, rows, idx0) / N_ITER


def hbm_bandwidth():
    """C: effective HBM BW from a big saxpy (2 reads + 1 write)."""
    n = 64 * 1024 * 1024  # 256 MB per array
    a = jnp.ones((n,), jnp.float32)
    b = jnp.ones((n,), jnp.float32)

    @jax.jit
    def saxpy(a, b):
        return a * 1.5 + b

    dt = timed(saxpy, a, b, reps=5)
    return 3 * n * 4 / dt / 1e9  # GB/s


def onehot_lookup(table, r=R, width=8):
    """E: rows via one-hot matmul instead of gather, in a loop."""
    rows = jnp.asarray(
        np.random.default_rng(0).random((table, width), np.float32)
    )
    idx0 = jnp.asarray(
        np.random.default_rng(1).integers(0, table, r).astype(np.int32)
    )

    @jax.jit
    def run(rows, idx):
        def body(s):
            i, idx, acc = s
            oh = (idx[:, None] == jnp.arange(table, dtype=jnp.int32)[None, :])
            row = jnp.dot(
                oh.astype(jnp.float32), rows,
                preferred_element_type=jnp.float32,
            )
            acc = acc + row[:, 0]
            idx = jnp.abs(
                jax.lax.bitcast_convert_type(row[:, width - 1], jnp.int32)
                % table
            )
            return i + 1, idx, acc

        init = (0, idx, jnp.zeros((r,), jnp.float32))
        return jax.lax.while_loop(lambda s: s[0] < N_ITER, body, init)[2]

    return timed(run, rows, idx0) / N_ITER


def main():
    print(f"platform: {jax.devices()[0].platform}")
    bw = hbm_bandwidth()
    print(f"C. HBM bandwidth (saxpy r+r+w): {bw:.1f} GB/s")

    t = loop_elementwise()
    print(f"A. loop iter, elementwise body, R={R}: {t * 1e6:.1f} us/iter")

    for width in (8, 12, 16, 24, 32, 48):
        t = loop_gather(width)
        print(
            f"B. loop iter, 1 gather width={width:2d}, R={R}, "
            f"table={TABLE}: {t * 1e6:.1f} us/iter"
        )

    t = loop_gather(8, n_gathers=2)
    print(f"D. loop iter, 2 gathers width=8: {t * 1e6:.1f} us/iter")
    t = loop_gather(16, n_gathers=2)
    print(f"D. loop iter, 2 gathers width=16: {t * 1e6:.1f} us/iter")

    for r in (1024, 4096, 16384, 65536):
        t = loop_gather(8, r=r)
        print(f"F. loop iter, 1 gather width=8, R={r}: {t * 1e6:.1f} us/iter")

    for table in (512, 4096):
        t = onehot_lookup(table)
        print(
            f"E. loop iter, one-hot matmul lookup table={table}, R={R}: "
            f"{t * 1e6:.1f} us/iter"
        )
        t = loop_gather(8, table=table)
        print(
            f"E. loop iter, gather          table={table}, R={R}: "
            f"{t * 1e6:.1f} us/iter"
        )


if __name__ == "__main__":
    main()
