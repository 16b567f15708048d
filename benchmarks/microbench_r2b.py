#!/usr/bin/env python
"""Round-2 microbench, part B: wide-row gathers (leaf-block shapes),
unrolled dependent-gather bodies, and honest HBM bandwidth.

Sync: transfer ONE element of the result (forces device completion without
shipping the buffer over the tunnel).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


R = 4096
N_ITER = 256


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def hbm_bandwidth():
    """Large saxpy; sync via 1-element transfer. y is a real output, so
    bytes = 2 reads + 1 write."""
    n = 64 * 1024 * 1024
    a = jnp.ones((n,), jnp.float32)
    b = jnp.ones((n,), jnp.float32)

    @jax.jit
    def saxpy(a, b):
        return a * 1.5 + b

    dt = timed(saxpy, a, b, reps=5)
    return 3 * n * 4 / dt / 1e9


def wide_gather(width, r=R, table=32768, n_iter=64):
    """Row gather at leaf-block widths, dependent chain."""
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
            row = rows[idx]
            acc = acc + row[:, 0] + row[:, width // 2]
            idx = jnp.abs(
                jax.lax.bitcast_convert_type(row[:, width - 1], jnp.int32)
                % table
            )
            return i + 1, idx, acc

        init = (0, idx, jnp.zeros((r,), jnp.float32))
        return jax.lax.while_loop(lambda s: s[0] < n_iter, body, init)[2]

    return timed(run, rows, idx0) / n_iter


def unrolled_gathers(k, r=R, table=65536, width=8, n_groups=64):
    """k dependent gathers per while-loop iteration (the unrolled traversal
    body shape). Reports time per GATHER-STEP (total / (n_groups*k))."""
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
            for _ in range(k):
                row = rows[idx]
                acc = acc + row[:, 0]
                idx = jnp.abs(
                    jax.lax.bitcast_convert_type(row[:, width - 1], jnp.int32)
                    % table
                )
            return i + 1, idx, acc

        init = (0, idx, jnp.zeros((r,), jnp.float32))
        return jax.lax.while_loop(lambda s: s[0] < n_groups, body, init)[2]

    return timed(run, rows, idx0) / (n_groups * k)


def leaf_block_body(width, r=R, table=8192, n_iter=64):
    """Realistic leaf-block step: wide gather + reshape to (r, K, 9-ish) and
    a min-reduce over K (the all-tris-at-once leaf test shape)."""
    k = width // 12
    rows = jnp.asarray(
        np.random.default_rng(0).random((table, width), np.float32)
    )
    idx0 = jnp.asarray(
        np.random.default_rng(1).integers(0, table, r).astype(np.int32)
    )

    @jax.jit
    def run(rows, idx):
        def body(s):
            i, idx, best = s
            row = rows[idx]  # (r, width)
            blk = row.reshape(r, k, 12)
            t = blk[:, :, 0] * blk[:, :, 3] + blk[:, :, 6]  # fake tri test
            tmin = t.min(axis=1)
            best = jnp.minimum(best, tmin)
            idx = jnp.abs(
                jax.lax.bitcast_convert_type(row[:, width - 1], jnp.int32)
                % table
            )
            return i + 1, idx, best

        init = (0, idx, jnp.full((r,), 1e30, jnp.float32))
        return jax.lax.while_loop(lambda s: s[0] < n_iter, body, init)[2]

    return timed(run, rows, idx0) / n_iter


def main():
    print(f"platform: {jax.devices()[0].platform}")
    print(f"HBM BW (saxpy, 1-elem sync): {hbm_bandwidth():.0f} GB/s")

    for width in (64, 128, 192, 256, 384, 576):
        t = wide_gather(width)
        ns_row = t / R * 1e9
        print(
            f"wide gather width={width:4d} ({width*4:5d} B/row): "
            f"{t*1e6:7.1f} us/iter  ({ns_row:5.1f} ns/row)"
        )

    for k in (1, 2, 4, 8, 16):
        t = unrolled_gathers(k)
        print(f"unroll k={k:2d}: {t*1e6:6.1f} us per gather-step")

    for width in (96, 192, 384):
        t = leaf_block_body(width)
        print(
            f"leaf-block step width={width} (K={width//12} tris): "
            f"{t*1e6:7.1f} us/iter"
        )

    # tile-size scaling for the unrolled shape
    for r in (4096, 8192, 16384, 32768, 65536):
        t = unrolled_gathers(4, r=r)
        print(f"unroll k=4, R={r:6d}: {t*1e6:6.1f} us per gather-step")


if __name__ == "__main__":
    main()
