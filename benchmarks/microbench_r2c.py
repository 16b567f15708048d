#!/usr/bin/env python
"""Round-2 microbench, part C: separate per-DISPATCH overhead from true
per-iteration cost by scaling iteration counts.

For each body, run the same jit at n_iter=64 and n_iter=1024; the slope
(t_1024 - t_64)/960 is the true per-iteration cost, the intercept is
dispatch overhead.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

R = 4096


def timed(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def dispatch_floor():
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    return timed(f, x, reps=20)


def make_loop(body_kind, width, r, table, k_unroll, n_iter):
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
            for _ in range(k_unroll):
                if body_kind == "gather":
                    row = rows[idx]
                    acc = acc + row[:, 0]
                    idx = jnp.abs(
                        jax.lax.bitcast_convert_type(
                            row[:, width - 1], jnp.int32
                        ) % table
                    )
                elif body_kind == "elementwise":
                    acc = acc * 1.000001 + 0.5
                    acc = jnp.where(acc > 10.0, acc - 10.0, acc)
                    idx = idx
                elif body_kind == "leafblock":
                    row = rows[idx]
                    kk = width // 12
                    blk = row.reshape(r, kk, 12)
                    t = blk[:, :, 0] * blk[:, :, 3] + blk[:, :, 6]
                    acc = jnp.minimum(acc, t.min(axis=1))
                    idx = jnp.abs(
                        jax.lax.bitcast_convert_type(
                            row[:, width - 1], jnp.int32
                        ) % table
                    )
            return i + 1, idx, acc

        init = (0, idx, jnp.zeros((r,), jnp.float32))
        return jax.lax.while_loop(lambda s: s[0] < n_iter, body, init)[2]

    return lambda: timed(run, rows, idx0)


def slope(body_kind, width=8, r=R, table=65536, k_unroll=1):
    lo, hi = 64, 512
    t_lo = make_loop(body_kind, width, r, table, k_unroll, lo)()
    t_hi = make_loop(body_kind, width, r, table, k_unroll, hi)()
    per_iter = (t_hi - t_lo) / (hi - lo)
    intercept = t_lo - per_iter * lo
    return per_iter, intercept


def main():
    print(f"platform: {jax.devices()[0].platform}")
    print(f"dispatch floor (tiny jit): {dispatch_floor()*1e3:.2f} ms")

    for kind, width, k in [
        ("elementwise", 8, 1),
        ("gather", 8, 1),
        ("gather", 16, 1),
        ("gather", 48, 1),
        ("gather", 8, 4),
        ("gather", 8, 8),
        ("leafblock", 96, 1),
        ("leafblock", 192, 1),
        ("leafblock", 384, 1),
    ]:
        per_iter, icept = slope(kind, width=width, k_unroll=k)
        print(
            f"{kind:12s} width={width:4d} unroll={k}: "
            f"{per_iter*1e6/k:7.2f} us/step  (intercept {icept*1e3:5.1f} ms)"
        )

    for r in (4096, 16384, 65536):
        per_iter, icept = slope("gather", width=8, r=r)
        print(
            f"gather width=8 R={r:6d}: {per_iter*1e6:7.2f} us/iter "
            f"({per_iter/r*1e9:5.2f} ns/row, intercept {icept*1e3:5.1f} ms)"
        )
    for r in (4096, 16384, 65536):
        per_iter, icept = slope("leafblock", width=192, r=r)
        print(
            f"leafblock width=192 R={r:6d}: {per_iter*1e6:7.2f} us/iter "
            f"({per_iter/r*1e9:5.2f} ns/row, intercept {icept*1e3:5.1f} ms)"
        )


if __name__ == "__main__":
    main()
