#!/usr/bin/env python
"""Round-3 microbench: per-iteration cost of a while loop whose body does
(a) ONE dependent row gather,
(b) TWO CHAINED dependent row gathers (gather2's index depends on gather1
    -- the current traversal _step: node row -> child test -> block row),
(c) TWO INDEPENDENT row gathers (both indices come from the carry -- the
    deferred-block-test design: the step-k block gather depends only on
    step k-1 state, so it can overlap the step-k node gather).

If the ~30-40 us/iter floor is serial gather LATENCY, (c) should cost
about one floor while (b) costs two. Measured by slope between two
iteration counts (per CLAUDE.md rule 7).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

LANES = 4096
N_ROWS = 40_000
COLS_A = 17
COLS_B = 144


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def per_iter(make_body, tab_a, tab_b, idx0):
    def run(iters, ta, tb, i0):
        body = make_body(ta, tb)

        def cond(s):
            return s[0] < iters

        return jax.lax.while_loop(cond, body, (jnp.int32(0), i0, i0,
                                               jnp.zeros((LANES,), jnp.float32)))

    jrun = jax.jit(run, static_argnums=0)
    lo, hi = 64, 512
    t_lo = timed(jrun, lo, tab_a, tab_b, idx0)
    t_hi = timed(jrun, hi, tab_a, tab_b, idx0)
    return (t_hi - t_lo) / (hi - lo)


def main():
    key = jax.random.key(0)
    tab_a = jax.random.normal(key, (N_ROWS, COLS_A), jnp.float32)
    tab_b = jax.random.normal(jax.random.fold_in(key, 1),
                              (N_ROWS, COLS_B), jnp.float32)
    idx0 = jax.random.randint(jax.random.fold_in(key, 2), (LANES,), 0, N_ROWS)

    def consume(row):
        return row.sum(axis=-1)

    def next_idx(v):
        # cheap data-dependent new index (elementwise, keeps the chain honest)
        return jnp.abs(v.astype(jnp.int32)) % N_ROWS

    def body_one(ta, tb):
        def body(s):
            it, ia, ib, acc = s
            ra = ta[ia]
            va = consume(ra)
            return it + 1, next_idx(va), ib, acc + va
        return body

    def body_chained(ta, tb):
        def body(s):
            it, ia, ib, acc = s
            ra = ta[ia]
            va = consume(ra)
            ib2 = next_idx(va)          # gather2 depends on gather1
            rb = tb[ib2]
            vb = consume(rb)
            return it + 1, next_idx(va + vb), ib2, acc + va + vb
        return body

    def body_indep(ta, tb):
        def body(s):
            it, ia, ib, acc = s
            ra = ta[ia]                  # both gathers indexed from carry
            rb = tb[ib]
            va = consume(ra)
            vb = consume(rb)
            return it + 1, next_idx(va), next_idx(vb), acc + va + vb
        return body

    for name, mk in [("one 17-col gather      ", body_one),
                     ("two CHAINED (17+144)   ", body_chained),
                     ("two INDEPENDENT (17+144)", body_indep)]:
        p = per_iter(mk, tab_a, tab_b, idx0)
        print(f"{name}: {p*1e6:7.1f} us/iter @ {LANES} lanes")


if __name__ == "__main__":
    main()
