#!/usr/bin/env python
"""VPU elementwise ceiling + HBM stream bandwidth, dispatch-proof.

Everything is a slope over an IN-DEVICE fori_loop trip count (the bench.py
methodology — single-dispatch timings here measure the tunnel, and
Python-unrolled chains get algebra-folded by XLA). The loop body is one
fused elementwise step over a live array:

  fma    x <- x*a + b         on 4 MB   (VMEM-resident: raw ALU rate)
  rsqrt  x <- rsqrt(x + a)    on 4 MB
  exp    x <- exp(x*1e-3)+b   on 4 MB
  stream x <- x*a + b         on 512 MB (forced HBM read+write per iter)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/r9_vpu_ceiling.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out.ravel()[:1])
    ss = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        ss.append(time.perf_counter() - t0)
    return sorted(ss)[1]


def loop_slope(body, n_elems, lo, hi):
    key = jax.random.key(0)
    a = jax.random.uniform(key, (n_elems,), jnp.float32, 0.5, 1.5)
    b = jax.random.uniform(
        jax.random.fold_in(key, 1), (n_elems,), jnp.float32, 0.0, 1e-6
    )
    x0 = jax.random.uniform(jax.random.fold_in(key, 2), (n_elems,), jnp.float32)

    def make(n):
        @jax.jit
        def f(x, a, b):
            return jax.lax.fori_loop(
                0, n, lambda i, x: body(x, a, b), x
            )
        return f

    return (timed(make(hi), x0, a, b) - timed(make(lo), x0, a, b)) / (hi - lo)


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    small = 1 << 20  # 4 MB
    for name, body in [
        ("fma   ", lambda x, a, b: x * a + b),
        ("rsqrt ", lambda x, a, b: jax.lax.rsqrt(x + a)),
        ("exp   ", lambda x, a, b: jnp.exp(x * 1e-3) - 1.0 + b),
        ("select", lambda x, a, b: jnp.where(x > a, x * 0.999 + b, x)),
    ]:
        t = loop_slope(body, small, 64, 512)
        print(
            f"{name}: {t / small * 1e9:8.5f} ns/lane/step "
            f"({small / t / 1e9:6.1f} G elem/s)",
            flush=True,
        )

    big = 128 << 20  # 512 MB
    t = loop_slope(lambda x, a, b: x * a + b, big, 2, 8)
    print(
        f"stream: {16 * big / t / 1e9:7.1f} GB/s "
        f"(512 MB fma, 16 B/elem: x,a,b reads + x write)",
        flush=True,
    )


if __name__ == "__main__":
    main()
