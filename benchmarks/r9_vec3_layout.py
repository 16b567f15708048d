#!/usr/bin/env python
"""Is (R, 3) vector math paying a lane-padding tax on TPU?

The integrator/bsdf/lights keep 3-vectors as (R, 3) arrays; dots are
sums over the minor axis of size 3. If XLA lays the minor axis across
the 128-wide lane dimension, every such reduce/broadcast wastes 125/128
lanes; the traversal already uses component-SoA tuples (accel/traverse
_split3) for this reason. This measures, by in-jit iteration slope:

  a. (R,3) dot chain:      s += sum(a*b, -1) with rotating scalars
  b. SoA dot chain:        s += ax*bx+ay*by+az*bz on (R,) components
  c. (R,3) axpy chain:     v = v*c + w (pure elementwise, no reduce)
  d. SoA axpy chain:       same on component tuples
  e. (R,3) normalize chain: v / |v| (reduce + broadcast back)
  f. SoA normalize chain

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/r9_vec3_layout.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

R = 1 << 20


def timed(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    ss = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
        ss.append(time.perf_counter() - t0)
    return sorted(ss)[1]


def slope(make, lo=32, hi=160):
    f_lo, f_hi = make(lo), make(hi)
    return (timed(f_hi) - timed(f_lo)) / (hi - lo)


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    key = jax.random.key(0)
    a3 = jax.random.normal(key, (R, 3), jnp.float32)
    b3 = jax.random.normal(jax.random.fold_in(key, 1), (R, 3), jnp.float32)
    ax, ay, az = (a3[:, i] for i in range(3))
    bx, by, bz = (b3[:, i] for i in range(3))

    def dot_aos(n):
        @jax.jit
        def f():
            s = jnp.zeros((R,), jnp.float32)
            v = a3
            for i in range(n):
                s = s + jnp.sum(v * b3, axis=-1)
                v = v * (1.0 + 1e-6 * (i + 1)) + 1e-7
            return s
        return f

    def dot_soa(n):
        @jax.jit
        def f():
            s = jnp.zeros((R,), jnp.float32)
            vx, vy, vz = ax, ay, az
            for i in range(n):
                s = s + vx * bx + vy * by + vz * bz
                c = 1.0 + 1e-6 * (i + 1)
                vx, vy, vz = vx * c + 1e-7, vy * c + 1e-7, vz * c + 1e-7
            return s
        return f

    def axpy_aos(n):
        @jax.jit
        def f():
            v = a3
            for i in range(n):
                v = v * (1.0 + 1e-6 * (i + 1)) + b3
            return v
        return f

    def axpy_soa(n):
        @jax.jit
        def f():
            vx, vy, vz = ax, ay, az
            for i in range(n):
                c = 1.0 + 1e-6 * (i + 1)
                vx, vy, vz = vx * c + bx, vy * c + by, vz * c + bz
            return vx, vy, vz
        return f

    def norm_aos(n):
        @jax.jit
        def f():
            v = a3
            for i in range(n):
                v = v / jnp.sqrt(
                    jnp.maximum(jnp.sum(v * v, axis=-1), 1e-20)
                )[..., None] + 1e-6 * (i + 1)
            return v
        return f

    def norm_soa(n):
        @jax.jit
        def f():
            vx, vy, vz = ax, ay, az
            for i in range(n):
                inv = jax.lax.rsqrt(
                    jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-20)
                )
                e = 1e-6 * (i + 1)
                vx, vy, vz = vx * inv + e, vy * inv + e, vz * inv + e
            return vx, vy, vz
        return f

    for name, make in [
        ("dot  (R,3)", dot_aos), ("dot  SoA  ", dot_soa),
        ("axpy (R,3)", axpy_aos), ("axpy SoA  ", axpy_soa),
        ("norm (R,3)", norm_aos), ("norm SoA  ", norm_soa),
    ]:
        ns = slope(make) / R * 1e9
        print(f"{name}: {ns:7.3f} ns/lane/iter", flush=True)


if __name__ == "__main__":
    main()
