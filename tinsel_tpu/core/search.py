"""Vectorized fixed-trip-count binary search (lockstep lower_bound).

Replaces the reference's scalar LowerBound (probe.h:186-203) for CDF
inversion: every lane bisects its own [lo, lo+n) window of a flat array with
one gathered element per step — log2(n) steps, fully branchless.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def lower_bound(flat, lo0, n: int, value):
    """First index i in [lo0, lo0+n) with flat[i] >= value (per lane).

    flat: (L,) array; lo0: int array (per-lane window start); n: static
    window length; value: per-lane search value. Returns int32 indices
    (== lo0 + n when every element < value).
    """
    lo = jnp.asarray(lo0, jnp.int32) + jnp.zeros_like(jnp.asarray(value), jnp.int32)
    hi = lo + jnp.int32(n)
    steps = int(np.ceil(np.log2(max(n, 2)))) + 1
    for _ in range(steps):
        active = lo < hi
        mid = lo + (hi - lo) // 2
        v = flat[jnp.clip(mid, 0, flat.shape[0] - 1)]
        go_right = v < value
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    return lo
