"""Profiling and timing instrumentation.

TPU-native replacement for the reference's wall-clock printf timers
(platform.cpp:7-62 GetSeconds, main.cpp:306 per-frame printf): a timer
context that forces a REAL device sync (on tunneled runtimes
`block_until_ready` can return before execution finishes — only a host
transfer is trustworthy), plus a `jax.profiler` trace wrapper for XLA-level
kernel timelines viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


def sync(x):
    """Force completion of device work feeding x (host transfer of one
    element — block_until_ready alone is not reliable on axon tunnels)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf))
    return x


@contextlib.contextmanager
def timer(name: str = "", rays: int | None = None, result=None):
    """Time a block with a true device sync at exit; optionally report a
    rays/s rate. Usage:

        with timer("render", rays=w*h*spp*depth) as t:
            out = fn(...)
            t.watch(out)
    """

    class _T:
        out = result
        elapsed = 0.0

        def watch(self, x):
            self.out = x
            return x

    t = _T()
    t0 = time.perf_counter()
    try:
        yield t
    finally:
        if t.out is not None:
            sync(t.out)
        t.elapsed = time.perf_counter() - t0
        msg = f"[{name}] {t.elapsed * 1e3:.2f} ms"
        if rays:
            msg += f"  ({rays / max(t.elapsed, 1e-12) / 1e6:.2f} Mrays/s)"
        print(msg, flush=True)


@contextlib.contextmanager
def xla_trace(logdir: str = "/tmp/tinsel_trace"):
    """Capture a jax.profiler trace (kernel-level timeline) for the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {logdir}", flush=True)
