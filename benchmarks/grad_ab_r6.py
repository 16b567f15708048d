#!/usr/bin/env python
"""A/B the backward-pass structure on TPU (dispatch-free slope method).

Variants of the bounce-loop gradient path, measured against ONE canonical
forward baseline (default scan config):
  base    — lax.scan over bounces (shipping config)
  split   — lax.scan with _split_transpose=True (XLA schedules the
            backward as independent per-iteration transposes)
  unroll  — Python-unrolled bounce loop (no scan carry round-trip; XLA
            may fuse each bounce's rematted recompute with its transpose)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/grad_ab_r6.py

RESULT (TPU v5 lite, 2026-08-20, r5 full sweep; cornell 256^2 d4 4spp,
canonical matched forward 10.0 ms/chunk):

  base    (lax.scan)            27.3 ms  ratio 2.75   76.7 M fwd+bwd r/s
  split   (_split_transpose)    26.3 ms  ratio 2.65   79.7
  unroll  (python, group 1)     24.3 ms  ratio 2.44   86.3
  unrol2  (group 2)             25.1 ms  ratio 2.52   83.7
  unrol4  (group 4)             27.0 ms  ratio 2.71   77.7
  u4+nee  (group 4, +nee save)  25.4 ms  ratio 2.55   82.5
  u1+nee  (group 1, +nee save)  24.2 ms  ratio 2.43   86.7  <- SHIPPED

Reading: the r3/r4 hypothesis blamed residual BYTES (bf16 packing /
custom_vjp); the sweep shows the binding term was the lax.scan carry
round-trip through HBM — unrolling with the SAME residual dtypes takes
2.75 -> 2.43, while widening the save set (same loop) moves ~nothing.
Byte-packing attacks are therefore secondary at this depth; recorded
here so the question is closed with a measurement (VERDICT r4 #2).
Defaults updated: GRAD_UNROLL=True, GRAD_UNROLL_GROUP=1,
REMAT_SAVE_NAMES=("hit", "nee").

Chunk-size sweep (same session, ratio vs matched-spp forward):
spp 4 -> 2.49, spp 8 -> 2.55, spp 16 -> 2.50 — flat, so the bench's
4 spp grain stands; the shipped ratio sits at 2.43-2.58 across tunnel
sessions (the r4 target was <= 2.5).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.diff.gradients import (
        render_loss, render_loss_and_grads_scan,
    )
    import tinsel_tpu.render.integrator as integ

    width = height = 256
    scene = cornell_scene(width=width, height=height, max_depth=4)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    key = jax.random.key(0)
    target = jnp.zeros((height, width, 3), jnp.float32)
    opts = dict(width=width, height=height, max_depth=4, samples_per_pass=4)

    def timed(fn, *args, reps=3):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ss = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            ss.append(time.perf_counter() - t0)
        return sorted(ss)[len(ss) // 2]

    def grad_n(n):
        def run(f, c, k):
            loss, grads = render_loss_and_grads_scan(
                f, c, k, target, n, **opts
            )
            gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(grads))
            return jnp.stack([loss, gsum])
        return jax.jit(run)

    def fwd_n(n):
        @jax.jit
        def run(f, c, k):
            def body(i, acc):
                return acc + render_loss(
                    f, c, jax.random.fold_in(k, i), target, **opts
                )
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    # canonical forward baseline, default knobs
    integ.SCAN_SPLIT_TRANSPOSE = False
    integ.GRAD_UNROLL = False
    tf = (timed(fwd_n(4), flat, cam, key) - timed(fwd_n(1), flat, cam, key)) / 3
    print(f"fwd {tf*1e3:.1f} ms/chunk (canonical)", flush=True)

    rays = width * height * 4 * 2 * 4
    variants = [
        ("base", dict(SCAN_SPLIT_TRANSPOSE=False, GRAD_UNROLL=False)),
        ("split", dict(SCAN_SPLIT_TRANSPOSE=True, GRAD_UNROLL=False)),
        ("unroll", dict(SCAN_SPLIT_TRANSPOSE=False, GRAD_UNROLL=True)),
        ("unrol2", dict(GRAD_UNROLL=True, GRAD_UNROLL_GROUP=2)),
        ("unrol4", dict(GRAD_UNROLL=True, GRAD_UNROLL_GROUP=4)),
        ("u4+nee", dict(GRAD_UNROLL=True, GRAD_UNROLL_GROUP=4,
                        REMAT_SAVE_NAMES=("hit", "nee"))),
        ("u1+nee", dict(GRAD_UNROLL=True, GRAD_UNROLL_GROUP=1,
                        REMAT_SAVE_NAMES=("hit", "nee"))),
    ]
    defaults = dict(
        SCAN_SPLIT_TRANSPOSE=False, GRAD_UNROLL=False, GRAD_UNROLL_GROUP=1,
        REMAT_SAVE_NAMES=("hit",),
    )
    if len(sys.argv) > 1:  # run a named subset
        variants = [v for v in variants if v[0] in sys.argv[1:]]
    for name, knobs in variants:
        for k_, v_ in {**defaults, **knobs}.items():
            setattr(integ, k_, v_)
        try:
            tg = (
                timed(grad_n(4), flat, cam, key)
                - timed(grad_n(1), flat, cam, key)
            ) / 3
            print(
                f"{name:8s} grad {tg*1e3:6.1f} ms/chunk  ratio {tg/tf:5.2f}"
                f"  ({rays/tg/1e6:6.1f} M fwd+bwd rays/s)",
                flush=True,
            )
        except Exception as e:  # report and keep sweeping
            print(f"{name:8s} FAILED: {type(e).__name__}: {e}", flush=True)
    for k_, v_ in defaults.items():
        setattr(integ, k_, v_)


if __name__ == "__main__":
    main()
