#!/usr/bin/env python
"""fwd+bwd / fwd slope ratio on the cornell flagship (dispatch-free).

The canonical measurement for the backward-cost work: gradients are
reduced into a live output (XLA DCEs an unused backward — measured as a
fake "0.92x backward"), and both sides are slopes between two in-jit
iteration counts so the 14-31 ms session-variable tunnel dispatch
cancels. r3 history: 5.4x (honest baseline) -> 3.1-3.3x after dropping
the dead-bounce cond from the gradient path.

Usage: PYTHONPATH=... python benchmarks/grad_ratio.py  (TPU)
"""

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

    tg = (timed(grad_n(4), flat, cam, key) - timed(grad_n(1), flat, cam, key)) / 3
    tf = (timed(fwd_n(4), flat, cam, key) - timed(fwd_n(1), flat, cam, key)) / 3
    rays = width * height * 4 * 2 * 4
    print(
        f"grad {tg*1e3:.1f} ms/chunk, fwd {tf*1e3:.1f} -> ratio {tg/tf:.2f}"
        f" ({rays/tg/1e6:.1f} M fwd+bwd rays/s)"
    )


if __name__ == "__main__":
    main()
