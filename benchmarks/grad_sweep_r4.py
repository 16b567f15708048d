#!/usr/bin/env python
"""Round-4 gradient-step sweep: remat save-set x spp-per-dispatch.

The fwd+bwd flagship (cornell 256^2 d4, material+camera grads) sits at
~31-33 M rays/s vs a >=50M target. The backward is elementwise-recompute
bound under the ("hit",)-only remat policy; this sweeps wider save sets
(one-hot matrix, selected materials, NEE radiance — tagged in
render/integrator.py) against spp batching to find the traffic/recompute
knee on the real chip.

Usage: python benchmarks/grad_sweep_r4.py  (TPU; ~10 compiles)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import tinsel_tpu.render.integrator as integ
    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.diff.gradients import render_loss_and_grads

    width = height = 256
    max_depth = 4
    scene = cornell_scene(width=width, height=height, max_depth=max_depth)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    n_lights = len(flat.light_indices)
    rays_per_spp = width * height * max_depth * (1 + n_lights)
    target = jnp.zeros((height, width, 3), jnp.float32)
    key = jax.random.key(0)

    save_sets = [
        ("hit",),
        ("hit", "oh"),
        ("hit", "mat"),
        ("hit", "oh", "mat"),
        ("hit", "oh", "mat", "nee"),
    ]
    for names in save_sets:
        integ.REMAT_SAVE_NAMES = names
        for spp in (4, 16):
            opts = dict(
                width=width, height=height, max_depth=max_depth,
                samples_per_pass=spp,
            )
            grad_fn = jax.jit(
                lambda f, c, k, s, opts=opts: render_loss_and_grads(
                    f, c, jax.random.fold_in(k, s), target, **opts
                )
            )
            loss, _ = grad_fn(flat, cam, key, 0)
            np.asarray(loss)  # real sync (block_until_ready lies here)
            n = max(1, 32 // spp)
            t0 = time.perf_counter()
            for s in range(n):
                loss, grads = grad_fn(flat, cam, key, s)
            np.asarray(loss)
            dt = (time.perf_counter() - t0) / n
            rate = rays_per_spp * spp / dt
            print(
                f"save={'+'.join(names):18s} spp/dispatch {spp:2d}: "
                f"{dt*1e3:7.1f} ms  {rate/1e6:6.1f} M rays/s",
                flush=True,
            )
    integ.REMAT_SAVE_NAMES = ("hit",)

    # single-dispatch gradient accumulation: scan n chunks of 4 spp inside
    # one jit (diff/gradients.py render_loss_and_grads_scan) — removes the
    # ~3-10 ms/dispatch tunnel overhead between chunks
    from tinsel_tpu.diff.gradients import render_loss_and_grads_scan

    for n_chunks in (4, 8):
        opts = dict(
            width=width, height=height, max_depth=max_depth,
            samples_per_pass=4,
        )
        fn = jax.jit(
            lambda f, c, k, opts=opts, n=n_chunks:
            render_loss_and_grads_scan(f, c, k, target, n, **opts)
        )
        loss, _ = fn(flat, cam, key)
        np.asarray(loss)
        t0 = time.perf_counter()
        loss, grads = fn(flat, cam, key)
        np.asarray(loss)
        dt = time.perf_counter() - t0
        rate = rays_per_spp * 4 * n_chunks / dt
        print(
            f"scan-accum n={n_chunks} x 4spp: {dt*1e3:7.1f} ms  "
            f"{rate/1e6:6.1f} M rays/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
