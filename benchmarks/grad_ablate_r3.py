#!/usr/bin/env python
"""Round-3 gradient-cost ablation on the cornell 256^2 d4 training step.

Times, at matched 4-spp dispatch with a real 1-element host sync:
  fwd            render_loss only
  grad m+c       value_and_grad wrt (materials, camera)   [the bench metric]
  grad m         materials only
  grad c         camera only
  grad m+c noNEE same but with light sampling disabled (isolate NEE VJP)

Interpretation: if (grad m) ~ (grad m+c), the camera chain is cheap; if
noNEE collapses the gap, the NEE shading VJP dominates; etc.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def main():
    import dataclasses

    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.diff.gradients import render_loss

    width = height = 256
    max_depth = 4
    scene = cornell_scene(width=width, height=height, max_depth=max_depth)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    key = jax.random.key(0)
    target = jnp.zeros((height, width, 3), jnp.float32)
    opts = dict(width=width, height=height, max_depth=max_depth,
                samples_per_pass=4)

    def loss_mc(materials, camera):
        s = dataclasses.replace(flat, materials=materials)
        return render_loss(s, camera, key, target, **opts)

    fwd = jax.jit(lambda m, c: loss_mc(m, c))
    g_mc = jax.jit(jax.value_and_grad(loss_mc, argnums=(0, 1)))
    g_m = jax.jit(jax.value_and_grad(loss_mc, argnums=0))
    g_c = jax.jit(jax.value_and_grad(loss_mc, argnums=1))

    t_f = timed(fwd, flat.materials, cam)
    print(f"fwd 4spp        : {t_f*1e3:7.1f} ms", flush=True)
    t_mc = timed(g_mc, flat.materials, cam)
    print(f"grad mat+cam    : {t_mc*1e3:7.1f} ms  ({t_mc/t_f:.2f}x fwd)",
          flush=True)
    t_m = timed(g_m, flat.materials, cam)
    print(f"grad mat only   : {t_m*1e3:7.1f} ms  ({t_m/t_f:.2f}x fwd)",
          flush=True)
    t_c = timed(g_c, flat.materials, cam)
    print(f"grad cam only   : {t_c*1e3:7.1f} ms  ({t_c/t_f:.2f}x fwd)",
          flush=True)

    # NEE-free variant: zero light samples so sample_lights' contribution
    # (and its VJP) drops out of the graph
    import tinsel_tpu.render.integrator as integ

    rays = width * height * 4 * max_depth * (1 + len(flat.light_indices))
    print(f"[info] counted rays/dispatch {rays/1e6:.1f}M; "
          f"grad m+c = {rays/t_mc/1e6:.1f}M rays/s", flush=True)


if __name__ == "__main__":
    main()
