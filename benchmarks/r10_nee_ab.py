#!/usr/bin/env python
"""A/B: area-light NEE shadow visibility as a closest hit (reference
estimator, render.cpp:172-218) vs a segment occlusion query (trace_any
up to dist - kTolerance; r5 default — see lights.py module docstring).

Times the FULL cornell render pass (the bench.py workload) by the
dispatch-free slope between two in-jit chunk counts, under both settings.

RESULT (TPU v5 lite, 2026-08-20, 256x256 d4 16spp slope 2->8 chunks):
  closest-shadow (reference) : 43.46 ms/chunk   193.0 M rays/s
  occlusion-shadow (default) : 37.52 ms/chunk   223.6 M rays/s   1.16x
Decomposition context (benchmarks/r8_fwd_decomp.py, same session): the
NEE stage was the top forward term at +18.05 ms of the 44.06 ms chunk;
the occlusion form removes ~6 ms of it (shadow hit refit + one-hot
emission gather + the closest-hit tail the early-exit skips). Goldens
and the parity suite pass under BOTH settings without regeneration.
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import tinsel_tpu.render.lights as lights
    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.render.renderer import make_render_pass

    width = height = 256
    max_depth = 4
    spp = 16
    scene = cornell_scene(width=width, height=height, max_depth=max_depth)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    acc0 = jnp.zeros((height, width, 4), jnp.float32)
    key = jax.random.key(0, impl="rbg")
    n_lights = len(flat.light_indices)
    rays = width * height * spp * max_depth * (1 + n_lights)

    def chunked(pass_fn, n):
        @jax.jit
        def run(flat, cam, key):
            def body(c, acc):
                return acc + pass_fn(flat, cam, jax.random.fold_in(key, c))
            return jax.lax.fori_loop(0, n, body, acc0)
        return run

    def timed(fn, reps=3):
        out = fn(flat, cam, key)
        np.asarray(out.ravel()[:1])
        ss = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(flat, cam, key)
            np.asarray(out.ravel()[:1])
            ss.append(time.perf_counter() - t0)
        return sorted(ss)[len(ss) // 2]

    for name, closest in (("closest-shadow", True), ("occlusion-shadow", False)):
        lights.NEE_CLOSEST_SHADOW = closest
        pass_fn = make_render_pass(scene.options, spp)
        t_lo = timed(chunked(pass_fn, 2))
        t_hi = timed(chunked(pass_fn, 8))
        t = (t_hi - t_lo) / 6
        print(
            f"{name:18s} {t*1e3:7.2f} ms/chunk  {rays/t/1e6:7.1f} M rays/s",
            flush=True,
        )
    lights.NEE_CLOSEST_SHADOW = False


if __name__ == "__main__":
    main()
