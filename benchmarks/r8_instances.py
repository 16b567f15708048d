#!/usr/bin/env python
"""Instance-count scaling of the top level (VERDICT r3 #5).

Renders the TestPaniq-analog capsule grid at 16 / 36 / 64 instances and
reports spp/s (dispatch-free slope). The old (I*R)-lane batch scales
~linearly in I; the tn-ordered top-k shortlist rounds
(render/trace.py:_instance_rounds) should hold the 64-instance cost to
<= ~2x the 16-instance cost. Set FORCE=brute to measure the old path at
any count (INSTANCE_TOPK_MIN forced high).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH [FORCE=brute] \
    python benchmarks/r8_instances.py [grids...]

RESULT r4 (shortlist): 16/36/64 inst = 5.37/4.24/4.21 spp/s; brute
(I*R): 2.55/-/0.54 -> 7.8x at 64 instances.
RESULT r5 (grids 8 16, TPU v5 lite, 2026-08-20): 64 inst 4.20 spp/s,
256 inst 3.43 spp/s — 256 instances cost 1.22x the 64-instance time
(VERDICT r4 #7 target <=1.5x): the shortlist keeps traversal lanes at
k*R while only the (I, R) argmin table grows with I.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import tinsel_tpu.render.trace as tr
    from tinsel_tpu.scene.presets import instances_scene
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.render.renderer import make_render_pass

    if os.environ.get("FORCE") == "brute":
        tr.INSTANCE_TOPK_MIN = 10**9
        print("(forced brute (I*R) path)")

    grids = [int(a) for a in sys.argv[1:]] or [4, 6, 8]
    spp = 4
    for grid in grids:
        scene = instances_scene(width=256, height=256, max_depth=3,
                                grid=grid)
        flat = scene.flatten()
        cam = CameraParams.from_host(scene.camera)
        pass_fn = make_render_pass(scene.options, spp)
        key = jax.random.key(0, impl="rbg")
        acc0 = jnp.zeros((256, 256, 4), jnp.float32)

        def chunked(n):
            @jax.jit
            def run(flat, cam, key):
                def body(c, acc):
                    return acc + pass_fn(
                        flat, cam, jax.random.fold_in(key, c)
                    )
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

        t = (timed(chunked(4)) - timed(chunked(1))) / 3
        print(
            f"grid {grid} ({grid*grid:3d} instances): "
            f"{spp / t:6.2f} spp/s  ({t*1e3:6.1f} ms/chunk)",
            flush=True,
        )


if __name__ == "__main__":
    main()
