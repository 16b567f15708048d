#!/usr/bin/env python
"""Device A/B: coherence sort x packet traversal in the SCENE path
(r3 VERDICT #2 / r5 #4). Workloads chosen per the VERDICT: the bigmesh
frontal rays are already coherent, so the sort is tested where the rays
are NOT — envmesh/probemesh (env/HDR-probe-lit 524k-tri statue, diffuse
bounce rays at depth 4) and the 16-instance grid.

Grid: (COHERENCE_SORT, PACKET_TRACE_G) in {(F,None),(T,None),(T,8),
(F,8)} per scene, interleaved in one session (the tunnel drifts
+-15-20% between sessions — only same-run comparisons count), full
render pass spp/s by the dispatch-free slope.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/r11_coherence.py

RESULT (TPU v5 lite, 2026-08-20, interleaved same-session slopes):

  scene          base    sort   sort+pk8   pk8     (spp/s)
  envmesh        9.93    6.41     4.20     4.20
  probemesh      5.89    4.90     2.70     2.71
  instances16    5.30    5.29     5.29     5.30   (shortlist path:
                                                   knobs don't engage)

  bounce-0-only packets (coherent=True hint, second pass):
  envmesh        no-packets 10.01  primary-pk8  9.64   (0.96x)
  probemesh      no-packets  5.85  primary-pk8  5.81   (0.99x)

VERDICT (both knobs ship OFF, kept as opt-ins):
- COHERENCE_SORT: the 262k-lane per-instance argsort + permutes cost
  more than bounce-ray coherence buys, and sorted diffuse packets still
  inflate unions ~as r7_packet_sim.py's diffuse rows predict (directions
  diverge within an octant; origin-Morton cannot fix that).
- Scene-path packets: a clear loss on all-bounce traffic and a wash on
  bounce-0-only (the primary trace is a small share of full-frame time,
  and silhouette tiles mix hit and miss lanes). The ~2x packet win is
  real but belongs to traversal-bound workloads: intersect_mesh
  (packet_g=8) on coherent batches — the BENCH bigmesh headline.
- envmesh base itself is 9.93 spp/s vs the 2.97 recorded in r3 — the
  r4/r5 traversal + NEE + unrolled-loop work compounded ~3.3x on this
  scene class.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import tinsel_tpu.render.trace as tr
    from tinsel_tpu.scene.presets import envmesh_scene, instances_scene
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.render.renderer import make_render_pass

    spp = 4
    scenes = [
        ("envmesh", envmesh_scene(width=256, height=256, max_depth=4,
                                  detail=512)),
        ("probemesh", envmesh_scene(width=256, height=256, max_depth=4,
                                    detail=512, probe=True)),
        ("instances16", instances_scene(width=256, height=256, max_depth=3,
                                        grid=4)),
    ]
    modes = [("base", False, None), ("sort", True, None),
             ("sort+pk8", True, 8), ("pk8", False, 8)]

    for sname, scene in scenes:
        flat = scene.flatten()
        cam = CameraParams.from_host(scene.camera)
        key = jax.random.key(0, impl="rbg")
        acc0 = jnp.zeros((256, 256, 4), jnp.float32)

        fns = {}
        for mname, sort, g in modes:
            tr.COHERENCE_SORT = sort
            tr.PACKET_TRACE_G = g
            pass_fn = make_render_pass(scene.options, spp)
            for n in (1, 4):
                def chunked(n=n, pass_fn=pass_fn):
                    @jax.jit
                    def run(flat, cam, key):
                        def body(c, acc):
                            return acc + pass_fn(
                                flat, cam, jax.random.fold_in(key, c)
                            )
                        return jax.lax.fori_loop(0, n, body, acc0)
                    return run
                fn = chunked()
                np.asarray(fn(flat, cam, key).ravel()[:1])
                fns[(mname, n)] = fn
        tr.COHERENCE_SORT = False
        tr.PACKET_TRACE_G = None

        samples = {k: [] for k in fns}
        for _ in range(5):
            for k, fn in fns.items():
                t0 = time.perf_counter()
                out = fn(flat, cam, key)
                np.asarray(out.ravel()[:1])
                samples[k].append(time.perf_counter() - t0)
        for mname, _, _ in modes:
            t1 = sorted(samples[(mname, 1)])[2]
            t4 = sorted(samples[(mname, 4)])[2]
            per = (t4 - t1) / 3
            print(
                f"{sname:12s} {mname:9s}: {spp/per:7.2f} spp/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
