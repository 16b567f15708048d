#!/usr/bin/env python
"""Benchmark matrix: the BASELINE.md measurement configs, one JSON per line.

Configs (BASELINE.json `configs`): cornell 16spp, gloss sweep, glass+veach,
ajaxenv-class (~500k-tri BVH), paniq-class instancing + NLM. Run on the
target accelerator:

    PYTHONPATH="/root/repo:$PYTHONPATH" python benchmarks/run_all.py

Timings are SLOPES between two in-jit chunk counts with a 1-element
host-transfer sync (bench.py methodology, r5 fix): the r1-r4 version
timed one dispatch ending in a FULL-image np.asarray, which measures the
tunnel's dispatch floor + image transfer, not the machine — the r3
matrix numbers (cornell 80 spp/s vs the slope-measured 300+) carried
that bias, and the link speed varies by session."""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_scene(name, scene, spp, warm_spp=None):
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.render.renderer import make_accumulate_fn

    o = scene.options
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    chunk = max(1, min(spp, (1 << 20) // max(o.width * o.height, 1)))
    step = make_accumulate_fn(o, chunk)
    # match the render() entry point's PRNG default (rbg; Options.prng)
    key = jax.random.key(0, impl=getattr(o, "prng", "rbg"))
    acc0 = jnp.zeros((o.height, o.width, 4), jnp.float32)

    def n_fn(n):
        @jax.jit
        def run(flat, cam, key):
            def body(c, acc):
                return step(acc, flat, cam, key, c)
            return jax.lax.fori_loop(0, n, body, acc0)
        return run

    def timed(fn, reps=3):
        out = fn(flat, cam, key)
        np.asarray(out.ravel()[:1])  # 1-element sync, not the image
        ss = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(flat, cam, key)
            np.asarray(out.ravel()[:1])
            ss.append(time.perf_counter() - t0)
        return sorted(ss)[len(ss) // 2], out

    n_chunks = max(1, spp // chunk)
    # 1x vs 4x chunk counts: the 3x-work slope swamps rep noise that a
    # single-chunk delta cannot (fast scenes measured NEGATIVE slopes)
    t_lo, acc = timed(n_fn(n_chunks))
    t_hi, _ = timed(n_fn(4 * n_chunks))
    dt = (t_hi - t_lo) / 3  # time for n_chunks chunks
    a = np.asarray(acc)
    done = n_chunks * chunk
    n_lights = len(flat.light_indices)
    n_shadow = (
        min(1, n_lights)
        if getattr(o, "light_sampling", "all") == "power" else n_lights
    )
    rays = o.width * o.height * o.max_depth * (1 + n_shadow) * done
    rec = {
        "config": name,
        "resolution": [o.width, o.height],
        "max_depth": o.max_depth,
        "spp": done,
        "seconds": round(dt, 4),
        "spp_per_sec": round(done / dt, 3),
        "mrays_per_sec": round(rays / dt / 1e6, 3),
        "mean_radiance": round(float(a[..., :3].mean()), 5),
    }
    print(json.dumps(rec), flush=True)
    return rec, acc


def main():
    from tinsel_tpu.scene.loaders.tin import load_tin
    from tinsel_tpu.scene.presets import envmesh_scene, instances_scene
    from tinsel_tpu.render.nlm import nlm_filter
    from tinsel_tpu.core.color import resolve

    results = []

    # 1. cornell 16 spp
    sc = load_tin(os.path.join(ROOT, "scenes", "cornell.tin"))
    results.append(_bench_scene("cornell_16spp", sc, 16)[0])

    # 2. gloss sweep
    sc = load_tin(os.path.join(ROOT, "scenes", "gloss.tin"))
    results.append(_bench_scene("gloss_16spp", sc, 16)[0])

    # 3. glass + veach
    sc = load_tin(os.path.join(ROOT, "scenes", "glass.tin"))
    results.append(_bench_scene("glass_8spp", sc, 8)[0])
    sc = load_tin(os.path.join(ROOT, "scenes", "veach.tin"))
    sc.options = dataclasses.replace(sc.options, width=256, height=256)
    results.append(_bench_scene("veach_256_8spp", sc, 8)[0])

    # 4. ajaxenv-class: env-lit ~500k-tri mesh
    sc = envmesh_scene(width=256, height=256, max_depth=4, detail=512)
    results.append(_bench_scene("envmesh_524k_4spp", sc, 4)[0])

    # 4b. full ajaxenv configuration: HDR-probe NEE + escape MIS over the
    # same ~500k-tri BVH (probe branch of render/lights.py at scale)
    sc = envmesh_scene(width=256, height=256, max_depth=4, detail=512,
                       probe=True)
    results.append(_bench_scene("probemesh_524k_4spp", sc, 4)[0])

    # 5. paniq-class instancing + NLM post-pass
    sc = instances_scene(width=256, height=256, max_depth=3, grid=4)
    rec, acc = _bench_scene("instances_16spp", sc, 16)
    img = resolve(acc)
    t0 = time.perf_counter()
    den = np.asarray(nlm_filter(img, 200.0, 1))
    rec["nlm_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    results.append(rec)
    # 6. many-light strategy: veach with power-CDF single-light NEE vs
    # the parity all-lights loop (4 emitters -> 4 shadow traversals
    # become 1; spp/s ratio is the headline)
    sc = load_tin(os.path.join(ROOT, "scenes", "veach.tin"))
    sc.options = dataclasses.replace(
        sc.options, width=256, height=256, light_sampling="power"
    )
    results.append(_bench_scene("veach_256_8spp_powerlights", sc, 8)[0])

    print(json.dumps({"config": "ALL", "results": len(results)}))


if __name__ == "__main__":
    main()
