#!/usr/bin/env python
"""Per-stage slope decomposition of the Cornell FORWARD pass (VERDICT r3
item 6): where do the non-traversal 60-70% of the bounce go?

Method: cumulative variants of the render pass, all sharing the real
components (generate_rays/splat/trace_closest/sample_lights/bsdf_*), each
timed by the dispatch-free slope between two in-jit chunk counts (the
bench.py methodology). Successive differences attribute cost:

  raygen+splat          — sample grid PRNG, camera rays, filter splat
  + trace               — closest-hit per bounce (mirror-advance rays)
  + materials           — one-hot material select per bounce
  + NEE                 — light sampling incl. shadow rays (trace_any)
  + bsdf                — bsdf_sample + bsdf_eval + state update
  full integrator       — everything (emission MIS, sky, masks, carry)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/r8_fwd_decomp.py

RESULT (TPU v5 lite, 2026-08-20, 256x256 d4 16spp, slope 2->8 chunks;
ms per 16-spp chunk, successive differences attribute the stage):

  before the r5 NEE change (closest-hit shadow rays):
    raygen+splat   -0.67 (+ -0.7)      | noise: fused into the bounce
    +trace         15.51 (+16.2)      | 4 closest-hit bounces
    +materials     14.11 (+ -1.4)      | one-hot select fuses to ~0
    +nee           32.16 (+18.1)  <-- top stage
    +bsdf          37.50 (+ 5.3)
    full           44.06 (+ 6.6)       | emission MIS, sky, carry
  after (NEE shadow = segment occlusion, benchmarks/r10_nee_ab.py):
    raygen+splat   -0.04 (+ -0.0)
    +trace         15.80 (+15.8)  <-- now the top stage
    +materials     14.19 (+ -1.6)
    +nee           29.07 (+14.9)       | -3.2 ms in the stage harness
    +bsdf          35.13 (+ 6.1)
    full           38.70 (+ 3.6)       | 216.8 M rays/s in-harness

Forward traffic model (r5-corrected): XLA cost analysis of the
compiled pass reports ~4000 B per counted ray under the unrolled bounce
loop. (An earlier probe of the scan-structured pass read 1105 B/ray —
an ACCOUNTING artifact: a lax.scan body's bytes count once regardless
of trip count, so the scan number under-counted the four bounces.)
"Bytes accessed" is per-op operand traffic, not unique HBM traffic;
the shipped forward achieves ~0.9-1.3x of BW/bytes_accessed — i.e. it
streams its accounted operand bytes at about full bandwidth. The
cornell forward is fusion/traffic bound, not compute bound: the lever
is fewer, larger fusions (fewer materialized (R,) intermediates), not
more FLOPs per byte. (Confirmed by the packed-select experiment,
scene/model.py select_oh: merging 12 select matmuls into one LOST —
the relayouts its column extracts added cost more than the operand
re-reads it removed.)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams, generate_rays
    from tinsel_tpu.render.renderer import _sample_grid, make_render_pass
    from tinsel_tpu.render.filters import splat
    from tinsel_tpu.render.trace import trace_closest
    from tinsel_tpu.render.lights import sample_lights
    from tinsel_tpu.bsdf.disney import bsdf_eval, bsdf_sample
    from tinsel_tpu.core.math import basis_from_vector, dot, face_forward
    from functools import partial

    width = height = 256
    max_depth = 4
    spp = 16
    scene = cornell_scene(width=width, height=height, max_depth=max_depth)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    acc0 = jnp.zeros((height, width, 4), jnp.float32)

    def stage_pass(flat, cam, key, *, stages: str):
        rx, ry, times = _sample_grid(width, height, cam, key, spp)
        raster = jnp.stack([rx, ry], axis=-1).reshape(-1, 2)
        o, d = generate_rays(cam, width, height, raster)
        times_f = times.reshape(-1)
        r = o.shape[0]
        rad = jnp.zeros((r, 3), jnp.float32)
        if "trace" in stages:
            eta = jnp.ones((r,), jnp.float32)
            for i in range(max_depth):
                kb = jax.random.fold_in(jax.random.fold_in(key, 2), i)
                hit = trace_closest(flat, o, d, times_f)
                found = hit.prim >= 0
                t_safe = jnp.where(found, hit.t, 0.0)
                p = o + d * t_safe[..., None]
                n = hit.normal
                if "mat" in stages:
                    idx = jnp.maximum(hit.prim, 0)
                    oh = jax.nn.one_hot(
                        idx, flat.num_prims, dtype=jnp.float32
                    )
                    m = flat.materials.select_oh(oh)
                    out_eta = m.eta
                    rad = rad + 1e-12 * m.color  # keep select live
                if "nee" in stages:
                    nee = sample_lights(
                        flat, m, eta, out_eta, p, n, -d, times_f,
                        jax.random.fold_in(kb, 1),
                    )
                    rad = rad + jnp.where(found[..., None], nee, 0.0)
                if "bsdf" in stages:
                    u_axis, v_axis = basis_from_vector(n)
                    l, new_pdf, ev = bsdf_sample(
                        m, eta, out_eta, u_axis, v_axis, n, -d,
                        jax.random.fold_in(kb, 2),
                    )
                    f_val = bsdf_eval(m, eta, out_eta, n, -d, l)
                    rad = rad + 1e-12 * f_val * new_pdf[..., None]
                    nd = l
                else:
                    # cheap deterministic mirror advance keeps the chain
                    # ray-dependent without PRNG/BSDF work
                    nd = d - 2.0 * dot(d, n)[..., None] * n
                o = jnp.where(found[..., None], p + 1e-4 * face_forward(n, nd), o)
                d = jnp.where(found[..., None], nd, d)
                rad = rad + jnp.where(found[..., None], 1e-3, 0.0)
        sample_rgb = rad.reshape(spp, height, width, 3)
        do_splat = partial(splat, filter_type="gaussian", filter_width=0.75,
                           filter_falloff=1.0)
        return jax.vmap(do_splat)(sample_rgb, rx, ry).sum(axis=0)

    full_fn = make_render_pass(scene.options, spp)

    def chunked(pass_fn, n):
        @jax.jit
        def run(flat, cam, key):
            def body(c, acc):
                return acc + pass_fn(flat, cam, jax.random.fold_in(key, c))
            return jax.lax.fori_loop(0, n, body, acc0)
        return run

    key = jax.random.key(0, impl="rbg")

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

    def slope(pass_fn):
        t_lo = timed(chunked(pass_fn, 2))
        t_hi = timed(chunked(pass_fn, 8))
        return (t_hi - t_lo) / 6

    variants = [
        ("raygen+splat", partial(stage_pass, stages="")),
        ("+trace", partial(stage_pass, stages="trace")),
        ("+materials", partial(stage_pass, stages="trace,mat")),
        ("+nee", partial(stage_pass, stages="trace,mat,nee")),
        ("+bsdf", partial(stage_pass, stages="trace,mat,nee,bsdf")),
        ("full", full_fn),
    ]
    prev = 0.0
    n_lights = len(flat.light_indices)
    rays = width * height * spp * max_depth * (1 + n_lights)
    for name, fn in variants:
        t = slope(fn)
        print(
            f"{name:14s} {t*1e3:7.2f} ms/chunk  (+{(t-prev)*1e3:6.2f})  "
            f"{rays/t/1e6:7.1f} M counted rays/s",
            flush=True,
        )
        prev = t


if __name__ == "__main__":
    main()
