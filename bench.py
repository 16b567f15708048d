#!/usr/bin/env python
"""Benchmark: Cornell-box path tracing throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Metric: traced rays/second, forward path. Ray count per 1spp pass =
W*H * maxDepth * (1 closest-hit + n_light shadow rays per bounce) — the
machine rate of the lockstep wavefront (dead lanes still occupy vector
lanes, exactly like idle reference wavefront threads, wavefront.cu:918).
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the first recorded round of this framework (r1 sets 1.0).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.renderer import make_accumulate_fn
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.diff.gradients import render_loss_and_grads

    width = height = 256
    max_depth = 4
    scene = cornell_scene(width=width, height=height, max_depth=max_depth)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    n_lights = len(flat.light_indices)
    rays_per_pass = width * height * max_depth * (1 + n_lights)

    spp_chunk = 16
    step = make_accumulate_fn(scene.options, spp_chunk)
    key = jax.random.key(0)
    acc0 = jnp.zeros((height, width, 4), jnp.float32)

    # warmup / compile
    step(acc0, flat, cam, key, 0).block_until_ready()

    n_chunks = 4
    t0 = time.perf_counter()
    acc = acc0
    for c in range(n_chunks):
        acc = step(acc, flat, cam, key, c)
    acc.block_until_ready()
    dt = time.perf_counter() - t0
    n_timed = n_chunks * spp_chunk
    fwd_rays_per_sec = rays_per_pass * n_timed / dt

    # fwd+bwd step (material+camera gradients); keys derived on device
    opts = dict(width=width, height=height, max_depth=max_depth)
    target = jnp.zeros((height, width, 3), jnp.float32)
    grad_fn = jax.jit(
        lambda f, c, k, s: render_loss_and_grads(
            f, c, jax.random.fold_in(k, s), target, **opts
        )
    )
    grad_fn(flat, cam, key, 0)[0].block_until_ready()
    n_grad = 8
    t0 = time.perf_counter()
    for s in range(n_grad):
        loss, _ = grad_fn(flat, cam, key, s)
    loss.block_until_ready()
    dt_g = time.perf_counter() - t0
    fwdbwd_rays_per_sec = rays_per_pass * n_grad / dt_g

    platform = jax.devices()[0].platform
    print(
        json.dumps(
            {
                "metric": "cornell_256_d4_forward_rays_per_sec",
                "value": round(fwd_rays_per_sec),
                "unit": "rays/s",
                "vs_baseline": 1.0,
                "fwd_bwd_rays_per_sec": round(fwdbwd_rays_per_sec),
                "spp_per_sec": round(n_timed / dt, 3),
                "platform": platform,
            }
        )
    )


if __name__ == "__main__":
    main()
