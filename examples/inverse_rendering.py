#!/usr/bin/env python
"""Inverse rendering demo: recover material parameters by gradient descent.

Renders a target Cornell box, perturbs the wall/box albedos, then optimizes
the material table with Adam so re-rendered images match the target — the
"training loop" the differentiable renderer exists for (BASELINE.json's
gradient surface: materials, lights, camera).

Run:  PYTHONPATH=. python examples/inverse_rendering.py [--steps 60]
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import optax


def main(steps: int = 60, size: int = 64, spp_target: int = 64, seed: int = 0):
    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.render.renderer import render_pass
    from tinsel_tpu.diff.gradients import linear_image

    scene = cornell_scene(width=size, height=size, max_depth=3)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    opts = dict(width=size, height=size, max_depth=3)
    key = jax.random.key(seed)

    # ---- ground-truth target (averaged over several passes)
    @jax.jit
    def one_pass(materials, k):
        s = dataclasses.replace(flat, materials=materials)
        return linear_image(render_pass(s, cam, k, **opts))

    true_mats = flat.materials
    target = jnp.mean(
        jnp.stack(
            [one_pass(true_mats, jax.random.fold_in(key, i)) for i in range(8)]
        ),
        axis=0,
    )

    # ---- corrupt the colors, then recover them
    bad = dataclasses.replace(
        true_mats,
        color=jnp.clip(
            true_mats.color
            + jax.random.uniform(
                jax.random.fold_in(key, 99), true_mats.color.shape,
                minval=-0.3, maxval=0.3,
            ),
            0.02,
            0.98,
        ),
    )

    def loss_fn(color, k):
        # two INDEPENDENT renders: E[(x1-t)(x2-t)] = (E[x]-t)^2, so the
        # gradient is unbiased — plain MSE of one noisy render also
        # penalizes estimator variance and drives albedos dark
        mats = dataclasses.replace(true_mats, color=color)
        img1 = one_pass(mats, jax.random.fold_in(k, 0))
        img2 = one_pass(mats, jax.random.fold_in(k, 1))
        return jnp.mean((img1 - target) * (img2 - target))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # emissive materials' albedo is invisible (pure emitters) -> exclude
    # from the error metric; their gradient is legitimately ~0
    seen = jnp.max(true_mats.emission, axis=-1) <= 0.0

    def err_of(c):
        e = jnp.abs(c - true_mats.color).max(axis=-1)
        return float(jnp.where(seen, e, 0.0).sum() / jnp.maximum(seen.sum(), 1))

    sched = optax.exponential_decay(2e-2, transition_steps=20, decay_rate=0.5)
    opt = optax.adam(sched)
    color = bad.color
    state = opt.init(color)
    err0 = err_of(color)
    for i in range(steps):
        loss, g = grad_fn(color, jax.random.fold_in(key, 1000 + i))
        updates, state = opt.update(g, state)
        color = jnp.clip(optax.apply_updates(color, updates), 0.0, 1.0)
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:3d}  loss {float(loss):+.6f}  mean albedo err {err_of(color):.4f}")
    err1 = err_of(color)
    print(f"mean albedo error (visible materials): {err0:.4f} -> {err1:.4f}")
    return err0, err1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args()
    main(steps=args.steps, size=args.size)
