#!/usr/bin/env python
"""Bisect the fwd+bwd cost of the cornell gradient step: forward alone,
forward-under-vjp (residual-saving cost), full grad, grad without NEE,
and depth scaling."""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from tinsel_tpu.scene.presets import cornell_scene
from tinsel_tpu.render.camera import CameraParams
from tinsel_tpu.render.renderer import render_pass
from tinsel_tpu.diff.gradients import render_loss, linear_image


def timed(fn, *args, reps=4):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def main():
    w = h = 256
    depth = 4
    scene = cornell_scene(width=w, height=h, max_depth=depth)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    key = jax.random.key(0)
    target = jnp.zeros((h, w, 3), jnp.float32)
    opts = dict(width=w, height=h, max_depth=depth)

    fwd = jax.jit(lambda f, c, k: render_loss(f, c, k, target, **opts))
    t_fwd = timed(fwd, flat, cam, key)
    print(f"forward loss           : {t_fwd*1e3:7.1f} ms")

    def loss_mat(materials, camera, f, k):
        s = dataclasses.replace(f, materials=materials)
        return render_loss(s, camera, k, target, **opts)

    # forward under vjp (pays residual saving, no backward sweep)
    @jax.jit
    def vjp_fwd(f, c, k):
        y, _ = jax.vjp(lambda m, cc: loss_mat(m, cc, f, k), f.materials, c)
        return y

    t_vfwd = timed(vjp_fwd, flat, cam, key)
    print(f"forward under vjp      : {t_vfwd*1e3:7.1f} ms")

    @jax.jit
    def grad_full(f, c, k):
        return jax.grad(loss_mat, argnums=(0, 1))(f.materials, c, f, k)

    t_g = timed(grad_full, flat, cam, key)
    print(f"grad (materials+camera): {t_g*1e3:7.1f} ms  ({t_g/t_fwd:.2f}x fwd)")

    @jax.jit
    def grad_mat_only(f, c, k):
        return jax.grad(loss_mat, argnums=0)(f.materials, c, f, k)

    t_gm = timed(grad_mat_only, flat, cam, key)
    print(f"grad (materials only)  : {t_gm*1e3:7.1f} ms  ({t_gm/t_fwd:.2f}x fwd)")

    # depth scaling of the full grad
    for dd in (1, 2):
        opts2 = dict(width=w, height=h, max_depth=dd)

        def loss_d(materials, camera, f, k, _o=opts2):
            s = dataclasses.replace(f, materials=materials)
            return render_loss(s, camera, k, target, **_o)

        g = jax.jit(
            lambda f, c, k, _l=loss_d: jax.grad(_l, argnums=(0, 1))(
                f.materials, c, f, k
            )
        )
        fw = jax.jit(lambda f, c, k, _o=opts2: render_loss(f, c, k, target, **_o))
        t_gd = timed(g, flat, cam, key)
        t_fd = timed(fw, flat, cam, key)
        print(
            f"depth={dd}: fwd {t_fd*1e3:6.1f} ms, grad {t_gd*1e3:6.1f} ms "
            f"({t_gd/t_fd:.2f}x)"
        )


if __name__ == "__main__":
    main()
