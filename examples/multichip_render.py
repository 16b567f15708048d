"""Multi-chip rendering + differentiable training step over a device mesh.

Runs anywhere: if only one device is visible, it requests 8 virtual CPU
devices (the same trick the test suite uses), so the sharded path — pixel
rows over a `rays` axis, independent sample passes over a `spp` axis,
psum-style reductions inserted by GSPMD — executes exactly as it would on
a TPU slice. On real hardware, launch one process per host after
`tinsel_tpu.parallel.sharding.init_distributed()` and the same code spans
the slice (ICI within hosts, DCN across).

Usage:  python examples/multichip_render.py [out.png] [--virtual]

Pass --virtual to force the 8-device virtual CPU mesh even when the
environment pins a (single-chip) accelerator platform.
"""

import os
import sys

_want_virtual = "--virtual" in sys.argv or not os.environ.get("JAX_PLATFORMS")
if _want_virtual and not os.environ.get("_TINSEL_MC"):
    # Force a virtual 8-device CPU mesh when run standalone. The platform
    # must be pinned before the interpreter imports jax (a sitecustomize
    # may already have registered an accelerator), so re-exec with the
    # environment set rather than mutating os.environ in-process.
    env = dict(
        os.environ,
        _TINSEL_MC="1",
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8",
    )
    os.execvpe(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from tinsel_tpu.scene.presets import cornell_scene
from tinsel_tpu.render.camera import CameraParams
from tinsel_tpu.parallel.sharding import (
    make_mesh,
    sharded_render_fn,
    sharded_train_step,
)
from tinsel_tpu.core.color import resolve
from tinsel_tpu.io.png import write_png


def main():
    args = [a for a in sys.argv[1:] if a != "--virtual"]
    out = args[0] if args else "multichip_cornell.png"
    n = len(jax.devices())
    spp_parallel = 2 if n % 2 == 0 else 1
    mesh = make_mesh(n, spp_parallel=spp_parallel)
    print(f"device mesh: {dict(mesh.shape)} over {n}x {jax.devices()[0].platform}")

    width = height = 64
    scene = cornell_scene(width=width, height=height, max_depth=4)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)

    # ---- forward: accumulate a few sharded multi-pass chunks
    render = sharded_render_fn(
        mesh, spp_per_step=spp_parallel, width=width, height=height, max_depth=4
    )
    key = jax.random.key(0)
    accum = np.zeros((height, width, 4), np.float32)
    n_chunks = 4
    for c in range(n_chunks):
        keys = jax.random.split(jax.random.fold_in(key, c), spp_parallel)
        accum = accum + np.asarray(render(flat, cam, keys))
    img = np.asarray(resolve(accum))
    write_png(out, img)
    print(f"rendered {n_chunks * spp_parallel} spp -> {out} "
          f"(mean {img.mean():.3f})")

    # ---- backward: one sharded training step (materials + camera grads)
    step = sharded_train_step(
        mesh, spp_per_step=spp_parallel, width=width, height=height, max_depth=2
    )
    target = np.asarray(accum[..., :3] / np.maximum(accum[..., 3:4], 1e-6))
    keys = jax.random.split(jax.random.fold_in(key, 999), spp_parallel)
    loss, gmat, gcam = step(flat, cam, keys, target)
    gnorm = sum(float(np.abs(np.asarray(l)).sum())
                for l in jax.tree_util.tree_leaves(gmat))
    print(f"train step: loss {float(loss):.6f}, |grad_materials|_1 {gnorm:.4f}")


if __name__ == "__main__":
    main()
