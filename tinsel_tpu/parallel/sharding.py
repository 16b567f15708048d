"""Multi-chip execution: shard rays/pixels and sample passes over a device
mesh; the scene is replicated (read-only, like the reference's per-GPU scene
upload render.cu:1028-1048), gradients and framebuffers all-reduce over ICI.

Design (SURVEY §2.2): data parallelism = pixel rows sharded on a `rays` axis;
sample parallelism = independent spp passes sharded on a `spp` axis and
summed (progressive accumulation is an all-reduce). Everything goes through
`jax.jit` with NamedSharding constraints — XLA GSPMD inserts the halo
exchanges for the splat stencil and the psums for reductions, riding ICI.
Multi-host extends the same mesh over DCN via jax.distributed.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diff.gradients import linear_image
from ..render.renderer import render_pass
from ..scene.model import SceneFlat


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize multi-host execution (jax.distributed over DCN).

    Call once per host before creating the mesh; after this,
    `jax.devices()` spans the whole slice and make_mesh/sharded_* work
    unchanged — XLA routes the framebuffer/gradient psums over ICI within
    a host's chips and DCN across hosts. With no arguments, relies on the
    TPU environment's auto-bootstrap (GKE/Cloud TPU metadata)."""
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: int | None = None, spp_parallel: int = 1) -> Mesh:
    """Build a (rays, spp) device mesh over the first n devices."""
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devs)
    assert n % spp_parallel == 0, (n, spp_parallel)
    import numpy as np

    grid = np.array(devs).reshape(n // spp_parallel, spp_parallel)
    return Mesh(grid, ("rays", "spp"))


def sharded_render_fn(mesh: Mesh, spp_per_step: int, **opts):
    """Returns jitted fn(scene, cam, keys) -> (H, W, 4) accumulation summed
    over spp_per_step passes; image rows sharded over `rays`, passes over
    `spp`, output replicated after the psum-like sum.
    """
    repl = NamedSharding(mesh, P())
    out_sharding = NamedSharding(mesh, P(None, "rays", None, None))

    def multi_pass(scene, cam, keys):
        accums = jax.vmap(lambda k: render_pass(scene, cam, k, **opts))(keys)
        accums = jax.lax.with_sharding_constraint(
            accums, NamedSharding(mesh, P("spp", "rays", None, None))
        )
        return jnp.sum(accums, axis=0)  # spp all-reduce over ICI

    return jax.jit(
        multi_pass,
        in_shardings=(repl, repl, NamedSharding(mesh, P("spp"))),
        out_shardings=NamedSharding(mesh, P("rays", None, None)),
    )


def sharded_train_step(mesh: Mesh, spp_per_step: int, lr: float = 0.0, **opts):
    """Full differentiable step over the mesh: forward render (rays+spp
    sharded), L2 loss vs target, backward pass; material/camera gradients
    are all-reduced by GSPMD across both mesh axes.

    Returns jitted fn(scene, cam, keys, target) -> (loss, grad_mats, grad_cam).
    """
    repl = NamedSharding(mesh, P())

    def step(scene, cam, keys, target):
        def loss_fn(materials, camera):
            s = dataclasses.replace(scene, materials=materials)
            accums = jax.vmap(lambda k: render_pass(s, camera, k, **opts))(keys)
            accums = jax.lax.with_sharding_constraint(
                accums, NamedSharding(mesh, P("spp", "rays", None, None))
            )
            accum = jnp.sum(accums, axis=0)
            img = linear_image(accum)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            scene.materials, cam
        )
        return loss, grads[0], grads[1]

    return jax.jit(
        step,
        in_shardings=(
            repl,
            repl,
            NamedSharding(mesh, P("spp")),
            NamedSharding(mesh, P("rays", None, None)),
        ),
        out_shardings=(repl, repl, repl),
    )
