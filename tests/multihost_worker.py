"""Worker process for the two-process multi-host sharding test.

Each process owns 4 virtual CPU devices; jax.distributed stitches them
into one 8-device slice (the DCN path of SURVEY §2.2's communication
backend). The worker runs the SAME sharded train step the single-process
tests run and prints loss + gradient fingerprints for the parent test to
compare — multi-host must be numerically invisible.

Usage: multihost_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys

proc_id, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from tinsel_tpu.parallel.sharding import (  # noqa: E402
    init_distributed, make_mesh, sharded_train_step,
)
from tinsel_tpu.render.camera import CameraParams  # noqa: E402
from tinsel_tpu.scene.presets import dryrun_scene  # noqa: E402


def main():
    init_distributed(coord, nproc, proc_id)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert len(jax.local_devices()) == 4

    W = H = 16
    opts = dict(width=W, height=H, max_depth=2)
    scene = dryrun_scene(width=W, height=H)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)

    mesh = make_mesh(8, spp_parallel=2)
    repl = NamedSharding(mesh, P())
    step = sharded_train_step(mesh, spp_per_step=2, **opts)

    # Build the global inputs with a jitted SPMD producer rather than
    # device_put: device_put's cross-process equality assert trips on the
    # NaN padding inside the flattened scene (NaN != NaN), while a
    # no-input jit stamps identical constants onto every process by
    # construction.
    def make_inputs():
        keys = jax.random.split(jax.random.key(3), 2)
        target = jnp.full((H, W, 3), 0.2, jnp.float32)
        return flat, cam, keys, target

    flat_g, cam_g, keys_g, target_g = jax.jit(
        make_inputs,
        out_shardings=(
            repl, repl,
            NamedSharding(mesh, P("spp")),
            NamedSharding(mesh, P("rays", None, None)),
        ),
    )()

    loss, gm, gc = step(flat_g, cam_g, keys_g, target_g)
    gm_sum = sum(
        float(jnp.asarray(x, jnp.float64).sum())
        for x in jax.tree_util.tree_leaves(gm)
    )
    print(f"RESULT {float(loss):.9e} {gm_sum:.9e}", flush=True)


if __name__ == "__main__":
    main()
