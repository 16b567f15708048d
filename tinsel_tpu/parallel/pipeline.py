"""Pipeline parallelism: bounce-stage pipelining over a device mesh.

SURVEY §2.2 names this the optional strategy ("stage-pipelined wavefront
across cores") next to the fused-megakernel-per-shard default this
framework ships in parallel/sharding.py. This module builds the real
thing, TPU-idiomatically: a 1-D `stage` mesh axis of `max_depth` devices,
each owning ONE bounce depth; path state flows device d -> d+1 over ICI
via `lax.ppermute`, with ray microbatches injected at stage 0 every step
(GPipe-style software pipeline, fill/drain bubbles included). Stage d's
bounce IS the shared integrator body (`render/integrator._make_bounce`)
evaluated at depth i = axis_index('stage'), so the pipelined renderer is
numerically the same integrator — at one microbatch it matches the
`lax.scan` backend to float-reassociation precision (same
fold_in(key, depth) streams, same shapes; measured max |diff| ~7e-7).

When to use which: data parallelism (sharding.py) is the right default —
the scene is replicated and rays are embarrassingly parallel. Stage
pipelining trades bubble overhead for a smaller per-device working set
(each device compiles/holds one bounce) and turns the depth loop into
ICI traffic; it exists because the survey contract lists it, and as the
natural shape for scenes whose per-bounce state is too large to keep
resident per device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..render.integrator import _initial_state, _make_bounce
from ..scene.model import SceneFlat


def make_stage_mesh(n_stages: int) -> Mesh:
    """1-D pipeline mesh over the first n_stages devices."""
    import numpy as np

    devs = jax.devices()[:n_stages]
    assert len(devs) == n_stages, (len(devs), n_stages)
    return Mesh(np.array(devs), ("stage",))


def path_trace_pipelined(scene: SceneFlat, origins, dirs, times,
                         max_depth: int, key, mesh: Mesh,
                         n_micro: int = 1):
    """Pipelined path trace: returns (R, 3) radiance, replicated.

    Requires mesh axis 'stage' of size == max_depth (one device per
    bounce) and R % n_micro == 0. n_micro=1 reproduces the scan backend
    (up to compiler float reassociation); n_micro>1 keeps more
    microbatches in flight (smaller
    per-lane RNG shapes => a different but equally valid sample stream).
    """
    n_stages = mesh.shape["stage"]
    assert n_stages == max_depth, (n_stages, max_depth)
    r = origins.shape[0]
    assert r % n_micro == 0, (r, n_micro)
    micro = r // n_micro
    n_steps = n_micro + n_stages - 1
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def per_device(scene, origins, dirs, times, key):
        stage = jax.lax.axis_index("stage")

        def slice_micro(x, m):
            ms = jnp.clip(m, 0, n_micro - 1) * micro
            return jax.lax.dynamic_slice_in_dim(x, ms, micro, axis=0)

        def step(carry, t):
            st, out = carry
            # hand the previous step's state to the next stage
            st = jax.tree.map(
                lambda x: jax.lax.ppermute(x, "stage", perm), st
            )
            m = t - stage  # microbatch this device works on (if valid)
            valid = (m >= 0) & (m < n_micro)
            # stage 0 injects a fresh microbatch instead of the handoff
            fresh = _initial_state(
                slice_micro(origins, m), slice_micro(dirs, m)
            )
            inject = (stage == 0) & valid
            st = jax.tree.map(
                lambda a, b: jnp.where(inject, a, b), fresh, st
            )
            t_m = slice_micro(times, m)
            # decorrelate microbatches: without the fold, lane j of EVERY
            # microbatch would draw the identical per-bounce stream (the
            # estimate stays unbiased but samples are structurally
            # correlated). n_micro=1 keeps the raw key so the result is
            # bit-comparable with the scan backend.
            key_m = jax.random.fold_in(key, m) if n_micro > 1 else key
            bounce = _make_bounce(scene, t_m, key_m, micro)
            new_st = bounce(st, stage)
            st = jax.tree.map(
                lambda a, b: jnp.where(valid, a, b), new_st, st
            )
            # last stage emits the finished microbatch's radiance
            emit = valid & (stage == n_stages - 1)
            out = jax.lax.dynamic_update_slice_in_dim(
                out,
                jnp.where(emit, st["rad"], slice_micro(out, m)),
                jnp.clip(m, 0, n_micro - 1) * micro,
                axis=0,
            )
            return (st, out), None

        st0 = _initial_state(
            jnp.zeros((micro, 3), jnp.float32),
            jnp.ones((micro, 3), jnp.float32),
        )
        out0 = jnp.zeros((r, 3), jnp.float32)
        (st, out), _ = jax.lax.scan(
            step, (st0, out0), jnp.arange(n_steps)
        )
        # only the last stage's buffer is real; broadcast it to all
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, out, 0.0), "stage"
        )

    import inspect

    params = inspect.signature(shard_map).parameters
    nocheck = {
        ("check_vma" if "check_vma" in params else "check_rep"): False
    }
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(),
        **nocheck,
    )
    return fn(scene, origins, dirs, times, key)
