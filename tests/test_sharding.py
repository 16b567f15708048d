"""Multi-chip sharding assertions (8 virtual CPU devices via conftest).

The round-1 dryrun only proved the sharded program runs; these tests
assert the compute is actually PARTITIONED: per-device shard shapes, the
presence of GSPMD all-reduces in the compiled HLO, and numerical equality
with the unsharded computation (a silently-replicated or silently-wrong
partitioning fails here)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier

from tinsel_tpu.parallel.sharding import (
    make_mesh,
    sharded_render_fn,
    sharded_train_step,
)
from tinsel_tpu.render.camera import CameraParams
from tinsel_tpu.render.renderer import render_pass
from tinsel_tpu.scene.presets import dryrun_scene

W = H = 16
OPTS = dict(width=W, height=H, max_depth=2)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    scene = dryrun_scene(width=W, height=H)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    return flat, cam


def test_render_rows_are_sharded_across_devices(setup):
    flat, cam = setup
    mesh = make_mesh(8, spp_parallel=2)
    fn = sharded_render_fn(mesh, spp_per_step=2, **OPTS)
    keys = jax.random.split(jax.random.key(0), 2)
    out = fn(flat, cam, keys)
    assert out.shape == (H, W, 4)
    # output partitioned along rows over the 4-way 'rays' axis
    shards = out.addressable_shards
    row_shapes = {s.data.shape for s in shards}
    assert row_shapes == {(H // 4, W, 4)}, row_shapes
    devices = {s.device for s in shards}
    assert len(devices) == 8  # every device holds (a replica of) a shard


def test_compiled_hlo_contains_all_reduce(setup):
    flat, cam = setup
    mesh = make_mesh(8, spp_parallel=2)
    step = sharded_train_step(mesh, spp_per_step=2, **OPTS)
    keys = jax.random.split(jax.random.key(0), 2)
    target = jnp.zeros((H, W, 3), jnp.float32)
    txt = step.lower(flat, cam, keys, target).compile().as_text()
    # GSPMD must have inserted cross-device reductions for the spp sum and
    # the replicated gradient outputs
    assert "all-reduce" in txt, "no all-reduce: compute was not partitioned"


def test_sharded_render_matches_unsharded(setup):
    flat, cam = setup
    mesh = make_mesh(8, spp_parallel=2)
    fn = sharded_render_fn(mesh, spp_per_step=2, **OPTS)
    keys = jax.random.split(jax.random.key(7), 2)
    sharded = np.asarray(fn(flat, cam, keys))

    unsharded = np.asarray(
        sum(render_pass(flat, cam, k, **OPTS) for k in keys)
    )
    np.testing.assert_allclose(sharded, unsharded, rtol=2e-5, atol=2e-6)


def test_sharded_train_step_grads_match_unsharded(setup):
    flat, cam = setup
    mesh = make_mesh(8, spp_parallel=2)
    step = sharded_train_step(mesh, spp_per_step=2, **OPTS)
    keys = jax.random.split(jax.random.key(3), 2)
    target = jnp.full((H, W, 3), 0.2, jnp.float32)
    loss, gm, gc = step(flat, cam, keys, target)

    def loss_fn(materials, camera):
        s = dataclasses.replace(flat, materials=materials)
        accum = sum(render_pass(s, camera, k, **OPTS) for k in keys)
        img = accum[..., :3] / jnp.maximum(accum[..., 3:4], 1e-6)
        return jnp.mean((img - target) ** 2)

    loss_u, (gm_u, gc_u) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        flat.materials, cam
    )
    np.testing.assert_allclose(float(loss), float(loss_u), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(gm), jax.tree_util.tree_leaves(gm_u)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


def test_pipeline_parallel_matches_scan_backend():
    """Bounce-stage pipeline parallelism (parallel/pipeline.py): one device
    per depth, state handed over ppermute. At one microbatch the result
    must match the scan integrator to float-reassociation precision; at
    four microbatches (different RNG shapes) it must stay finite and agree
    in the mean."""
    import jax.numpy as jnp

    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams, generate_rays
    from tinsel_tpu.render.integrator import path_trace
    from tinsel_tpu.parallel.pipeline import (
        make_stage_mesh, path_trace_pipelined,
    )

    scene = cornell_scene(width=16, height=16, max_depth=4)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    xs = jnp.arange(16, dtype=jnp.float32) + 0.5
    raster = jnp.stack(jnp.meshgrid(xs, xs), -1).reshape(-1, 2)
    o, d = generate_rays(cam, 16, 16, raster)
    times = jnp.zeros((256,))
    key = jax.random.key(7)

    ref = np.asarray(path_trace(flat, o, d, times, 4, key))
    mesh = make_stage_mesh(4)
    out1 = np.asarray(
        path_trace_pipelined(flat, o, d, times, 4, key, mesh, n_micro=1)
    )
    np.testing.assert_allclose(out1, ref, atol=1e-5)

    out4 = np.asarray(
        path_trace_pipelined(flat, o, d, times, 4, key, mesh, n_micro=4)
    )
    assert np.isfinite(out4).all()
    assert abs(out4.mean() - ref.mean()) < 0.05


def test_pipeline_n_micro4_expectation_matches_scan():
    """VERDICT r3 #8: at n_micro=4 (real pipeline bubbles, per-microbatch
    RNG streams) the pipelined integrator must agree with the scan backend
    in EXPECTATION — K independent keys per backend, mean-radiance gap
    bounded by 4 sigma of the measured between-key variance. Catches any
    bias in the microbatch injection/emission bookkeeping (a duplicated or
    dropped microbatch shifts the mean by ~1/n_micro, far beyond 4
    sigma)."""
    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams, generate_rays
    from tinsel_tpu.render.integrator import path_trace
    from tinsel_tpu.parallel.pipeline import (
        make_stage_mesh, path_trace_pipelined,
    )

    scene = cornell_scene(width=16, height=16, max_depth=4)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    xs = jnp.arange(16, dtype=jnp.float32) + 0.5
    raster = jnp.stack(jnp.meshgrid(xs, xs), -1).reshape(-1, 2)
    o, d = generate_rays(cam, 16, 16, raster)
    times = jnp.zeros((256,))
    mesh = make_stage_mesh(4)

    K = 8
    pipe_means = np.array([
        float(
            np.asarray(
                path_trace_pipelined(
                    flat, o, d, times, 4, jax.random.key(100 + k), mesh,
                    n_micro=4,
                )
            ).mean()
        )
        for k in range(K)
    ])
    scan_means = np.array([
        float(
            np.asarray(
                path_trace(flat, o, d, times, 4, jax.random.key(200 + k))
            ).mean()
        )
        for k in range(K)
    ])
    assert np.isfinite(pipe_means).all()
    gap = abs(pipe_means.mean() - scan_means.mean())
    sigma = np.sqrt(
        pipe_means.var(ddof=1) / K + scan_means.var(ddof=1) / K
    )
    assert gap < 4.0 * max(sigma, 1e-4), (
        gap, sigma, pipe_means.mean(), scan_means.mean()
    )


def test_two_process_multihost_matches_single_process():
    """SURVEY §2.2 communication backend, multi-host leg: two
    jax.distributed processes (4 virtual CPU devices each, coordinator on
    localhost) run the sharded train step over the stitched 8-device
    slice; loss and material-gradient fingerprints must agree between the
    processes AND with the single-process 8-device result computed here.
    Skips (not fails) when the harness can't spawn subprocesses."""
    import socket
    import subprocess
    import sys
    import os

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    # single-process reference on this process's own 8-device mesh
    scene = dryrun_scene(width=W, height=H)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    mesh = make_mesh(8, spp_parallel=2)
    step = sharded_train_step(mesh, spp_per_step=2, **OPTS)
    keys = jax.random.split(jax.random.key(3), 2)
    target = jnp.full((H, W, 3), 0.2, jnp.float32)
    loss_ref, gm_ref, _ = step(flat, cam, keys, target)
    gm_sum_ref = sum(
        float(np.asarray(x, np.float64).sum())
        for x in jax.tree_util.tree_leaves(gm_ref)
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(worker))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), "2", coord],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, env=env,
            )
            for i in range(2)
        ]
    except OSError as e:  # pragma: no cover - constrained harness
        pytest.skip(f"cannot spawn worker processes: {e}")

    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        _, loss_s, gm_s = line.split()
        results.append((float(loss_s), float(gm_s)))

    # both processes see identical replicated outputs
    assert results[0] == results[1], results
    loss_mh, gm_sum_mh = results[0]
    np.testing.assert_allclose(loss_mh, float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(gm_sum_mh, gm_sum_ref, rtol=1e-3, atol=1e-6)
