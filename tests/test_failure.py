"""Failure detection / elastic recovery (parallel/failure.py).

The reference has no analog (SURVEY §5 lists failure detection as a gap);
these tests pin the guard contract: corrupted chunks roll back and retry
with a reseeded key, transient device errors back off and retry, and an
exhausted budget salvages the last verified state as a resumable checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier

from tinsel_tpu.parallel.checkpoint import load_checkpoint
from tinsel_tpu.parallel.failure import ChunkGuard, RenderFailure, chunk_health


def _mk_step(fail_plan):
    """Step whose attempt-N behavior is scripted: 'nan', 'inf', 'raise', 'ok'."""
    calls = []

    def step(accum, scene, cam, key, pass_idx):
        action = fail_plan[len(calls)] if len(calls) < len(fail_plan) else "ok"
        calls.append((action, jax.random.key_data(key).tolist()))
        if action == "raise":
            try:
                from jax.errors import JaxRuntimeError
            except ImportError:
                JaxRuntimeError = RuntimeError
            raise JaxRuntimeError("injected transient device error")
        inc = jnp.ones_like(accum)
        if action == "nan":
            inc = inc * jnp.nan
        elif action == "inf":
            inc = inc.at[0, 0, 0].set(jnp.inf)
        return accum + inc

    step.calls = calls
    return step


def test_chunk_health():
    good = jnp.ones((4, 4, 4))
    assert chunk_health(good)
    assert not chunk_health(good.at[1, 2, 3].set(jnp.nan))
    assert not chunk_health(good.at[0, 0, 0].set(jnp.inf))


def test_nan_chunk_rolls_back_and_reseeds():
    guard = ChunkGuard(retries=2, backoff_s=0.0)
    step = _mk_step(["nan", "ok"])
    accum = jnp.zeros((4, 4, 4))
    out = guard.run(step, accum, None, None, jax.random.key(0), 7)
    # retried once, recovered, buffer reflects exactly ONE good chunk
    np.testing.assert_allclose(np.asarray(out), 1.0)
    assert [k for k, _ in step.calls] == ["nan", "ok"]
    # the retry used a different key (reseeded sample set)
    assert step.calls[0][1] != step.calls[1][1]
    assert guard.events and guard.events[0]["kind"] == "corrupt-chunk"


def test_inf_detected_too():
    guard = ChunkGuard(retries=1, backoff_s=0.0)
    step = _mk_step(["inf", "ok"])
    out = guard.run(step, jnp.zeros((2, 2, 4)), None, None,
                    jax.random.key(1), 0)
    assert chunk_health(out)


def test_transient_device_error_retried():
    guard = ChunkGuard(retries=2, backoff_s=0.0)
    step = _mk_step(["raise", "ok"])
    out = guard.run(step, jnp.zeros((2, 2, 4)), None, None,
                    jax.random.key(2), 3)
    np.testing.assert_allclose(np.asarray(out), 1.0)
    assert guard.events[0]["kind"] == "device-error"


def test_exhausted_budget_salvages_checkpoint(tmp_path):
    ckpt = str(tmp_path / "salvage.ckpt")
    guard = ChunkGuard(retries=1, backoff_s=0.0, salvage_path=ckpt, seed=42)
    step = _mk_step(["nan", "nan"])
    accum = jnp.full((3, 3, 4), 5.0)  # pre-existing verified state
    with pytest.raises(RenderFailure):
        guard.run(step, accum, None, None, jax.random.key(3), 9, spp_done=16)
    a, spp, seed, meta = load_checkpoint(ckpt)
    np.testing.assert_allclose(a, 5.0)  # the LAST GOOD state, not the NaN one
    assert spp == 16 and seed == 42 and meta["salvaged"] is True


def test_guarded_loop_end_to_end():
    """A tiny real render through the guard: health checks pass untouched."""
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.render.renderer import make_accumulate_fn
    from tinsel_tpu.scene.presets import cornell_scene

    scene = cornell_scene(width=8, height=8, max_depth=2)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    step = make_accumulate_fn(scene.options, 2)
    guard = ChunkGuard(retries=1)
    accum = jnp.zeros((8, 8, 4), jnp.float32)
    key = jax.random.key(0)
    for c in range(2):
        accum = guard.run(step, accum, flat, cam, key, c, spp_done=2 * c)
    assert chunk_health(accum)
    assert not guard.events
    assert float(accum[..., 3].min()) > 0.0
