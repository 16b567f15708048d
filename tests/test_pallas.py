"""Pallas kernel parity: the fused NLM must match the XLA stencil exactly
(on TPU it is bit-exact; the CPU interpreter agrees to float rounding) and
stay on the gradient path through its custom_vjp."""

import numpy as np
import jax
import jax.numpy as jnp

from tinsel_tpu.render.nlm import nlm_filter
from tinsel_tpu.ops.pallas.nlm import nlm_filter_pallas, nlm_denoise
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier


def test_pallas_nlm_matches_xla():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((37, 53, 3)).astype(np.float32))
    a = np.asarray(nlm_filter(img))
    b = np.asarray(nlm_filter_pallas(img))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_pallas_nlm_gradients_match():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((24, 40, 3)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(nlm_filter(x) ** 2))(img)
    g2 = jax.grad(lambda x: jnp.sum(nlm_filter_pallas(x) ** 2))(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


def test_nlm_denoise_dispatcher_runs():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    out = np.asarray(nlm_denoise(img))
    assert out.shape == (16, 16, 3)
    assert np.isfinite(out).all()


def test_pallas_guided_nlm_matches_xla():
    from tinsel_tpu.render.nlm import nlm_guided
    from tinsel_tpu.ops.pallas.nlm import nlm_guided_pallas

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((33, 49, 3)).astype(np.float32))
    normal = jnp.asarray(rng.normal(size=(33, 49, 3)).astype(np.float32))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    albedo = jnp.asarray(rng.random((33, 49, 3)).astype(np.float32))
    depth = jnp.asarray(rng.random((33, 49, 1)).astype(np.float32) * 7)
    a = np.asarray(nlm_guided(img, normal, albedo, depth, falloff=40.0))
    b = np.asarray(nlm_guided_pallas(img, normal, albedo, depth,
                                     falloff=40.0))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_pallas_guided_nlm_gradients_match():
    from tinsel_tpu.render.nlm import nlm_guided
    from tinsel_tpu.ops.pallas.nlm import nlm_guided_pallas

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((17, 24, 3)).astype(np.float32))
    normal = jnp.zeros((17, 24, 3), jnp.float32).at[..., 2].set(1.0)
    albedo = jnp.asarray(rng.random((17, 24, 3)).astype(np.float32))
    depth = jnp.ones((17, 24, 1), jnp.float32)
    g1 = jax.grad(
        lambda x: jnp.sum(nlm_guided(x, normal, albedo, depth) ** 2)
    )(img)
    g2 = jax.grad(
        lambda x: jnp.sum(nlm_guided_pallas(x, normal, albedo, depth) ** 2)
    )(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)
