"""Pallas kernel parity: the fused NLM must match the XLA stencil exactly
(on TPU it is bit-exact; the CPU interpreter agrees to float rounding) and
stay on the gradient path through its custom_vjp."""

import numpy as np
import jax
import jax.numpy as jnp

from tinsel_tpu.render.nlm import nlm_filter
from tinsel_tpu.ops.pallas.nlm import nlm_filter_pallas, nlm_denoise


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
