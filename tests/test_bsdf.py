import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinsel_tpu.bsdf import disney
from tinsel_tpu.core.math import basis_from_vector, dot, normalize
from tinsel_tpu.core.sampling import uniform_sample_sphere


@dataclasses.dataclass
class Mat:
    color: jnp.ndarray
    emission: jnp.ndarray = None
    absorption: jnp.ndarray = None
    eta: jnp.ndarray = None
    metallic: jnp.ndarray = None
    subsurface: jnp.ndarray = None
    specular: jnp.ndarray = None
    roughness: jnp.ndarray = None
    specular_tint: jnp.ndarray = None
    clearcoat: jnp.ndarray = None
    clearcoat_gloss: jnp.ndarray = None
    transmission: jnp.ndarray = None


def make_mat(n, color=(0.8, 0.8, 0.8), metallic=0.0, subsurface=0.0,
             specular=0.5, roughness=0.5, specular_tint=0.0, clearcoat=0.0,
             clearcoat_gloss=1.0, transmission=0.0, eta=1.5):
    f = lambda x: jnp.full((n,), x, jnp.float32)
    v = lambda c: jnp.tile(jnp.asarray(c, jnp.float32), (n, 1))
    return Mat(
        color=v(color), emission=v((0, 0, 0)), absorption=v((0, 0, 0)),
        eta=f(eta), metallic=f(metallic), subsurface=f(subsurface),
        specular=f(specular), roughness=f(roughness),
        specular_tint=f(specular_tint), clearcoat=f(clearcoat),
        clearcoat_gloss=f(clearcoat_gloss), transmission=f(transmission),
    )


N_FRAME = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)


def _frame(n):
    nn = jnp.tile(N_FRAME, (n, 1))
    u, v = basis_from_vector(nn)
    return u, v, nn


def test_fresnel_normal_incidence_and_grazing():
    # normal incidence: ((1-1.5)/(1+1.5))^2 = 0.04
    f0 = disney.fresnel_dielectric(jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(1.5))
    np.testing.assert_allclose(float(f0), 0.04, atol=1e-4)
    fg = disney.fresnel_dielectric(jnp.asarray(0.001), jnp.asarray(1.0), jnp.asarray(1.5))
    assert float(fg) > 0.95
    # TIR from dense to sparse side beyond the critical angle
    ftir = disney.fresnel_dielectric(jnp.asarray(0.3), jnp.asarray(1.5), jnp.asarray(1.0))
    np.testing.assert_allclose(float(ftir), 1.0)


def test_refract_snell():
    n = jnp.asarray([0.0, 0.0, 1.0])
    wi = normalize(jnp.asarray([0.5, 0.0, 0.8]))  # away from surface
    eta = jnp.asarray(1.0 / 1.5)
    ok, wt = disney.refract(wi, n, eta)
    assert bool(ok)
    wt = normalize(wt)
    sin_i = float(jnp.sqrt(1 - dot(wi, n) ** 2))
    sin_t = float(jnp.sqrt(1 - dot(wt, n) ** 2))
    np.testing.assert_allclose(sin_i * (1.0 / 1.5), sin_t, atol=1e-5)
    assert float(wt[2]) < 0  # goes into the surface


@pytest.mark.parametrize(
    "kwargs,lo",
    [
        (dict(roughness=1.0, specular=0.0), 0.70),
        (dict(roughness=0.3, specular=0.8), 0.90),
        (dict(roughness=0.1, metallic=1.0), 0.95),
        (dict(roughness=0.5, subsurface=0.5), 0.80),
        (dict(roughness=0.5, clearcoat=1.0), 0.85),
    ],
)
def test_pdf_integrates_to_at_most_one(kwargs, lo):
    """∫ pdf dω over the sphere is a sub-probability: <= 1 always, and close
    to 1 for smooth lobes. (It is < 1 for rough GGX because half-vector
    sampling can reflect below the horizon where the pdf reports only the
    subsurface density — an inconsistency inherited from the reference's
    BSDFPdf, disney.h:133-140; such samples eval to ~0 so the estimator
    stays consistent, which test_sample_pdf_eval_consistency verifies.)"""
    n = 200_000
    mat = make_mat(n, **kwargs)
    u, v, nn = _frame(n)
    key = jax.random.key(7)
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    l = uniform_sample_sphere(u1, u2)
    view = normalize(jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1)))
    eta1 = jnp.ones((n,))
    pdf = disney.bsdf_pdf(mat, eta1, 1.5 * eta1, nn, view, l)
    integral = float(jnp.mean(pdf) * 4.0 * np.pi)
    assert lo < integral < 1.03, integral


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(roughness=1.0, specular=0.2),
        dict(roughness=0.25, specular=0.8),
        dict(roughness=0.6, subsurface=0.4),
    ],
)
def test_sample_pdf_eval_consistency(kwargs):
    """MC estimate of ∫ f cosθ dω must agree between importance sampling
    (draws/pdf from bsdf_sample) and uniform sphere sampling (oracle).
    This is the vectorized version of the reference's BSDFTest harness
    (disney.h:409-482)."""
    n = 400_000
    mat = make_mat(n, **kwargs)
    u, v, nn = _frame(n)
    view = normalize(jnp.tile(jnp.asarray([0.2, -0.1, 0.95]), (n, 1)))
    eta1 = jnp.ones((n,))
    eta_o = 1.5 * eta1

    # importance sampled; restrict to the exactly-consistent sub-estimators:
    # above-horizon samples (density == pdf), and below-horizon samples
    # conditioned on the subsurface event (density == pdf there too; the
    # below-horizon GGX leak has no pdf by design, disney.h:133-140).
    l, pdf, ev = disney.bsdf_sample(mat, eta1, eta_o, u, v, nn, view, jax.random.key(3))
    f = disney.bsdf_eval(mat, eta1, eta_o, nn, view, l)
    w = jnp.where(
        (pdf > 1e-6)[:, None],
        f * jnp.abs(dot(nn, l))[:, None] / jnp.maximum(pdf, 1e-6)[:, None],
        0.0,
    )
    above = dot(nn, l) > 0.0
    is_ss = ev == disney.TRANSMITTED
    est_is_above = np.asarray(jnp.mean(jnp.where(above[:, None], w, 0.0), axis=0))
    est_is_below = np.asarray(jnp.mean(jnp.where(is_ss[:, None], w, 0.0), axis=0))

    # uniform sphere oracle, split by hemisphere
    key = jax.random.key(11)
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    lu = uniform_sample_sphere(u1, u2)
    fu = disney.bsdf_eval(mat, eta1, eta_o, nn, view, lu)
    wu = fu * jnp.abs(dot(nn, lu))[:, None] * 4.0 * np.pi
    above_u = (dot(nn, lu) > 0.0)[:, None]
    est_un_above = np.asarray(jnp.mean(jnp.where(above_u, wu, 0.0), axis=0))
    est_un_below = np.asarray(jnp.mean(jnp.where(~above_u, wu, 0.0), axis=0))

    np.testing.assert_allclose(est_is_above, est_un_above, rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(est_is_below, est_un_below, rtol=0.08, atol=5e-3)


def test_diffuse_white_albedo_below_one():
    """Energy conservation: reflected albedo of a white diffuse surface <= 1."""
    n = 400_000
    mat = make_mat(n, color=(1.0, 1.0, 1.0), roughness=1.0, specular=0.0)
    u, v, nn = _frame(n)
    view = normalize(jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1)))
    eta1 = jnp.ones((n,))
    l, pdf, ev = disney.bsdf_sample(mat, eta1, 1.5 * eta1, u, v, nn, view, jax.random.key(5))
    f = disney.bsdf_eval(mat, eta1, 1.5 * eta1, nn, view, l)
    w = jnp.where(
        (pdf > 1e-6)[:, None],
        f * jnp.abs(dot(nn, l))[:, None] / jnp.maximum(pdf, 1e-6)[:, None],
        0.0,
    )
    albedo = float(jnp.mean(w[:, 0]))
    assert 0.5 < albedo <= 1.05, albedo


def test_sample_returns_finite_everywhere():
    n = 100_000
    mat = make_mat(n, roughness=0.05, transmission=0.7, eta=1.7, subsurface=0.3)
    u, v, nn = _frame(n)
    view = normalize(jnp.tile(jnp.asarray([0.4, 0.2, 0.6]), (n, 1)))
    eta1 = jnp.ones((n,))
    l, pdf, ev = disney.bsdf_sample(mat, eta1, 1.7 * eta1, u, v, nn, view, jax.random.key(9))
    f = disney.bsdf_eval(mat, eta1, 1.7 * eta1, nn, view, l)
    p = disney.bsdf_pdf(mat, eta1, 1.7 * eta1, nn, view, l)
    for arr in (l, pdf, f, p):
        assert np.isfinite(np.asarray(arr)).all()
    # event types are in range
    assert set(np.unique(np.asarray(ev))) <= {0, 1, 2}
