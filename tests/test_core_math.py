import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinsel_tpu.core import math as tm
from tinsel_tpu.core import sampling as ts
from tinsel_tpu.core import color as tc


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    axis = rng.normal(size=3)
    angle = 1.234
    q = tm.quat_from_axis_angle(axis, angle)
    v = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    got = tm.quat_rotate(q, v)

    # reference rotation via Rodrigues
    a = np.asarray(axis) / np.linalg.norm(axis)
    c, s = np.cos(angle), np.sin(angle)
    vn = np.asarray(v)
    expect = (
        vn * c
        + np.cross(np.broadcast_to(a, vn.shape), vn) * s
        + np.outer(vn @ a, a) * (1 - c)
    )
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-5)


def test_quat_mul_compose():
    q1 = tm.quat_from_axis_angle((1.0, 0, 0), 0.7)
    q2 = tm.quat_from_axis_angle((0, 1.0, 0), -0.4)
    v = jnp.asarray([0.3, -1.2, 2.0], jnp.float32)
    a = tm.quat_rotate(tm.quat_mul(q1, q2), v)
    b = tm.quat_rotate(q1, tm.quat_rotate(q2, v))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_transform_roundtrip():
    t = tm.Transform.create(
        p=(1.0, -2.0, 3.0), q=tm.quat_from_axis_angle((1, 2, 3), 0.9), s=2.5
    )
    v = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)), jnp.float32)
    p = tm.transform_point(t, v)
    back = tm.inverse_transform_point(t, p)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    ti = tm.transform_inverse(t)
    back2 = tm.transform_point(ti, p)
    np.testing.assert_allclose(np.asarray(back2), np.asarray(v), atol=1e-5)


def test_transform_compose():
    a = tm.Transform.create(p=(1, 0, 0), q=tm.quat_from_axis_angle((0, 0, 1), 0.5), s=2.0)
    b = tm.Transform.create(p=(0, 1, 0), q=tm.quat_from_axis_angle((0, 1, 0), -0.3), s=0.5)
    v = jnp.asarray([0.2, 0.4, -0.6], jnp.float32)
    ab = tm.transform_compose(a, b)
    np.testing.assert_allclose(
        np.asarray(tm.transform_point(ab, v)),
        np.asarray(tm.transform_point(a, tm.transform_point(b, v))),
        atol=1e-5,
    )


def test_interpolate_transform_endpoints():
    a = tm.Transform.create(p=(0, 0, 0), s=1.0)
    b = tm.Transform.create(
        p=(2, 0, 0), q=tm.quat_from_axis_angle((0, 1, 0), 1.0), s=3.0
    )
    t0 = tm.interpolate_transform(a, b, jnp.float32(0.0))
    t1 = tm.interpolate_transform(a, b, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t0.p), np.asarray(a.p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1.p), np.asarray(b.p), atol=1e-6)
    np.testing.assert_allclose(float(t1.s), 3.0, atol=1e-6)


def test_basis_from_vector_orthonormal():
    rng = np.random.default_rng(2)
    w = tm.normalize(jnp.asarray(rng.normal(size=(32, 3)), jnp.float32))
    u, v = tm.basis_from_vector(w)
    np.testing.assert_allclose(np.asarray(tm.dot(u, w)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tm.dot(v, w)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tm.dot(u, v)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tm.length(u)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tm.length(v)), 1.0, atol=1e-5)


def test_face_forward_and_clamp_length():
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    v = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(tm.face_forward(n, v)), [[0.0, -1.0, 0.0]]
    )
    big = jnp.asarray([[3.0, 4.0, 0.0]], jnp.float32)
    clamped = tm.clamp_length(big, 1.0)
    np.testing.assert_allclose(np.asarray(tm.length(clamped)), 1.0, atol=1e-6)


def test_lookat_points_camera_at_target():
    eye = (1.0, 2.0, 3.0)
    target = (0.0, 0.5, 0.0)
    w2c = tm.look_at_matrix(eye, target)
    c2w = tm.mat44_affine_inverse(w2c)
    # camera looks down -z: target should map to -z axis in camera space
    tc_ = tm.transform_point_mat44(w2c, jnp.asarray(target, jnp.float32))
    assert float(tc_[2]) < 0.0
    np.testing.assert_allclose(np.asarray(tc_[:2]), 0.0, atol=1e-5)
    # eye maps to origin
    ec = tm.transform_point_mat44(w2c, jnp.asarray(eye, jnp.float32))
    np.testing.assert_allclose(np.asarray(ec), 0.0, atol=1e-5)
    # inverse round-trips
    np.testing.assert_allclose(np.asarray(c2w @ w2c), np.eye(4), atol=1e-5)


# -------------------------------------------------------------------- sampling


def _mc_dirs(fn, n=200_000, seed=0):
    key = jax.random.key(seed)
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    return fn(u1, u2)


def test_uniform_sphere_distribution():
    d = np.asarray(_mc_dirs(ts.uniform_sample_sphere))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(d.mean(axis=0), 0.0, atol=0.01)
    # each component has variance 1/3 on the unit sphere
    np.testing.assert_allclose(d.var(axis=0), 1.0 / 3.0, atol=0.01)


def test_cosine_hemisphere_distribution():
    d = np.asarray(_mc_dirs(ts.cosine_sample_hemisphere))
    assert (d[:, 2] >= -1e-6).all()
    # E[cos theta] = 2/3 for pdf cos/pi
    np.testing.assert_allclose(d[:, 2].mean(), 2.0 / 3.0, atol=0.01)


def test_uniform_hemisphere_distribution():
    d = np.asarray(_mc_dirs(ts.uniform_sample_hemisphere))
    assert (d[:, 2] >= -1e-6).all()
    np.testing.assert_allclose(d[:, 2].mean(), 0.5, atol=0.01)


def test_uniform_triangle_in_bounds():
    key = jax.random.key(3)
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), (10000,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (10000,))
    u, v = ts.uniform_sample_triangle(u1, u2)
    u, v = np.asarray(u), np.asarray(v)
    assert (u >= 0).all() and (v >= 0).all() and (u + v <= 1.0 + 1e-6).all()
    # uniform on triangle: E[u] = E[v] = 1/3
    np.testing.assert_allclose(u.mean(), 1 / 3, atol=0.01)
    np.testing.assert_allclose(v.mean(), 1 / 3, atol=0.01)


# -------------------------------------------------------------------- color


def test_srgb_roundtrip():
    c = jnp.linspace(0.0, 1.0, 64).reshape(-1, 1).repeat(3, axis=1)
    np.testing.assert_allclose(
        np.asarray(tc.srgb_to_linear(tc.linear_to_srgb(c))), np.asarray(c), atol=1e-5
    )


def test_resolve_monotonic_and_bounded():
    accum = jnp.stack(
        [jnp.linspace(0, 50.0, 32)] * 3 + [jnp.full((32,), 4.0)], axis=-1
    )
    img = np.asarray(tc.resolve(accum, exposure=1.0))
    assert (img >= 0).all() and (img <= 1).all()
    assert (np.diff(img[:, 0]) >= -1e-6).all()
