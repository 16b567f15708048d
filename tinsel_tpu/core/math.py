"""Core vector / quaternion / transform math, TPU-first.

Everything here is pure JAX on arrays with *trailing* component axes so every
function vmaps/batches naturally: vectors are ``(..., 3)``, quaternions are
``(..., 4)`` stored as (x, y, z, w), rigid transforms are a small pytree of
``p (..., 3) / q (..., 4) / s (...,)``.

Functional parity targets (reference, for capability audit only — this is a
fresh implementation): maths.h Transform (maths.h:575-619), quaternion rotate,
InterpolateTransform (maths.h:1566-1569), BasisFromVector (maths.h:1261),
FaceForward (maths.h:1592), ClampLength (maths.h:1577), AffineInverse /
LookAtMatrix (maths.h:1336-1372).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PI = float(np.pi)
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI
INV_2PI = 0.5 / PI

# ----------------------------------------------------------------------------
# small vector helpers


def dot(a, b):
    """Dot product over the trailing axis, keeps batch shape."""
    return jnp.sum(a * b, axis=-1)


def vdot(a, b):
    """Dot product with a trailing singleton axis (broadcast helper)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length_sq(a):
    return jnp.sum(a * a, axis=-1)


def length(a):
    return jnp.sqrt(length_sq(a))


def normalize(a):
    return a / jnp.sqrt(jnp.maximum(length_sq(a), 1e-30))[..., None]


def safe_normalize(a, fallback=None):
    """Normalize; degenerate inputs return ``fallback`` (or zero)."""
    lsq = length_sq(a)
    ok = lsq > 1e-20
    inv = jax.lax.rsqrt(jnp.where(ok, lsq, 1.0))
    out = a * inv[..., None]
    if fallback is None:
        fallback = jnp.zeros_like(a)
    return jnp.where(ok[..., None], out, fallback)


def clamp_length(v, max_length):
    """Scale v down so |v| <= max_length (firefly clamp)."""
    l = length(v)
    scale = jnp.where(l > max_length, max_length / jnp.maximum(l, 1e-30), 1.0)
    return v * scale[..., None]


def face_forward(n, v):
    """Flip n so it lies in the same hemisphere as v."""
    s = jnp.where(dot(v, n) < 0.0, -1.0, 1.0)
    return n * s[..., None]


def lerp(a, b, t):
    return a + (b - a) * t


def sqr(x):
    return x * x


# ----------------------------------------------------------------------------
# quaternions: (..., 4) as (x, y, z, w); identity = (0,0,0,1)


def quat_identity(shape=()):
    q = jnp.zeros(shape + (4,), jnp.float32)
    return q.at[..., 3].set(1.0)


def quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q (q * v * q^-1), cross-form."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_normalize(q):
    return q / jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-30))


def quat_from_axis_angle(axis, angle):
    axis = normalize(jnp.asarray(axis, jnp.float32))
    half = 0.5 * jnp.asarray(angle, jnp.float32)
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_from_matrix3(m):
    """Quaternion from a 3x3 rotation matrix (numerically-stable branchless).

    m has shape (..., 3, 3), rows are the matrix rows (m[i, j] = row i col j).
    """
    m = jnp.asarray(m, jnp.float32)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # four candidate constructions; pick the one with the largest pivot
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def mk(t, a, b, c, order):
        s = 0.5 * jax.lax.rsqrt(jnp.maximum(t, 1e-12))
        comps = {
            "w": (t * s, a * s, b * s, c * s),
        }
        return comps["w"]

    # candidate w-major
    sw = 0.5 * jax.lax.rsqrt(jnp.maximum(tw, 1e-12))
    qw = jnp.stack([(m21 - m12) * sw, (m02 - m20) * sw, (m10 - m01) * sw, tw * sw], -1)
    sx = 0.5 * jax.lax.rsqrt(jnp.maximum(tx, 1e-12))
    qx = jnp.stack([tx * sx, (m01 + m10) * sx, (m02 + m20) * sx, (m21 - m12) * sx], -1)
    sy = 0.5 * jax.lax.rsqrt(jnp.maximum(ty, 1e-12))
    qy = jnp.stack([(m01 + m10) * sy, ty * sy, (m12 + m21) * sy, (m02 - m20) * sy], -1)
    sz = 0.5 * jax.lax.rsqrt(jnp.maximum(tz, 1e-12))
    qz = jnp.stack([(m02 + m20) * sz, (m12 + m21) * sz, tz * sz, (m10 - m01) * sz], -1)

    best = jnp.argmax(jnp.stack([tw, tx, ty, tz], -1), axis=-1)
    q = jnp.select(
        [best == 0, best == 1, best == 2, best == 3], [qw, qx, qy, qz]
    )
    return quat_normalize(q)


def quat_nlerp(a, b, t):
    """Normalized lerp of quaternions (matches the reference's transform
    interpolation regime for motion blur)."""
    t = jnp.asarray(t, jnp.float32)[..., None]
    return quat_normalize(a + (b - a) * t)


# ----------------------------------------------------------------------------
# rigid transform with uniform scale: pytree {p, q, s}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Transform:
    """Rigid transform with uniform scale. p (...,3), q (...,4), s (...,)."""

    p: jax.Array
    q: jax.Array
    s: jax.Array

    @staticmethod
    def identity(shape=()):
        return Transform(
            p=jnp.zeros(shape + (3,), jnp.float32),
            q=quat_identity(shape),
            s=jnp.ones(shape, jnp.float32),
        )

    @staticmethod
    def create(p=(0.0, 0.0, 0.0), q=(0.0, 0.0, 0.0, 1.0), s=1.0):
        return Transform(
            p=jnp.asarray(p, jnp.float32),
            q=jnp.asarray(q, jnp.float32),
            s=jnp.asarray(s, jnp.float32),
        )


def transform_point(t: Transform, v):
    return t.p + quat_rotate(t.q, v * t.s[..., None])


def transform_vector(t: Transform, v):
    return quat_rotate(t.q, v * t.s[..., None])


def inverse_transform_point(t: Transform, v):
    return quat_rotate(quat_conjugate(t.q), v - t.p) / t.s[..., None]


def inverse_transform_vector(t: Transform, v):
    return quat_rotate(quat_conjugate(t.q), v) / t.s[..., None]


def transform_compose(a: Transform, b: Transform) -> Transform:
    """a ∘ b such that point(compose(a,b), v) == point(a, point(b, v)),
    including uniform scale (the reference's operator* drops a.s on b.p;
    we keep the algebra exact)."""
    return Transform(
        p=quat_rotate(a.q, b.p * a.s[..., None]) + a.p,
        q=quat_mul(a.q, b.q),
        s=a.s * b.s,
    )


def transform_inverse(t: Transform) -> Transform:
    qc = quat_conjugate(t.q)
    s_inv = 1.0 / t.s
    return Transform(
        p=-quat_rotate(qc, t.p) * s_inv[..., None], q=qc, s=s_inv
    )


def interpolate_transform(a: Transform, b: Transform, t) -> Transform:
    """Motion-blur transform interpolation: lerp p, nlerp q, lerp s."""
    t = jnp.asarray(t, jnp.float32)
    return Transform(
        p=lerp(a.p, b.p, t[..., None]),
        q=quat_nlerp(a.q, b.q, t),
        s=lerp(a.s, b.s, t),
    )


# ----------------------------------------------------------------------------
# orthonormal basis


def basis_from_vector(w):
    """Build (u, v) orthonormal to w (w is the 'z' axis). Branchless."""
    use_x = jnp.abs(w[..., 0]) > jnp.abs(w[..., 1])
    inv_a = jax.lax.rsqrt(
        jnp.maximum(w[..., 0] ** 2 + w[..., 2] ** 2, 1e-20)
    )
    ua = jnp.stack(
        [-w[..., 2] * inv_a, jnp.zeros_like(inv_a), w[..., 0] * inv_a], -1
    )
    inv_b = jax.lax.rsqrt(
        jnp.maximum(w[..., 1] ** 2 + w[..., 2] ** 2, 1e-20)
    )
    ub = jnp.stack(
        [jnp.zeros_like(inv_b), w[..., 2] * inv_b, -w[..., 1] * inv_b], -1
    )
    u = jnp.where(use_x[..., None], ua, ub)
    v = jnp.cross(w, u)
    return u, v


# ----------------------------------------------------------------------------
# 4x4 matrices (host-side camera chain; row-vector-free: m @ column vector)


def mat44_affine_inverse(m):
    """Inverse of an orthonormal affine matrix (rotation + translation)."""
    m = jnp.asarray(m, jnp.float32)
    r = m[:3, :3]
    t = m[:3, 3]
    rt = r.T
    out = jnp.eye(4, dtype=jnp.float32)
    out = out.at[:3, :3].set(rt)
    out = out.at[:3, 3].set(-rt @ t)
    return out


def look_at_matrix(eye, target, up=(0.0, 1.0, 0.0)):
    """World-to-camera matrix, OpenGL convention (camera looks down -z)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    forward = -normalize(target - eye)  # camera z axis
    left = -normalize(jnp.cross(forward, up))  # camera x axis
    upv = -jnp.cross(left, forward)  # camera y axis
    cam_to_world = jnp.eye(4, dtype=jnp.float32)
    cam_to_world = cam_to_world.at[:3, 0].set(left)
    cam_to_world = cam_to_world.at[:3, 1].set(upv)
    cam_to_world = cam_to_world.at[:3, 2].set(forward)
    cam_to_world = cam_to_world.at[:3, 3].set(eye)
    return mat44_affine_inverse(cam_to_world)


def transform_point_mat44(m, v):
    """Apply a 4x4 matrix to points of shape (..., 3)."""
    vh = jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)
    out = jnp.einsum("ij,...j->...i", m, vh)
    return out[..., :3]
