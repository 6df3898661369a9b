"""SO(3) Lie-group math and quaternions, batched and jit-friendly.

Everything is float32 (TPU-native); all functions broadcast over leading batch
dimensions. The exp/log maps use Taylor fallbacks near theta=0 so the code is
differentiable everywhere (needed by the bundle-adjustment backend).

Capability parity: the reference relies on Eigen quaternions/rotations
throughout (e.g. /root/reference/src/Utils/Transformations.h:10-86,
/root/reference/src/DataTypes/Space.h:63-88).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat operator: (...,3) -> (...,3,3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w):
    """Exponential map: axis-angle (...,3) -> rotation matrix (...,3,3).

    Rodrigues formula with Taylor expansion near zero.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    # sin(t)/t and (1-cos t)/t^2 with series fallback
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R):
    """Log map: rotation matrix (...,3,3) -> axis-angle (...,3).

    Stable for theta near 0 and near pi (quaternion route).
    """
    q = rot_to_quat(R)
    return quat_log(q)


def quat_log(q):
    """Quaternion (w,x,y,z) -> axis-angle. Assumes unit quaternion."""
    qw = jnp.clip(q[..., 0], -1.0, 1.0)
    qv = q[..., 1:]
    nv = jnp.linalg.norm(qv, axis=-1)
    # angle in [0, pi]
    theta = 2.0 * jnp.arctan2(nv, jnp.abs(qw))
    sign = jnp.where(qw < 0, -1.0, 1.0)
    scale = jnp.where(nv < _EPS, 2.0 * sign, sign * theta / jnp.maximum(nv, _EPS))
    return scale[..., None] * qv


def quat_to_rot(q):
    """Unit quaternion (w,x,y,z) (...,4) -> rotation matrix (...,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Rotation matrix (...,3,3) -> unit quaternion (w,x,y,z), w >= 0.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the one seeded from the largest diagonal combination (stable for
    every rotation, jit-friendly — no data-dependent control flow).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_i^2 (guaranteed positive for its case)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    cand = jnp.stack(
        [
            jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1),
        ],
        axis=-2,
    )  # (...,4,4): candidate index, components
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_mul(a, b):
    """Hamilton product of quaternions (w,x,y,z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def so3_left_jacobian(w):
    """Left Jacobian of SO(3): J_l(w), (...,3)->(...,3,3).

    Used by the SE(3) exp map (V matrix) and by pose-graph linearization.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * (W @ W)


def so3_left_jacobian_inv(w):
    """Inverse left Jacobian of SO(3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    half = 0.5 * theta
    cot = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.maximum(theta2, _EPS),
    )
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + cot[..., None, None] * (W @ W)
