"""SE(3) rigid transforms, batched, functional, jit-friendly.

Representation: a pair (R, t) packed in a small NamedTuple pytree. World->cam
("Tcw") convention matches classic visual SLAM: x_cam = R @ x_world + t.

Parity: the reference shuttles poses as Eigen isometries / quaternion+vector
pairs (/root/reference/src/DataTypes/Space.h:167-189 GlobalState;
/root/reference/src/Trackers/OpenVSLAMTrackerBase.cpp:307-329 converts the
engine's Rcw|tcw into a camera-center pose). Here the group operations are
first-class batched ops so thousands of poses move through the MXU at once.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .so3 import hat, so3_exp, so3_log, so3_left_jacobian, so3_left_jacobian_inv


class SE3(NamedTuple):
    """Batched rigid transform: R (...,3,3), t (...,3)."""

    R: jnp.ndarray
    t: jnp.ndarray

    @property
    def batch_shape(self):
        return self.R.shape[:-2]


def se3_identity(batch_shape=(), dtype=jnp.float32) -> SE3:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return SE3(R, t)


def se3_from_Rt(R, t) -> SE3:
    return SE3(jnp.asarray(R), jnp.asarray(t))


def se3_compose(a: SE3, b: SE3) -> SE3:
    """a ∘ b: apply b first, then a."""
    R = a.R @ b.R
    t = jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t
    return SE3(R, t)


def se3_inverse(T: SE3) -> SE3:
    Rt = jnp.swapaxes(T.R, -1, -2)
    return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, T.t))


def se3_apply(T: SE3, p):
    """Transform points p (...,3) by T."""
    return jnp.einsum("...ij,...j->...i", T.R, p) + T.t


def se3_exp(xi) -> SE3:
    """Exp map: twist (...,6) [rho, phi] (translation, rotation) -> SE3."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return SE3(R, t)


def se3_log(T: SE3):
    """Log map: SE3 -> twist (...,6) [rho, phi]."""
    phi = so3_log(T.R)
    Vinv = so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_retract(T: SE3, xi) -> SE3:
    """Left-multiplicative retraction: exp(xi) ∘ T (the BA update rule)."""
    return se3_compose(se3_exp(xi), T)


def se3_to_matrix(T: SE3):
    """(...,3,3)+(...,3) -> homogeneous (...,4,4)."""
    batch = T.R.shape[:-2]
    M = jnp.zeros((*batch, 4, 4), dtype=T.R.dtype)
    M = M.at[..., :3, :3].set(T.R)
    M = M.at[..., :3, 3].set(T.t)
    M = M.at[..., 3, 3].set(1.0)
    return M


def se3_from_matrix(M) -> SE3:
    return SE3(M[..., :3, :3], M[..., :3, 3])


def se3_adjoint(T: SE3):
    """Adjoint (...,6,6) for twist ordering [rho, phi]."""
    batch = T.R.shape[:-2]
    A = jnp.zeros((*batch, 6, 6), dtype=T.R.dtype)
    A = A.at[..., :3, :3].set(T.R)
    A = A.at[..., :3, 3:].set(hat(T.t) @ T.R)
    A = A.at[..., 3:, 3:].set(T.R)
    return A
