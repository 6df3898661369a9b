"""Sim(3) similarity transforms (scale + rotation + translation), batched.

Used by loop closure: scale-drift-aware pose-graph optimization and Sim3
relative-constraint solving — the capability g2o's ``types_sim3`` provides in
the reference stack (/root/reference/conan-packages/g2o-conan/conanfile.py:118-126).

Representation: (R (...,3,3), t (...,3), s (...)) with action
x' = s * R @ x + t. Tangent ordering: [rho(3), phi(3), sigma(1)].
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .so3 import hat, so3_exp, so3_log

_EPS = 1e-7


class Sim3(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray


def sim3_identity(batch_shape=(), dtype=jnp.float32) -> Sim3:
    return Sim3(
        jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3)),
        jnp.zeros((*batch_shape, 3), dtype=dtype),
        jnp.ones(batch_shape, dtype=dtype),
    )


def sim3_apply(S: Sim3, p):
    return S.s[..., None] * jnp.einsum("...ij,...j->...i", S.R, p) + S.t


def sim3_compose(a: Sim3, b: Sim3) -> Sim3:
    R = a.R @ b.R
    t = a.s[..., None] * jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t
    return Sim3(R, t, a.s * b.s)


def sim3_inverse(S: Sim3) -> Sim3:
    Rt = jnp.swapaxes(S.R, -1, -2)
    sinv = 1.0 / S.s
    return Sim3(Rt, -sinv[..., None] * jnp.einsum("...ij,...j->...i", Rt, S.t), sinv)


def _W_matrix(phi, sigma):
    """The Sim(3) 'W' matrix coupling rho to translation (Strasdat-style).

    t = W @ rho with W = A*I + B*hat(phi) + C*hat(phi)^2, where with
    s = sigma, t = theta = |phi|:
        A = (e^s - 1)/s
        B = (s e^s sin t + t (1 - e^s cos t)) / (t (s^2 + t^2))
        C = (A - (s (e^s cos t - 1) + t e^s sin t)/(s^2 + t^2)) / t^2
    Series fallbacks (derived limits, not ad-hoc guards) keep every branch
    finite and smooth at s->0 and t->0.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    es = jnp.exp(sigma)
    sig2 = sigma * sigma
    sig3 = sig2 * sigma

    small_sig = jnp.abs(sigma) < 1e-3
    small_th = theta < 1e-3
    safe_sig = jnp.where(small_sig, 1.0, sigma)
    safe_sig2 = jnp.where(small_sig, 1.0, sig2)
    safe_sig3 = jnp.where(small_sig, 1.0, sig3)

    # A = (e^s - 1)/s ;  s->0: 1 + s/2 + s^2/6
    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (es - 1.0) / safe_sig)

    denom = jnp.maximum(sig2 + theta2, _EPS)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    B_gen = (es * sin_t * sigma + (1.0 - es * cos_t) * theta) / (theta * denom)
    # t->0 limit: B = (s e^s - e^s + 1)/s^2 ;  s->0: 1/2 + s/3
    B_lim = jnp.where(small_sig, 0.5 + sigma / 3.0, (sigma * es - es + 1.0) / safe_sig2)
    B = jnp.where(small_th, B_lim, B_gen)

    C_gen = (A - ((es * cos_t - 1.0) * sigma + es * sin_t * theta) / denom) / jnp.maximum(
        theta2, _EPS
    )
    # t->0 limit: C = (e^s - 1 - s e^s + s^2 e^s / 2)/s^3 ;  s->0: 1/6 + s/8
    C_lim = jnp.where(
        small_sig,
        1.0 / 6.0 + sigma / 8.0,
        (es - 1.0 - sigma * es + 0.5 * sig2 * es) / safe_sig3,
    )
    C = jnp.where(small_th, C_lim, C_gen)

    W = (
        A[..., None, None] * jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), (*phi.shape[:-1], 3, 3))
        + B[..., None, None] * hat(phi)
        + C[..., None, None] * (hat(phi) @ hat(phi))
    )
    return W


def sim3_exp(xi) -> Sim3:
    """Exp map: (...,7) [rho, phi, sigma] -> Sim3."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _W_matrix(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return Sim3(R, t, s)


def sim3_log(S: Sim3):
    """Log map: Sim3 -> (...,7). Inverse of sim3_exp (W solved linearly)."""
    phi = so3_log(S.R)
    sigma = jnp.log(S.s)
    W = _W_matrix(phi, sigma)
    rho = jnp.linalg.solve(W, S.t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
