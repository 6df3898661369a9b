"""Small closed-form linear algebra for the TPU hot paths.

XLA lowers jnp.linalg.inv / jnp.linalg.solve to LAPACK-style LU with serial
triangular solves — hundreds of microseconds even for a 6x6 on TPU, which
multiplies badly inside per-frame loops (10 pose-opt iterations per tracked
frame). These closed-form VPU routines are branch-free elementwise math:
batched adjugate 3x3 inverse (~3 us for 4096 blocks on a v5e) and a 6x6 SPD
solve via 3x3 block Schur.
"""
from __future__ import annotations

import jax.numpy as jnp


def inv3x3(M, eps: float = 0.0):
    """Closed-form adjugate inverse of (..., 3, 3) matrices."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    det = jnp.where(jnp.abs(det) > eps, det, jnp.where(det >= 0, 1.0, -1.0) * jnp.maximum(jnp.abs(det), 1e-20))
    inv = jnp.stack([
        jnp.stack([A00, A01, A02], -1),
        jnp.stack([A10, A11, A12], -1),
        jnp.stack([A20, A21, A22], -1),
    ], -2)
    return inv / det[..., None, None]


def inv3x3_guarded(M, tol: float = 1e12):
    """Adjugate inverse of damped-SPD blocks with a catastrophe gate:
    blocks whose inverse is order-of-magnitude garbage return ZERO.

    Why: for f32-ill-conditioned blocks the adjugate's cofactor
    cancellation produces FINITE garbage (entries wrong by orders of
    magnitude, often indefinite) — unlike LU, which returns inf/nan that a
    plain isfinite guard catches. In bundle adjustment one such block
    silently corrupts the Schur complement, and the exploded step can mask
    its own cost (all observations invalidated -> masked cost 0 ->
    accepted), NaN-ing the map — the observed TPU stereo failure mode.

    The gate is deliberately VERY permissive: in measurement, even
    inverses with residuals up to ~1e9 still produced useful descent under
    LM accept/reject, and freezing them cost up to 3x ATE on the outlier
    benchmark (their points stop updating while their stale residuals keep
    steering cameras). Only the det-clamp blowup class dies here — exact
    f32 cancellation drives the adjugate determinant to the 1e-20 clamp
    and the 'inverse' to ~1e28 entries / ~1e35 residuals, the kind that
    NaN'ed whole stereo maps in one BA call. The LM active-set accept
    guard in backend/ba.py contains everything milder. Killed blocks:
    non-finite, residual beyond ``tol``, or a non-positive diagonal — a
    true inverse of an SPD block has strictly positive diagonals, so an
    indefinite result is always cancellation garbage regardless of its
    residual magnitude."""
    inv = inv3x3(M)
    eye = jnp.eye(3, dtype=M.dtype)
    resid = jnp.max(jnp.abs(M @ inv - eye), axis=(-2, -1), keepdims=True)
    diag_ok = jnp.all(
        jnp.diagonal(inv, axis1=-2, axis2=-1) > 0.0, axis=-1
    )[..., None, None]
    ok = jnp.isfinite(resid) & (resid <= tol) & diag_ok
    ok = ok & jnp.all(jnp.isfinite(inv), axis=(-2, -1), keepdims=True)
    return jnp.where(ok, inv, 0.0)


def inv6x6_spd(M):
    """Closed-form inverse of batched (..., 6, 6) SPD matrices (damped
    Hessian blocks) via 3x3 block Schur — two adjugate inverses + small
    einsums, no LU."""
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    Ct = M[..., 3:, :3]
    D = M[..., 3:, 3:]
    Ai = inv3x3(A)
    S = D - Ct @ Ai @ B
    Si = inv3x3(S)
    AiB = Ai @ B
    CtAi = Ct @ Ai
    tl = Ai + AiB @ Si @ CtAi
    tr = -AiB @ Si
    bl = -Si @ CtAi
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def solve_spd_6x6(H, b):
    """Solve H x = b for symmetric positive-definite 6x6 H (damped normal
    equations) via 3x3 block Schur: two adjugate inverses + small matmuls,
    no LU, no triangular solves."""
    A = H[:3, :3]
    B = H[:3, 3:]
    D = H[3:, 3:]
    b1, b2 = b[:3], b[3:]
    Ai = inv3x3(A)
    S = D - B.T @ (Ai @ B)
    Si = inv3x3(S)
    x2 = Si @ (b2 - B.T @ (Ai @ b1))
    x1 = Ai @ (b1 - B @ x2)
    return jnp.concatenate([x1, x2])
