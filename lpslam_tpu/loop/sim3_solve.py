"""Sim3 estimation from 3D-3D landmark correspondences.

The reference engine solves a Sim3 between the current keyframe and a loop
candidate (stock OpenVSLAM loop closing via g2o types_sim3). TPU-native:
weighted Umeyama in closed form (one 3x3 SVD) with IRLS re-weighting for
robustness — fixed iterations, fully batched, jit-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.sim3 import Sim3


def umeyama_sim3(src, dst, w=None):
    """Weighted least-squares Sim3: dst ≈ s R src + t.

    src, dst: (N, 3); w: (N,) weights. Returns Sim3.
    """
    n = src.shape[0]
    if w is None:
        w = jnp.ones((n,), src.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(src * w[:, None], 0) / wsum
    mu_d = jnp.sum(dst * w[:, None], 0) / wsum
    xs = src - mu_s
    xd = dst - mu_d
    cov = (xd * w[:, None]).T @ xs / wsum
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.diag(jnp.asarray([1.0, 1.0, jnp.sign(det)], src.dtype))
    R = U @ S @ Vt
    var_s = jnp.sum(jnp.sum(xs * xs, -1) * w) / wsum
    s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, 1e-12)
    t = mu_d - s * (R @ mu_s)
    return Sim3(R=R, t=t, s=s)


def robust_sim3_from_matches(src, dst, valid, iters: int = 6, sigma: float = 0.1):
    """IRLS Sim3 with Geman-McClure-style weights; returns (Sim3, inlier mask).

    sigma: expected inlier residual scale in map units.
    """
    w = valid.astype(src.dtype)

    def body(w, _):
        S = umeyama_sim3(src, dst, w)
        pred = S.s * (src @ S.R.T) + S.t
        r2 = jnp.sum((pred - dst) ** 2, -1)
        w_new = valid.astype(src.dtype) * (sigma * sigma) / (sigma * sigma + r2)
        return w_new, None

    w, _ = jax.lax.scan(body, w, None, length=iters)
    S = umeyama_sim3(src, dst, w)
    pred = S.s * (src @ S.R.T) + S.t
    r2 = jnp.sum((pred - dst) ** 2, -1)
    inlier = valid & (r2 < (3.0 * sigma) ** 2)
    return S, inlier
