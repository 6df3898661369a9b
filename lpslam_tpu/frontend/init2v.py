"""Two-view monocular initialization via homography.

The reference engine (stock OpenVSLAM initializer) estimates both a homography
and a fundamental matrix with RANSAC and reconstructs from the better model.
This TPU-shaped version estimates a homography with IRLS-weighted DLT (dense,
fixed iterations — no data-dependent sampling loop) and reconstructs (R, t, n)
with the Faugeras–Lustman 8-solution decomposition, disambiguated by batched
cheirality + parallax + reprojection scoring. Planar and near-planar starts
are exactly the regime homography handles; an essential-matrix path can join
later for wide-baseline non-planar starts.

Verified against cv2.findHomography / cv2.decomposeHomographyMat in tests.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera, unproject_pinhole, project_pinhole
from .triangulate import triangulate_midpoint


def homography_dlt(x1, x2, w=None):
    """Weighted DLT: x2 ~ H x1 for normalized image points (N,2).

    Hartley-normalizes both point sets, solves the 2Nx9 system by smallest
    right singular vector, denormalizes. w: (N,) weights (mask) or None.
    """
    n = x1.shape[0]
    if w is None:
        w = jnp.ones((n,), x1.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)

    def normalize(x):
        mean = jnp.sum(x * w[:, None], 0) / wsum
        d = jnp.sqrt(jnp.sum((x - mean) ** 2, -1))
        scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / wsum, 1e-9)
        T = jnp.asarray(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], x.dtype
        )
        T = T.at[0, 0].set(scale).at[1, 1].set(scale)
        T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
        return (x - mean) * scale, T

    p1, T1 = normalize(x1)
    p2, T2 = normalize(x2)

    zeros = jnp.zeros((n, 3), x1.dtype)
    ones = jnp.ones((n,), x1.dtype)
    h1 = jnp.stack([p1[:, 0], p1[:, 1], ones], -1)  # (N,3)
    r1 = jnp.concatenate([zeros, -h1, p2[:, 1:2] * h1], -1)  # (N,9)
    r2 = jnp.concatenate([h1, zeros, -p2[:, 0:1] * h1], -1)
    A = jnp.concatenate([r1 * jnp.sqrt(w)[:, None], r2 * jnp.sqrt(w)[:, None]], 0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Hn = Vt[-1].reshape(3, 3)
    H = jnp.linalg.solve(T2, Hn @ T1)
    return H / H[2, 2]


def homography_irls(x1, x2, valid, iters: int = 6, tau: float = 5e-3):
    """IRLS homography: re-weight by symmetric transfer error (normalized
    coords; tau ~ a few pixels / focal). Fixed iterations — jit-friendly."""
    w = valid.astype(x1.dtype)

    def body(w, _):
        H = homography_dlt(x1, x2, w)
        ones = jnp.ones((x1.shape[0], 1), x1.dtype)
        p1h = jnp.concatenate([x1, ones], -1)
        q = p1h @ H.T
        e = q[:, :2] / jnp.maximum(jnp.abs(q[:, 2:3]), 1e-9) * jnp.sign(q[:, 2:3]) - x2
        err2 = jnp.sum(e * e, -1)
        w_new = valid.astype(x1.dtype) * (tau * tau) / (tau * tau + err2)
        return w_new, H

    w, Hs = jax.lax.scan(body, w, None, length=iters)
    return Hs[-1], w


def decompose_homography(H):
    """Faugeras–Lustman decomposition of a calibrated homography.

    Returns (R (8,3,3), t (8,3), n (8,3)) — all 8 candidate solutions
    (sign ambiguities ε1, ε3 = ±1 x the two d' cases). t is scaled such that
    the plane distance d = 1.
    """
    U, D, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = D[0], D[1], D[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    V = Vt.T

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1a = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / denom, 0.0))
    x3a = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / denom, 0.0))

    Rs, ts, ns = [], [], []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            x1 = e1 * x1a
            x3 = e3 * x3a
            # case d' = +d2
            sin_t = (d1 - d3) * x1 * x3 / d2
            cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / d2
            Rp = jnp.asarray(
                [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], H.dtype
            )
            Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-sin_t)
            Rp = Rp.at[2, 0].set(sin_t).at[2, 2].set(cos_t)
            tp = (d1 - d3) * jnp.stack([x1, jnp.float32(0.0), -x3])
            np_ = jnp.stack([x1, jnp.float32(0.0), x3])
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)
            ns.append(V @ np_)
            # case d' = -d2
            sin_p = (d1 + d3) * x1 * x3 / d2
            cos_p = (d3 * x1 * x1 - d1 * x3 * x3) / d2
            Rn = jnp.zeros((3, 3), H.dtype)
            Rn = Rn.at[0, 0].set(cos_p).at[0, 2].set(sin_p)
            Rn = Rn.at[1, 1].set(-1.0)
            Rn = Rn.at[2, 0].set(sin_p).at[2, 2].set(-cos_p)
            tn = (d1 + d3) * jnp.stack([x1, jnp.float32(0.0), x3])
            Rs.append(s * U @ Rn @ Vt)
            ts.append(U @ tn)
            ns.append(V @ np_)

    return jnp.stack(Rs), jnp.stack(ts), jnp.stack(ns)


class TwoViewInit(NamedTuple):
    ok: jnp.ndarray           # () bool
    T2cw: jnp.ndarray         # SE3 of second view (first is identity), scale |t|=norm
    points: jnp.ndarray       # (N, 3) triangulated world points
    point_ok: jnp.ndarray     # (N,) bool
    n_good: jnp.ndarray       # () int32


@functools.partial(jax.jit, static_argnames=())
def two_view_init_homography(
    cam: PinholeCamera,
    uv1,
    uv2,
    valid,
    min_parallax_cos: float = 0.99995,
    max_reproj_px: float = 4.0,
):
    """Full two-view bootstrap: H-IRLS → decompose → score 8 candidates →
    triangulate with the winner. First camera is the world origin; the
    translation is normalized to |t| = 1 (monocular scale gauge, fixed to
    metric later exactly like the reference's mono mode).

    Returns (TwoViewInit, T2cw: SE3).
    """
    x1 = unproject_pinhole(cam, uv1)[:, :2]
    x2 = unproject_pinhole(cam, uv2)[:, :2]
    H, w_fit = homography_irls(x1, x2, valid)

    # fix the sign of H so that x2^T H x1 > 0 for most correspondences
    ones = jnp.ones((x1.shape[0], 1), x1.dtype)
    p1h = jnp.concatenate([x1, ones], -1)
    p2h = jnp.concatenate([x2, ones], -1)
    sgn = jnp.sign(jnp.sum(jnp.sum(p2h * (p1h @ H.T), -1) * w_fit))
    H = H * sgn

    Rs, ts, _ = decompose_homography(H)

    T1 = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))

    def score(R, t):
        tn = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
        T2 = SE3(R, tn)
        pts, info = triangulate_midpoint(T1, T2, cam, uv1, uv2)
        uv1_hat = project_pinhole(cam, pts)
        p2 = jnp.einsum("ij,nj->ni", T2.R, pts) + T2.t
        uv2_hat = project_pinhole(cam, p2)
        e1 = jnp.sum((uv1_hat - uv1) ** 2, -1)
        e2 = jnp.sum((uv2_hat - uv2) ** 2, -1)
        good = (
            valid
            & (info["z1"] > 0.0)
            & (info["z2"] > 0.0)
            & (info["cos_parallax"] < min_parallax_cos)
            & (e1 < max_reproj_px**2)
            & (e2 < max_reproj_px**2)
        )
        return jnp.sum(good), pts, good

    n_goods, all_pts, all_good = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(n_goods)
    R = Rs[best]
    t = ts[best]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
    n_best = n_goods[best]
    n_valid = jnp.sum(valid)
    ok = (n_best > 50) & (n_best > 0.5 * n_valid)

    return TwoViewInit(
        ok=ok,
        T2cw=jnp.concatenate([R.reshape(-1), t]),
        points=all_pts[best],
        point_ok=all_good[best],
        n_good=n_best.astype(jnp.int32),
    )
