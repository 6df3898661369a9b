"""Relocalization: BoW candidates → 2D–3D matches → robust PnP → pose refine.

Reference capability: the engine's relocalizer — after tracking loss, query
the BoW keyframe database for candidates, solve a PnP pose from descriptor
matches (EPnP + RANSAC in the engine), refine with pose-only optimization and
accept on an inlier gate; driven by `relocalize_with_nav_data` /
`time_to_relocalize` config (/root/reference/src/Trackers/
OpenVSLAMTrackerBase.cpp:205-211 and the engine's relocalizer module).

TPU-native design: the candidate loop is the only host decision; everything
inside an attempt is one jitted static-shape program. The engine's
RANSAC-over-minimal-sets is replaced with an IRLS-weighted DLT PnP (iterative
reweighting suppresses outliers without data-dependent control flow) followed
by the same chi²-gated Gauss-Newton pose refinement the tracker uses.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera, project_pinhole
from ..kernels.match import match_mutual_nn
from ..mapstore.store import MapStore
from .pose_opt import pose_only_optimize, CHI2_2D


def pnp_dlt(p_w, uv_n, w):
    """Weighted DLT PnP: solve λ[R|t] from 3D points and normalized image
    coordinates, returning an orthonormalized SE3.

    p_w: (N, 3) world points; uv_n: (N, 2) normalized coords ((u−cx)/fx);
    w: (N,) nonneg weights (0 = ignore). Needs ≥ 6 effective points.
    """
    X = p_w
    one = jnp.ones_like(X[:, :1])
    zero4 = jnp.zeros((X.shape[0], 4), X.dtype)
    Xh = jnp.concatenate([X, one], -1)                      # (N, 4)
    x, y = uv_n[:, 0:1], uv_n[:, 1:2]
    r1 = jnp.concatenate([Xh, zero4, -x * Xh], -1)          # (N, 12)
    r2 = jnp.concatenate([zero4, Xh, -y * Xh], -1)
    A = jnp.concatenate([r1, r2], 0)                        # (2N, 12)
    ww = jnp.concatenate([w, w], 0)
    AtA = jnp.einsum("ni,n,nj->ij", A, ww, A)
    _, vecs = jnp.linalg.eigh(AtA)
    v = vecs[:, 0]                                          # smallest eigval
    P = v.reshape(3, 4)

    def extract(Pm):
        M3 = Pm[:, :3]
        U, S, Vt = jnp.linalg.svd(M3)
        d = jnp.linalg.det(U @ Vt)
        R = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0], M3.dtype) * jnp.array([1.0, 1.0, d])) @ Vt
        lam = jnp.mean(S)
        t = Pm[:, 3] / jnp.maximum(lam, 1e-12) * d
        # d folds the det sign into t so that λ [R|t] ≈ P consistently
        return SE3(R, t)

    Tp = extract(P)
    Tm = extract(-P)

    def depth_score(T):
        z = (jnp.einsum("ij,nj->ni", T.R, p_w) + T.t)[:, 2]
        return jnp.sum(jnp.where(w > 0, (z > 0).astype(jnp.float32), 0.0))

    use_p = depth_score(Tp) >= depth_score(Tm)
    return SE3(
        jnp.where(use_p, Tp.R, Tm.R),
        jnp.where(use_p, Tp.t, Tm.t),
    )


def pnp_irls(p_w, uv, valid, cam: PinholeCamera, iters: int = 6,
             huber_px: float = 4.0):
    """Robust PnP: DLT with iteratively-reweighted geometric residuals (the
    static-shape replacement for RANSAC hypothesis loops)."""
    uv_n = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], -1
    )
    w0 = valid.astype(jnp.float32)

    def body(w, _):
        T = pnp_dlt(p_w, uv_n, w)
        p_c = jnp.einsum("ij,nj->ni", T.R, p_w) + T.t
        uv_hat = project_pinhole(cam, p_c)
        rn = jnp.linalg.norm(uv_hat - uv, axis=-1)
        w_new = w0 * jnp.minimum(1.0, huber_px / jnp.maximum(rn, 1e-6))
        w_new = jnp.where(p_c[:, 2] > 1e-3, w_new, 0.0)
        return w_new, None

    w, _ = jax.lax.scan(body, w0, None, length=iters)
    return pnp_dlt(p_w, uv_n, w)


class RelocResult(NamedTuple):
    pose: SE3
    n_inliers: jnp.ndarray   # () int32
    ok: jnp.ndarray          # () bool


@functools.partial(jax.jit, static_argnames=("min_inliers",))
def relocalize_attempt(
    m: MapStore,
    cam: PinholeCamera,
    desc,
    xy,
    kp_valid,
    kf_id,
    min_inliers: int = 20,
) -> RelocResult:
    """One relocalization attempt against candidate keyframe `kf_id`:
    mutual-NN descriptor matches to the keyframe's landmark-bearing keypoints
    → IRLS-DLT PnP → chi²-gated pose refinement → inlier-count gate."""
    kf_lm = m.kf_lm_idx[kf_id]
    kf_ok = m.kf_kp_valid[kf_id] & (kf_lm >= 0) & m.lm_valid[jnp.maximum(kf_lm, 0)]
    idx, ok = match_mutual_nn(
        desc, m.kf_desc[kf_id], kp_valid, kf_ok, max_distance=64, ratio=0.85
    )
    lm = kf_lm[idx]
    ok = ok & (lm >= 0)
    p_w = m.lm_pos[jnp.maximum(lm, 0)]

    pose0 = pnp_irls(p_w, xy, ok, cam)
    res = pose_only_optimize(
        pose0, cam, p_w, xy, ok, sigma2=jnp.ones_like(xy[:, 0]), iters=8
    )
    good = res.n_inliers >= min_inliers
    return RelocResult(pose=res.pose, n_inliers=res.n_inliers, ok=good)
