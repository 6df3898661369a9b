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

    # The DLT solution is λ[R|t] with λ of either sign; det(M3) = λ³ det(R),
    # so flipping P to make det positive resolves the sign uniquely (the
    # nearest-rotation projection of a NEGATIVE multiple of R would be a
    # 180°-flipped rotation, not −R — the sign must be fixed BEFORE the SVD).
    s = jnp.sign(jnp.linalg.det(P[:, :3]))
    P = P * jnp.where(s == 0, 1.0, s)
    M3 = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M3)
    d = jnp.linalg.det(U @ Vt)  # +1 generically after the sign fix
    R = U @ jnp.diag(jnp.stack([1.0 + 0 * d, 1.0 + 0 * d, d])) @ Vt
    lam = jnp.mean(S)
    t = P[:, 3] / jnp.maximum(lam, 1e-12)
    return SE3(R, t)


def pnp_irls(p_w, uv, valid, cam: PinholeCamera, iters: int = 6,
             huber_px: float = 4.0, n_hypotheses: int = 64,
             inlier_px: float = 6.0):
    """Robust PnP: a batched fixed-shape hypothesis sweep (the TPU-native
    RANSAC — `n_hypotheses` random 8-point DLT solves vmapped in one program,
    scored by reprojection-inlier count) followed by IRLS-weighted DLT polish
    on the winning consensus set. No data-dependent control flow."""
    uv_n = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], -1
    )
    w_valid = valid.astype(jnp.float32)
    n = p_w.shape[0]

    # --- hypothesis sweep: sample valid indices, solve minimal DLTs in vmap
    key = jax.random.PRNGKey(0)
    p = w_valid / jnp.maximum(jnp.sum(w_valid), 1.0)
    idx = jax.random.choice(
        key, n, shape=(n_hypotheses, 8), replace=True, p=p
    )

    def solve_one(sel):
        w = jnp.zeros((n,), jnp.float32).at[sel].add(1.0)
        return pnp_dlt(p_w, uv_n, w)

    hyps = jax.vmap(solve_one)(idx)                         # SE3 batch

    def score_one(R, t):
        p_c = jnp.einsum("ij,nj->ni", R, p_w) + t
        uv_hat = project_pinhole(cam, p_c)
        rn = jnp.linalg.norm(uv_hat - uv, axis=-1)
        inl = valid & (p_c[:, 2] > 1e-3) & (rn < inlier_px)
        return jnp.sum(inl), inl

    scores, inl_sets = jax.vmap(score_one)(hyps.R, hyps.t)
    best = jnp.argmax(scores)
    w0 = w_valid * inl_sets[best].astype(jnp.float32)
    # degenerate guard: if no hypothesis found any consensus, fall back to
    # all valid points (the refinement stage's chi2 gate still protects)
    w0 = jnp.where(jnp.sum(w0) >= 6, w0, w_valid)

    # --- IRLS polish on the consensus set
    def body(w, _):
        T = pnp_dlt(p_w, uv_n, w)
        p_c = jnp.einsum("ij,nj->ni", T.R, p_w) + T.t
        uv_hat = project_pinhole(cam, p_c)
        rn = jnp.linalg.norm(uv_hat - uv, axis=-1)
        w_new = w_valid * jnp.minimum(1.0, huber_px / jnp.maximum(rn, 1e-6))
        w_new = jnp.where(rn < 2.0 * inlier_px, w_new, 0.0)
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
