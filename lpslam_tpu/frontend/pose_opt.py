"""Pose-only optimization (motion-only bundle adjustment).

The capability g2o's pose-only optimizer provides inside the reference engine's
tracking loop (feed_*_frame → track-local-map → optimize current pose;
g2o dependency at /root/reference/conan-packages/g2o-conan/conanfile.py) —
re-designed as a fixed-iteration Gauss-Newton/Levenberg solve over batched
reprojection residuals: all J/H/b contractions are dense einsums over the
fixed keypoint capacity with a validity mask, so the whole solve is one fused
XLA program with a single 6x6 solve per iteration.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3, se3_exp, se3_compose
from ..geometry.so3 import hat
from ..geometry.camera import PinholeCamera, project_pinhole

CHI2_2D = 5.991  # 95% chi-square with 2 dof — the reference engine's gate


class PoseOptResult(NamedTuple):
    pose: SE3              # optimized Tcw
    inlier: jnp.ndarray    # (N,) bool
    n_inliers: jnp.ndarray # () int32
    final_cost: jnp.ndarray
    # pose uncertainty from the final Gauss-Newton information matrix
    # (Space.h:33-163 parity — the reference's Position3/Orientation carry
    # value+sigma pairs; here sigmas come from the inlier covariance):
    # sigma_pos: (3,) world-frame camera-center std-dev [scene units],
    # sigma_rot: () scalar rotation std-dev [rad]
    sigma_pos: jnp.ndarray = None
    sigma_rot: jnp.ndarray = None


def _residuals_jac(pose: SE3, cam: PinholeCamera, p_w, uv):
    p_c = jnp.einsum("ij,nj->ni", pose.R, p_w) + pose.t
    z = jnp.maximum(p_c[:, 2], 1e-6)
    uv_hat = project_pinhole(cam, p_c)
    r = uv_hat - uv  # (N, 2)

    fx, fy = cam.fx, cam.fy
    x, y = p_c[:, 0], p_c[:, 1]
    zinv = 1.0 / z
    zinv2 = zinv * zinv
    # d(uv)/d(p_c): (N, 2, 3)
    Jproj = jnp.stack(
        [
            jnp.stack([fx * zinv, jnp.zeros_like(z), -fx * x * zinv2], -1),
            jnp.stack([jnp.zeros_like(z), fy * zinv, -fy * y * zinv2], -1),
        ],
        axis=-2,
    )
    # d(p_c)/d(xi) for left-mult update exp(xi) ∘ T, xi = [rho, phi]: [I | -hat(p_c)]
    Jse3 = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=p_w.dtype), (p_w.shape[0], 3, 3)),
            -hat(p_c),
        ],
        axis=-1,
    )  # (N, 3, 6)
    J = jnp.einsum("nij,njk->nik", Jproj, Jse3)  # (N, 2, 6)
    behind = p_c[:, 2] <= 0.05
    return r, J, behind


@functools.partial(jax.jit, static_argnames=("iters",))
def pose_only_optimize(
    pose0: SE3,
    cam: PinholeCamera,
    p_w,
    uv,
    valid,
    sigma2=None,
    iters: int = 10,
    damping: float = 1e-3,
) -> PoseOptResult:
    """Optimize Tcw given N landmark positions p_w observed at pixels uv.

    sigma2: per-observation variance (scale^2 of the keypoint level), used to
    normalize the chi-square inlier gate like the reference engine does.
    Outliers are softly excluded per iteration via the chi2 gate and Huber
    weights — and can re-enter, matching the 4-round re-inclusion behavior of
    the engine's pose optimizer.
    """
    n = p_w.shape[0]
    if sigma2 is None:
        sigma2 = jnp.ones((n,), p_w.dtype)

    # annealed chi2 gate: wide at first (a bad pose prior must still pull
    # itself in — mirrors the engine's 4-round optimize/re-gate loop),
    # tightening to the 95% gate by the last iterations.
    anneal = jnp.concatenate(
        [
            jnp.logspace(3.0, 0.0, max(iters - 3, 1), dtype=jnp.float32),
            jnp.ones((min(3, iters),), jnp.float32),
        ]
    )[:iters]

    def body(pose, gate_mult):
        r, J, behind = _residuals_jac(pose, cam, p_w, uv)
        chi2 = jnp.sum(r * r, axis=-1) / sigma2
        ok = valid & ~behind & (chi2 <= CHI2_2D * gate_mult)
        # Huber weights on top of the gate
        rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        delta = jnp.sqrt(CHI2_2D)
        w = jnp.where(rn <= delta, 1.0, delta / rn) / sigma2
        w = jnp.where(ok, w, 0.0)

        H = jnp.einsum("nik,n,nil->kl", J, w, J)
        b = jnp.einsum("nik,n,ni->k", J, w, r)
        H = H + damping * jnp.eye(6, dtype=H.dtype)
        # closed-form SPD solve (3x3 block Schur + adjugate) — the LAPACK
        # LU path costs ~0.1-0.5 ms PER 6x6 solve on TPU, x10 per frame
        from ..kernels.linalg import solve_spd_6x6

        dx = -solve_spd_6x6(H, b)
        new_pose = se3_compose(se3_exp(dx), pose)
        return new_pose, None

    pose, _ = jax.lax.scan(body, pose0, anneal)

    r, J, behind = _residuals_jac(pose, cam, p_w, uv)
    chi2 = jnp.sum(r * r, axis=-1) / sigma2
    inlier = valid & ~behind & (chi2 <= CHI2_2D)
    n_in = jnp.sum(inlier).astype(jnp.int32)
    cost = jnp.sum(jnp.where(inlier, chi2, 0.0))

    # pose covariance: C = s^2 (J^T W J)^-1 at the final inliers, with the
    # reduced chi-square s^2 = cost / (2 n_in - 6) as the residual scale.
    # The twist lives in the Tcw tangent; the camera-center covariance is
    # approximated by rotating the translation block into the world frame
    # (delta_center ~ -R^T delta_t; the rotation-translation coupling is
    # dropped for this summary statistic).
    w_in = jnp.where(inlier, 1.0 / sigma2, 0.0)
    H = jnp.einsum("nik,n,nil->kl", J, w_in, J) + 1e-6 * jnp.eye(6, dtype=r.dtype)
    from ..kernels.linalg import inv6x6_spd

    C = inv6x6_spd(H)
    s2 = cost / jnp.maximum(2.0 * n_in.astype(r.dtype) - 6.0, 1.0)
    C = C * jnp.maximum(s2, 1e-12)
    C_tt = pose.R.T @ C[:3, :3] @ pose.R
    sigma_pos = jnp.sqrt(jnp.maximum(jnp.diagonal(C_tt), 0.0))
    sigma_rot = jnp.sqrt(jnp.maximum(jnp.trace(C[3:, 3:]) / 3.0, 0.0))
    # a frame with too few inliers has no meaningful covariance
    bad = n_in < 6
    sigma_pos = jnp.where(bad, 0.0, sigma_pos)
    sigma_rot = jnp.where(bad, 0.0, sigma_rot)

    return PoseOptResult(
        pose=pose,
        inlier=inlier,
        n_inliers=n_in,
        final_cost=cost,
        sigma_pos=sigma_pos,
        sigma_rot=sigma_rot,
    )
