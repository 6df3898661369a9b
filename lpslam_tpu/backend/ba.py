"""Bundle adjustment: Levenberg–Marquardt with Schur-complement reduction.

This is the TPU-native replacement for g2o's sparse BA (the reference builds
g2o with csparse for exactly this — /root/reference/conan-packages/g2o-conan/
conanfile.py:118-126; the engine runs local BA in its mapping thread and
global BA after loop closure).

Design (dense-block, SURVEY.md §7 "Sparse BA on TPU"):
- Observations live in the MapStore's natural layout: window cameras x
  keypoint slots, each slot naming its landmark (or −1). No sparse indexing
  structures — masks everywhere.
- Per-camera 6x6 and per-landmark 3x3 Hessian blocks are batched einsums /
  segment-sums; the camera-point coupling Hcp is a dense (C, P, 6, 3) scatter
  (C is the small BA window, P the landmark capacity).
- Schur: S = Hcc − Hcp Hpp⁻¹ Hpc contracted with one einsum chain; the
  reduced (6C, 6C) system is solved with dense Cholesky on the MXU; point
  updates back-substitute in closed form (batched 3x3 solves).
- LM damping with accept/reject implemented branch-free (jnp.where on the
  better iterate) — fixed iteration count, one fused XLA program.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3, se3_exp, se3_compose
from ..geometry.so3 import hat
from ..geometry.camera import PinholeCamera
from ..kernels.linalg import inv3x3_guarded

CHI2_2D = 5.991

# Ablation hooks (tools/ablate_ba_robustness.py). The SHIPPED formulation is
# absolute (Levenberg) point-block damping + the permissive inv3x3_guarded
# tol=1e12 catastrophe gate; these env knobs let the ablation re-run the
# full e2e eval under the round-4 alternatives (relative/Marquardt damping,
# tight tol=1e-2 guard) in a fresh process without forking the solver.
# Read once at import; traced into the compiled programs.
_BA_DAMPING = os.environ.get("LPSLAM_BA_DAMPING", "absolute")
_BA_GUARD_TOL = float(os.environ.get("LPSLAM_BA_GUARD_TOL", "1e12"))


def _damp_point_blocks(Hpp, lam):
    """Damped per-landmark 3x3 blocks under the configured formulation."""
    eye3 = jnp.eye(3, dtype=Hpp.dtype)
    if _BA_DAMPING == "relative":
        # Marquardt: scale each diagonal entry by (1 + lam)
        diag = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
        return Hpp + eye3 * (lam * diag + 1e-8)[..., :, None]
    return Hpp + (lam + 1e-8) * eye3


class BAProblem(NamedTuple):
    """Dense masked BA problem.

    cam_R: (C,3,3), cam_t: (C,3) — world->cam poses.
    points: (P,3).
    obs_lm: (C,N) int32 landmark index per camera keypoint slot (−1 = none).
    obs_uv: (C,N,2) pixel measurements.
    obs_sigma2: (C,N) measurement variance (keypoint level scale^2).
    cam_fixed: (C,) bool — cameras held constant (gauge / out-of-window).
    point_valid: (P,) bool.
    """

    cam_R: jnp.ndarray
    cam_t: jnp.ndarray
    points: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_sigma2: jnp.ndarray
    cam_fixed: jnp.ndarray
    point_valid: jnp.ndarray
    # optional (P,) bool: points whose observations constrain CAMERAS but
    # whose positions are held fixed. Depth-sensor-created landmarks with a
    # single observing keyframe live here: their reprojection Hessian is
    # rank-2 (unconstrained along the ray), so letting BA move them destroys
    # the metric depth the sensor measured; they are freed once a second
    # keyframe observes them. (The engine's stereo BA instead adds a u_right
    # residual row — this is the equivalent constraint expressed as a prior.)
    point_fixed: jnp.ndarray = None


class BAResult(NamedTuple):
    cam_R: jnp.ndarray
    cam_t: jnp.ndarray
    points: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    obs_inlier: jnp.ndarray  # (C,N) bool — final chi2 gate


def _project_residuals(cam: PinholeCamera, R, t, points, obs_lm, obs_uv):
    """r, J_cam, J_pt for every (camera, slot) observation. Shapes:
    r (C,N,2), Jc (C,N,2,6), Jp (C,N,2,3), p_c (C,N,3)."""
    p_w = points[jnp.maximum(obs_lm, 0)]          # (C,N,3)
    p_c = jnp.einsum("cij,cnj->cni", R, p_w) + t[:, None, :]
    z = jnp.maximum(p_c[..., 2], 1e-2)
    u = cam.fx * p_c[..., 0] / z + cam.cx
    v = cam.fy * p_c[..., 1] / z + cam.cy
    r = jnp.stack([u, v], -1) - obs_uv

    zinv = 1.0 / z
    zinv2 = zinv * zinv
    x, y = p_c[..., 0], p_c[..., 1]
    zero = jnp.zeros_like(z)
    Jproj = jnp.stack(
        [
            jnp.stack([cam.fx * zinv, zero, -cam.fx * x * zinv2], -1),
            jnp.stack([zero, cam.fy * zinv, -cam.fy * y * zinv2], -1),
        ],
        axis=-2,
    )  # (C,N,2,3)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), p_c.shape + (3,))
    Jse3 = jnp.concatenate([I3, -hat(p_c)], axis=-1)  # (C,N,3,6)
    Jc = jnp.einsum("cnij,cnjk->cnik", Jproj, Jse3)
    Jp = jnp.einsum("cnij,cjk->cnik", Jproj, R)  # d p_c/d p_w = R
    return r, Jc, Jp, p_c


def _cost_and_weights(r, sigma2, active):
    chi2 = jnp.sum(r * r, -1) / sigma2
    rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    delta = jnp.sqrt(CHI2_2D)
    w = jnp.where(rn <= delta, 1.0, delta / rn) / sigma2
    w = jnp.where(active, w, 0.0)
    # Huber cost (so accept/reject uses the same robust objective)
    huber = jnp.where(chi2 <= CHI2_2D, chi2, 2.0 * delta * rn - CHI2_2D)
    cost = jnp.sum(jnp.where(active, huber, 0.0))
    return cost, w


@functools.partial(jax.jit, static_argnames=("iters",))
def bundle_adjust(
    prob: BAProblem,
    cam: PinholeCamera,
    iters: int = 10,
    lm_lambda0: float = 1e-4,
) -> BAResult:
    C, N = prob.obs_lm.shape
    P = prob.points.shape[0]

    # Small problems (local windows) build the landmark-side blocks with a
    # one-hot MXU matmul instead of scatter/segment ops: TPU scatter-adds
    # serialize (~1.8 ms/iter at the window shape) while the equivalent
    # (C,N,P) one-hot contraction is one fused matmul (~0.7 ms for BOTH Hpp
    # and Hcp). The dense one-hot is C*N*P floats AND the dense Schur
    # coupling is (C,P,6,3) floats, so large problems (global BA at product
    # capacity: 128 kf x 24.5k landmarks) route to the matrix-free
    # Schur-CG formulation instead (bundle_adjust_cg) — identical math, no
    # C x P materialization of any kind.
    use_onehot = C * N * P <= (1 << 25)
    if not use_onehot:
        return bundle_adjust_cg(prob, cam, iters=iters, lm_lambda0=lm_lambda0)

    active0 = (prob.obs_lm >= 0) & prob.point_valid[jnp.maximum(prob.obs_lm, 0)]
    # built (and cast) ONCE per call — inside `step` the 118 MB f32 cast
    # would re-materialize every LM iteration under fori_loop
    onehot_f = (prob.obs_lm[:, :, None] ==
                jnp.arange(P, dtype=prob.obs_lm.dtype)[None, None, :]
                ).astype(prob.points.dtype)

    def step(carry, gate):
        R, t, points, lam = carry
        r, Jc, Jp, p_c = _project_residuals(cam, R, t, points, prob.obs_lm, prob.obs_uv)
        active = active0 & gate & (p_c[..., 2] > 1e-2)
        cost, w = _cost_and_weights(r, prob.obs_sigma2, active)
        # zero out jacobians of fixed cameras
        Jc = jnp.where(prob.cam_fixed[:, None, None, None], 0.0, Jc)

        # block builds
        Hcc = jnp.einsum("cnik,cn,cnil->ckl", Jc, w, Jc)            # (C,6,6)
        bc = jnp.einsum("cnik,cn,cni->ck", Jc, w, r)                # (C,6)
        JpTJp = jnp.einsum("cnik,cn,cnil->cnkl", Jp, w, Jp)         # (C,N,3,3)
        bp_terms = jnp.einsum("cnik,cn,cni->cnk", Jp, w, r)         # (C,N,3)
        JcTJp = jnp.einsum("cnik,cn,cnil->cnkl", Jc, w, Jp)         # (C,N,6,3)
        oh = onehot_f                                               # (C,N,P)
        Hpp = jnp.einsum("cnp,cnkl->pkl", oh, JpTJp)
        bp = jnp.einsum("cnp,cnk->pk", oh, bp_terms)
        Hcp = jnp.einsum("cnp,cnkl->cpkl", oh, JcTJp)               # (C,P,6,3)

        # damped point blocks and their inverses. Damping is ABSOLUTE
        # (Levenberg): relative (Marquardt) damping measured 6x worse ATE
        # on the stereo e2e benchmark — it over-damps healthy point updates
        # whose Hessian entries are large (O(fx^2/z^2)*n_obs). The price is
        # f32-hostile conditioning on degenerate blocks; inv3x3_guarded's
        # residual gate freezes exactly those (see kernels/linalg.py), and
        # the active-set accept guard below is the second line of defense.
        # (tools/ablate_ba_robustness.py measures the alternatives e2e.)
        Hpp_d = _damp_point_blocks(Hpp, lam)
        # closed-form adjugate inverse with a residual quality gate
        # (kernels/linalg.py): jnp.linalg.inv lowers to batched LU (~3.8 ms
        # for (4096,3,3) on a v5e — the single largest term of a local-BA
        # iteration). Degenerate blocks freeze to zero — the adjugate's f32
        # cancellation yields FINITE garbage on them that an isfinite
        # check alone does not catch (it NaN'ed whole stereo maps on TPU).
        Hpp_inv = inv3x3_guarded(Hpp_d, tol=_BA_GUARD_TOL)
        # fixed points: zero Hpp_inv = infinite prior on the point, so the
        # Schur term vanishes, cameras see the raw reprojection residuals of
        # the (trusted) point, and the point update is exactly zero
        if prob.point_fixed is not None:
            Hpp_inv = jnp.where(prob.point_fixed[:, None, None], 0.0, Hpp_inv)

        # Schur complement on cameras
        S = jnp.zeros((C, 6, C, 6), r.dtype)
        S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc)
        S = S - jnp.einsum("apij,pjk,bplk->aibl", Hcp, Hpp_inv, Hcp)
        bS = bc - jnp.einsum("apij,pjk,pk->ai", Hcp, Hpp_inv, bp)

        lam_eye = lam * jnp.eye(6 * C, dtype=r.dtype)
        # fixed cameras: identity rows (their delta = 0 since b rows are 0)
        Sm = S.reshape(6 * C, 6 * C) + lam_eye
        fixed_diag = jnp.repeat(prob.cam_fixed, 6)
        Sm = jnp.where(
            fixed_diag[:, None] | fixed_diag[None, :],
            jnp.eye(6 * C, dtype=r.dtype),
            Sm,
        )
        bSm = jnp.where(fixed_diag, 0.0, bS.reshape(-1))
        dc = -jnp.linalg.solve(Sm, bSm).reshape(C, 6)
        dc = jnp.where(prob.cam_fixed[:, None], 0.0, dc)

        # back-substitute points: dp = -Hpp_inv (bp + Hpc dc)
        Hpc_dc = jnp.einsum("apij,ai->pj", Hcp, dc)
        dp = -jnp.einsum("pjk,pk->pj", Hpp_inv, bp + Hpc_dc)
        dp = jnp.where(prob.point_valid[:, None], dp, 0.0)

        # tentative update
        T_new = jax.vmap(lambda R_, t_, d: se3_compose(se3_exp(d), SE3(R_, t_)))(
            R, t, dc
        )
        pts_new = points + dp
        r2, _, _, p_c2 = _project_residuals(
            cam, T_new.R, T_new.t, pts_new, prob.obs_lm, prob.obs_uv
        )
        active2 = active0 & gate & (p_c2[..., 2] > 1e-2)
        cost_new, _ = _cost_and_weights(r2, prob.obs_sigma2, active2)

        # masked cost can only be compared over comparable active sets: a
        # corrupted step that throws points behind the cameras (or NaNs
        # them) "wins" on cost by deleting its own summands while
        # destroying the map. Reject any step that loses over half the
        # active set, and any non-finite cost. (A 2% threshold was tried:
        # it also rejects legitimate large early corrections under heavy
        # outliers and measurably hurt accuracy; half-collapse only ever
        # happens on corrupted steps.) This is the containment layer that
        # lets LM re-damp and recover from a sloppy Hpp block.
        n_act = jnp.sum(active)
        n_act2 = jnp.sum(active2)
        accept = (
            (cost_new < cost)
            & jnp.isfinite(cost_new)
            & (n_act2 * 2 >= n_act)
        )
        R = jnp.where(accept, T_new.R, R)
        t = jnp.where(accept, T_new.t, t)
        points = jnp.where(accept, pts_new, points)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-6, 1e3)
        return (R, t, points, lam)

    return _staged_lm(prob, cam, iters, lm_lambda0, active0, step)


def _staged_lm(prob, cam, iters, lm_lambda0, active0, step):
    """Shared staged-LM driver (the engine's repeated optimize → cull
    rounds): every observation first (Huber-weighted), then progressively
    tighter hard chi2 culls recomputed from the current estimate. `step` is
    one LM iteration (carry, gate) -> carry."""
    r0, _, _, pc0 = _project_residuals(
        cam, prob.cam_R, prob.cam_t, prob.points, prob.obs_lm, prob.obs_uv
    )
    cost0, _ = _cost_and_weights(
        r0, prob.obs_sigma2, active0 & (pc0[..., 2] > 1e-2)
    )

    n1 = max(iters // 3, 1)
    n2 = max(iters // 3, 1)
    n3 = max(iters - n1 - n2, 1)
    all_obs = jnp.ones_like(active0)
    carry = (prob.cam_R, prob.cam_t, prob.points, jnp.float32(lm_lambda0))
    carry = jax.lax.fori_loop(0, n1, lambda _, c: step(c, all_obs), carry)

    def cull(carry, mult):
        R_, t_, pts_, _ = carry
        r_, _, _, pc_ = _project_residuals(cam, R_, t_, pts_, prob.obs_lm, prob.obs_uv)
        chi = jnp.sum(r_ * r_, -1) / prob.obs_sigma2
        return (chi <= CHI2_2D * mult) & (pc_[..., 2] > 1e-2)

    gate = cull(carry, 4.0)
    # The lambda RESET at each phase boundary is deliberate and measured
    # (round-5 profiling, tools/profile_ba_convergence.py): carrying the
    # adapted lambda across phases converges the window cost much further
    # at iters=8 (35-60% excess -> 11-21%) but HURTS trajectory accuracy —
    # chunked stereo burst ATE 0.331 (carry) / 0.393 (carry with
    # lambda0 floor) vs 0.125 with the reset. Tighter window convergence
    # fits the culled inlier set at the expense of weakly-constrained
    # geometry; the conservative per-phase restart is the ATE optimum.
    carry = (carry[0], carry[1], carry[2], jnp.float32(lm_lambda0))
    carry = jax.lax.fori_loop(0, n2, lambda _, c: step(c, gate), carry)
    gate = gate & cull(carry, 1.5)
    carry = (carry[0], carry[1], carry[2], jnp.float32(lm_lambda0))
    carry = jax.lax.fori_loop(0, n3, lambda _, c: step(c, gate), carry)
    R, t, points, _ = carry

    rf, _, _, pcf = _project_residuals(cam, R, t, points, prob.obs_lm, prob.obs_uv)
    chi2 = jnp.sum(rf * rf, -1) / prob.obs_sigma2
    inlier = active0 & (pcf[..., 2] > 1e-2) & (chi2 <= CHI2_2D)
    costf, _ = _cost_and_weights(rf, prob.obs_sigma2, active0 & (pcf[..., 2] > 1e-2))
    return BAResult(
        cam_R=R, cam_t=t, points=points,
        initial_cost=cost0, final_cost=costf, obs_inlier=inlier,
    )


@functools.partial(jax.jit, static_argnames=("iters", "cg_iters"))
def bundle_adjust_cg(
    prob: BAProblem,
    cam: PinholeCamera,
    iters: int = 10,
    cg_iters: int = 24,
    lm_lambda0: float = 1e-4,
) -> BAResult:
    """Memory-safe bundle adjustment: matrix-free Schur complement + block-
    Jacobi preconditioned conjugate gradients on the camera system.

    Same staged-LM/cull structure and point back-substitution as
    `bundle_adjust`, but NOTHING of size C x P is ever materialized: the
    Schur operator S = Hcc + lam I − Hcp Hpp⁻¹ Hpc is applied
    observation-wise (three (C,N,·) einsums + one segment-sum per matvec).
    This is the single-chip form of dist/sharded_map's distributed
    Schur-CG (g2o's sparse global BA role,
    /root/reference/conan-packages/g2o-conan/conanfile.py:118-126) and the
    path `global_ba` takes at product capacity (128 kf x 24.5k landmarks,
    where the dense coupling alone would be (C,P,6,3) ~ 226 MB plus a
    (C,N,P) one-hot ~ 15 GB).
    """
    C, N = prob.obs_lm.shape
    P = prob.points.shape[0]
    active0 = (prob.obs_lm >= 0) & prob.point_valid[jnp.maximum(prob.obs_lm, 0)]
    flat_lm = jnp.maximum(prob.obs_lm.reshape(-1), 0)
    obs_p = jnp.maximum(prob.obs_lm, 0)                             # (C,N)
    eye6 = jnp.eye(6, dtype=prob.points.dtype)

    def step(carry, gate):
        R, t, points, lam = carry
        r, Jc, Jp, p_c = _project_residuals(cam, R, t, points, prob.obs_lm, prob.obs_uv)
        active = active0 & gate & (p_c[..., 2] > 1e-2)
        cost, w = _cost_and_weights(r, prob.obs_sigma2, active)
        Jc = jnp.where(prob.cam_fixed[:, None, None, None], 0.0, Jc)

        Hcc = jnp.einsum("cnik,cn,cnil->ckl", Jc, w, Jc)            # (C,6,6)
        bc = jnp.einsum("cnik,cn,cni->ck", Jc, w, r)                # (C,6)
        JpTJp = jnp.einsum("cnik,cn,cnil->cnkl", Jp, w, Jp)         # (C,N,3,3)
        bp_terms = jnp.einsum("cnik,cn,cni->cnk", Jp, w, r)         # (C,N,3)
        Hpp = jax.ops.segment_sum(
            JpTJp.reshape(-1, 3, 3), flat_lm, num_segments=P
        )
        bp = jax.ops.segment_sum(
            bp_terms.reshape(-1, 3), flat_lm, num_segments=P
        )

        # absolute damping + guarded inverse — see the dense path's comment
        Hpp_d = _damp_point_blocks(Hpp, lam)
        Hpp_inv = inv3x3_guarded(Hpp_d, tol=_BA_GUARD_TOL)
        if prob.point_fixed is not None:
            Hpp_inv = jnp.where(prob.point_fixed[:, None, None], 0.0, Hpp_inv)

        def hpc_apply(x):
            """(C,6) camera vector -> (P,3) accumulated J_p^T w J_c x."""
            y = jnp.einsum("cnik,ck->cni", Jc, x)                   # (C,N,2)
            z = jnp.einsum("cnik,cn,cni->cnk", Jp, w, y)            # (C,N,3)
            return jax.ops.segment_sum(
                z.reshape(-1, 3), flat_lm, num_segments=P
            )

        def hcp_apply(v):
            """(P,3) point vector -> (C,6) accumulated J_c^T w J_p v."""
            yy = jnp.einsum("cnik,cnk->cni", Jp, v[obs_p])          # (C,N,2)
            return jnp.einsum("cnik,cn,cni->ck", Jc, w, yy)         # (C,6)

        def S_apply(x):
            u = jnp.einsum("pij,pj->pi", Hpp_inv, hpc_apply(x))
            out = jnp.einsum("ckl,cl->ck", Hcc, x) + lam * x - hcp_apply(u)
            # fixed cameras: identity rows
            return jnp.where(prob.cam_fixed[:, None], x, out)

        bS = bc - hcp_apply(jnp.einsum("pij,pj->pi", Hpp_inv, bp))
        b_rhs = jnp.where(prob.cam_fixed[:, None], 0.0, -bS)

        # block-Jacobi preconditioned CG on S dc = -bS
        from ..kernels.linalg import inv6x6_spd

        Mi = inv6x6_spd(Hcc + (lam + 1e-6) * eye6[None])
        # degenerate camera blocks can yield a non-finite adjugate; fall back
        # to identity so CG iterations aren't wasted (mirrors sharded_map)
        Mi = jnp.where(
            jnp.all(jnp.isfinite(Mi), axis=(-2, -1), keepdims=True),
            Mi, eye6[None],
        )
        Mi = jnp.where(prob.cam_fixed[:, None, None], eye6[None], Mi)

        def precond(v):
            return jnp.einsum("cij,cj->ci", Mi, v)

        x0 = jnp.zeros_like(b_rhs)
        res = b_rhs
        z = precond(res)
        p = z
        rz = jnp.vdot(res, z)

        def cg_body(_, st):
            x, res, p, rz = st
            Ap = S_apply(p)
            denom = jnp.vdot(p, Ap)
            alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
            x = x + alpha * p
            res = res - alpha * Ap
            z = precond(res)
            rz_new = jnp.vdot(res, z)
            beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, res, p, rz_new)

        dc, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, res, p, rz)
        )
        dc = jnp.where(prob.cam_fixed[:, None], 0.0, dc)

        # back-substitute points: dp = -Hpp_inv (bp + Hpc dc)
        dp = -jnp.einsum("pjk,pk->pj", Hpp_inv, bp + hpc_apply(dc))
        dp = jnp.where(prob.point_valid[:, None], dp, 0.0)

        T_new = jax.vmap(lambda R_, t_, d: se3_compose(se3_exp(d), SE3(R_, t_)))(
            R, t, dc
        )
        pts_new = points + dp
        r2, _, _, p_c2 = _project_residuals(
            cam, T_new.R, T_new.t, pts_new, prob.obs_lm, prob.obs_uv
        )
        active2 = active0 & gate & (p_c2[..., 2] > 1e-2)
        cost_new, _ = _cost_and_weights(r2, prob.obs_sigma2, active2)

        # masked cost can only be compared over comparable active sets: a
        # corrupted step that throws points behind the cameras (or NaNs
        # them) "wins" on cost by deleting its own summands while
        # destroying the map. Reject any step that loses over half the
        # active set, and any non-finite cost. (A 2% threshold was tried:
        # it also rejects legitimate large early corrections under heavy
        # outliers and measurably hurt accuracy; half-collapse only ever
        # happens on corrupted steps.) This is the containment layer that
        # lets LM re-damp and recover from a sloppy Hpp block.
        n_act = jnp.sum(active)
        n_act2 = jnp.sum(active2)
        accept = (
            (cost_new < cost)
            & jnp.isfinite(cost_new)
            & (n_act2 * 2 >= n_act)
        )
        R = jnp.where(accept, T_new.R, R)
        t = jnp.where(accept, T_new.t, t)
        points = jnp.where(accept, pts_new, points)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-6, 1e3)
        return (R, t, points, lam)

    return _staged_lm(prob, cam, iters, lm_lambda0, active0, step)


# ---------------------------------------------------------------------------
# Local BA over a MapStore window
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("window", "iters", "covisibility"))
def local_ba(m, cam: PinholeCamera, window: int = 6, iters: int = 8,
             covisibility: bool = False):
    """Optimize a window of keyframes + all landmarks they observe.

    covisibility=True swaps the two oldest temporal slots for the two older
    keyframes most covisible with the newest (the engine's covisibility
    neighborhood). The two oldest window cameras are held fixed (pose + scale
    gauge for the monocular case). Returns an updated MapStore.
    """
    return _local_ba_impl(m, cam, window, iters, covisibility)


def _local_ba_impl(m, cam: PinholeCamera, window: int, iters: int,
                   covisibility: bool = False):
    from ..mapstore.store import MapStore

    K = m.kf_R.shape[0]
    P = m.lm_pos.shape[0]
    if covisibility and window >= 4:
        # covisibility window: the newest (window-2) keyframes plus the two
        # OLDER keyframes sharing the most landmarks with the newest one —
        # the reference engine's local BA optimizes exactly such a
        # covisibility neighborhood rather than a purely temporal window.
        n_recent = window - 2
        base = jnp.maximum(m.n_kf - n_recent, 0)
        recent = base + jnp.arange(n_recent)
        newest = jnp.maximum(m.n_kf - 1, 0)
        # landmark membership flags of the newest keyframe
        flags = jnp.zeros((P,), jnp.int32).at[
            jnp.maximum(m.kf_lm_idx[newest], 0)
        ].max((m.kf_lm_idx[newest] >= 0).astype(jnp.int32))
        shared = jnp.sum(
            flags[jnp.maximum(m.kf_lm_idx, 0)] * (m.kf_lm_idx >= 0), axis=1
        )  # (K,)
        kf_ids = jnp.arange(K)
        older = (kf_ids < base) & m.kf_valid
        shared = jnp.where(older, shared, -1)
        top_scores, top2 = jax.lax.top_k(shared, 2)
        top2_valid = top_scores > 0
        win_idx = jnp.clip(jnp.concatenate([top2, recent]), 0, K - 1)
        win_exists = jnp.concatenate([top2_valid, recent < m.n_kf])
        # gauge anchors: the two covisible-older slots when they exist; when
        # they don't (early in a session) fall back to fixing the oldest
        # recent entries so the window never loses its pose/scale anchor
        n_covis = jnp.sum(top2_valid.astype(jnp.int32))
        rank = jnp.arange(window)
        extra_fix = (rank >= 2) & ((rank - 2) < (2 - n_covis))
        cam_fixed = (rank < 2) | extra_fix | ~win_exists
    else:
        # purely temporal window: last `window` keyframe slots
        base = jnp.maximum(m.n_kf - window, 0)
        win_idx = jnp.clip(base + jnp.arange(window), 0, K - 1)
        win_exists = (base + jnp.arange(window)) < m.n_kf
        rank = jnp.arange(window)
        cam_fixed = (rank < 2) | ~win_exists

    cam_R = m.kf_R[win_idx]
    cam_t = m.kf_t[win_idx]
    obs_lm = jnp.where(win_exists[:, None], m.kf_lm_idx[win_idx], -1)
    obs_uv = m.kf_uv[win_idx]
    obs_sigma2 = jnp.ones(obs_lm.shape, jnp.float32)
    # keypoint validity folded into obs_lm (−1 where keypoint invalid/unassoc)
    obs_lm = jnp.where(m.kf_kp_valid[win_idx], obs_lm, -1)

    # --- compress the point axis to the window's own landmarks -------------
    # The window observes at most window*N (usually far fewer distinct)
    # landmarks, but the store capacity P can be 10-100x that; every
    # point-side op in bundle_adjust (Hpp inverses, the (C,P,6,3) Schur
    # coupling) scales with P. Gather the member set into Pw fixed slots
    # first — on a v5e this turns a 237 ms window-6 local BA over a 24.5k
    # store into ~40 ms, with identical results while members <= Pw.
    Pw = min(P, max(_next_pow2(window * m.kf_uv.shape[1] // 2), 1024))
    member = jnp.zeros((P,), bool).at[jnp.maximum(obs_lm.reshape(-1), 0)].max(
        (obs_lm.reshape(-1) >= 0)
    )
    # sort-free stable compaction: a cumsum gives each member its output
    # slot in index order, then ONE scatter builds the selection (a full
    # argsort over the store capacity P costs tens of ms on TPU — the sort
    # was most of local BA's fixed overhead)
    pos = jnp.cumsum(member.astype(jnp.int32)) - 1            # (P,) slot ids
    inv = jnp.where(member, pos, -1).astype(jnp.int32)        # lm -> compact
    inv = jnp.where(inv < Pw, inv, -1)                        # overflow drops
    sel = jnp.zeros((Pw,), jnp.int32).at[
        jnp.where(inv >= 0, inv, Pw)
    ].set(jnp.arange(P, dtype=jnp.int32), mode="drop")        # compact -> lm
    sel_member = jnp.arange(Pw) < jnp.minimum(pos[-1] + 1, Pw)
    obs_lm_c = jnp.where(obs_lm >= 0, inv[jnp.maximum(obs_lm, 0)], -1)

    prob = BAProblem(
        cam_R=cam_R,
        cam_t=cam_t,
        points=m.lm_pos[sel],
        obs_lm=obs_lm_c,
        obs_uv=obs_uv,
        obs_sigma2=obs_sigma2,
        cam_fixed=cam_fixed,
        point_valid=m.lm_valid[sel] & sel_member,
        # single-observation (depth-sensor-created) landmarks are trusted
        # anchors: they constrain window cameras but BA must not slide them
        # along their ray (see BAProblem.point_fixed)
        point_fixed=m.lm_valid[sel] & (m.lm_n_obs[sel] <= 1),
    )
    res = bundle_adjust(prob, cam, iters=iters)

    # scatter the compact points back into the store
    lm_pos = m.lm_pos.at[jnp.where(sel_member, sel, P)].set(
        res.points, mode="drop"
    )

    # write back only existing window slots; non-existing rows scatter to an
    # out-of-bounds index and are dropped (also makes duplicate placeholder
    # indices harmless)
    scatter_idx = jnp.where(win_exists, win_idx, K)
    kf_R = m.kf_R.at[scatter_idx].set(res.cam_R, mode="drop")
    kf_t = m.kf_t.at[scatter_idx].set(res.cam_t, mode="drop")
    return m._replace(kf_R=kf_R, kf_t=kf_t, lm_pos=lm_pos), res


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("iters",))
def global_ba(m, cam: PinholeCamera, iters: int = 10):
    """Full-map bundle adjustment: every keyframe + every landmark (the
    engine's post-loop global BA). Equivalent to local_ba with the window set
    to the whole keyframe capacity; first two keyframes fixed as gauge."""
    window = m.kf_R.shape[0]
    return _local_ba_impl(m, cam, window, iters)
