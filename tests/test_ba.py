"""Bundle adjustment recovery tests (golden: ground-truth synthetic geometry —
the role g2o's own unit tests play for the reference stack)."""
import numpy as np

import jax.numpy as jnp

from lpslam_tpu.geometry import PinholeCamera, se3_exp, se3_apply, project_pinhole
from lpslam_tpu.backend import bundle_adjust, BAProblem

CAM = PinholeCamera.make(460.0, 460.0, 320.0, 240.0)


def build_problem(rng, C=6, P=300, N=300, noise_px=0.4, perturb=True):
    pts = np.stack(
        [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(4, 9, P)], -1
    ).astype(np.float32)
    xis = []
    for c in range(C):
        xis.append([0.15 * c, 0.02 * c, 0.05 * c, 0.01 * c, -0.02 * c, 0.005 * c])
    xis = np.asarray(xis, np.float32)
    T = se3_exp(jnp.asarray(xis))
    R_gt = np.asarray(T.R)
    t_gt = np.asarray(T.t)

    obs_lm = np.full((C, N), -1, np.int32)
    obs_uv = np.zeros((C, N, 2), np.float32)
    for c in range(C):
        p_c = pts @ R_gt[c].T + t_gt[c]
        uv = np.stack(
            [460 * p_c[:, 0] / p_c[:, 2] + 320, 460 * p_c[:, 1] / p_c[:, 2] + 240], -1
        )
        sel = rng.permutation(P)[: int(0.8 * N)]
        obs_lm[c, : len(sel)] = sel
        obs_uv[c, : len(sel)] = uv[sel] + rng.normal(0, noise_px, (len(sel), 2))

    R0, t0, pts0 = R_gt.copy(), t_gt.copy(), pts.copy()
    if perturb:
        for c in range(2, C):
            dxi = rng.normal(0, 0.01, 6).astype(np.float32)
            dT = se3_exp(jnp.asarray(dxi))
            R0[c] = np.asarray(dT.R) @ R0[c]
            t0[c] = np.asarray(dT.R) @ t0[c] + np.asarray(dT.t)
        pts0 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)

    prob = BAProblem(
        cam_R=jnp.asarray(R0),
        cam_t=jnp.asarray(t0),
        points=jnp.asarray(pts0),
        obs_lm=jnp.asarray(obs_lm),
        obs_uv=jnp.asarray(obs_uv),
        obs_sigma2=jnp.ones((C, N), jnp.float32),
        cam_fixed=jnp.asarray([c < 2 for c in range(C)]),
        point_valid=jnp.ones((P,), bool),
    )
    return prob, R_gt, t_gt, pts


def test_ba_converges_to_ground_truth():
    rng = np.random.default_rng(11)
    prob, R_gt, t_gt, pts_gt = build_problem(rng)
    res = bundle_adjust(prob, CAM, iters=12)
    assert float(res.final_cost) < float(res.initial_cost) * 0.05
    # camera error after BA
    for c in range(2, 6):
        dt = np.linalg.norm(np.asarray(res.cam_t[c]) - t_gt[c])
        assert dt < 5e-3, (c, dt)
    # the noise floor: 0.4px observation noise at fx=460, depth ~6, total
    # baseline ~0.75 puts per-point uncertainty at ~0.04 — demand we sit near
    # it rather than at the (unreachable) zero
    perr = np.linalg.norm(np.asarray(res.points) - pts_gt, axis=1)
    assert np.median(perr) < 7e-2


def test_ba_fixed_cameras_stay():
    rng = np.random.default_rng(12)
    prob, R_gt, t_gt, _ = build_problem(rng)
    res = bundle_adjust(prob, CAM, iters=8)
    np.testing.assert_allclose(np.asarray(res.cam_t[:2]), t_gt[:2], atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.cam_R[:2]), R_gt[:2], atol=1e-7)


def test_ba_robust_to_outliers():
    rng = np.random.default_rng(13)
    prob, R_gt, t_gt, pts_gt = build_problem(rng)
    uv = np.asarray(prob.obs_uv)
    mask = rng.random(uv.shape[:2]) < 0.1
    uv = uv + mask[..., None] * rng.uniform(30, 90, uv.shape)
    prob = prob._replace(obs_uv=jnp.asarray(uv.astype(np.float32)))
    # outliers need a converged phase-1 before the chi2 cull bites, and the
    # final phase needs enough iterations after the last re-gate: at 20
    # total (stage split 6/6/8) phase 3 is visibly under-converged
    # (~0.024 cam error); at 30 (10/10/10) errors sit at the noise floor
    res = bundle_adjust(prob, CAM, iters=30)
    for c in range(2, 6):
        dt = np.linalg.norm(np.asarray(res.cam_t[c]) - t_gt[c])
        assert dt < 2e-2, (c, dt)


def test_ba_cg_matches_dense():
    """The matrix-free Schur-CG path must converge to the dense path's
    solution on the same problem (identical staged culling; CG solves the
    camera system iteratively, so costs agree to a small tolerance)."""
    from lpslam_tpu.backend.ba import bundle_adjust_cg

    rng = np.random.default_rng(21)
    prob, R_gt, t_gt, pts_gt = build_problem(rng)
    dense = bundle_adjust(prob, CAM, iters=12)
    cg = bundle_adjust_cg(prob, CAM, iters=12, cg_iters=24)
    assert float(cg.final_cost) < float(cg.initial_cost) * 0.05
    assert float(cg.final_cost) < float(dense.final_cost) * 1.01 + 1e-3
    # both reach the same optimum (up to the inexact CG camera solve)
    for c in range(2, 6):
        dt = np.linalg.norm(np.asarray(cg.cam_t[c]) - np.asarray(dense.cam_t[c]))
        assert dt < 1e-3, (c, dt)
    np.testing.assert_allclose(np.asarray(cg.cam_t[:2]), t_gt[:2], atol=1e-7)


def test_global_ba_product_capacity_is_memory_safe():
    """global_ba at the product MapConfig (128 kf x 24576 landmarks x 1200
    keypoints) must route to the Schur-CG formulation: no (C,P,6,3) dense
    coupling and no (C,N,P) one-hot may appear anywhere in the lowered
    program (the dense forms are ~226 MB and ~15 GB there)."""
    import jax
    from lpslam_tpu.backend.ba import global_ba
    from lpslam_tpu.mapstore import MapConfig
    from lpslam_tpu.mapstore.store import empty_map

    m = empty_map(MapConfig(max_keyframes=128, max_landmarks=24576,
                            num_keypoints=1200))
    lowered = jax.jit(
        global_ba, static_argnames=("iters",)
    ).lower(m, CAM, iters=2)
    hlo = lowered.as_text()
    C, P, N = 128, 24576, 1200
    assert f"{C},{P},6,3" not in hlo.replace(" ", "")
    assert f"{C},{N},{P}" not in hlo.replace(" ", "")


def test_ill_conditioned_point_blocks_cannot_poison_ba():
    """Regression for the TPU stereo map NaN explosion: an f32-singular
    block drives the adjugate determinant into its 1e-20 clamp, producing
    an 'inverse' with ~1e28 entries that is FINITE (so an isfinite guard
    passes it) and poisons the Schur complement. The gate must zero
    exactly that class while passing healthy blocks through accurately."""
    from lpslam_tpu.kernels.linalg import inv3x3, inv3x3_guarded

    # deterministic disaster block: rank-2 in f32 (1e8+1 rounds to 1e8),
    # so the f32 determinant cancels to exactly 0 -> det clamp -> blowup
    bad = jnp.asarray([
        [1e8, 1e8, 0.0],
        [1e8, 1e8 + 1.0, 0.0],
        [0.0, 0.0, 1.0],
    ], jnp.float32)
    good = jnp.asarray([
        [4.0, 1.0, 0.0],
        [1.0, 3.0, 0.5],
        [0.0, 0.5, 2.0],
    ], jnp.float32)
    M = jnp.stack([bad, good])
    raw = np.asarray(inv3x3(M))
    # the unguarded adjugate really is finite garbage on the bad block
    assert np.isfinite(raw[0]).all()
    assert np.abs(np.asarray(M[0]) @ raw[0] - np.eye(3)).max() > 1e12
    out = np.asarray(inv3x3_guarded(M))
    np.testing.assert_array_equal(out[0], 0.0)       # disaster block frozen
    np.testing.assert_allclose(                       # healthy block exact
        np.asarray(M[1]) @ out[1], np.eye(3), atol=1e-5
    )
