"""Pose optimization, triangulation, two-view init — golden + recovery tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from lpslam_tpu.geometry import SE3, se3_exp, se3_apply, PinholeCamera, project_pinhole
from lpslam_tpu.frontend import (
    pose_only_optimize,
    triangulate_midpoint,
    homography_dlt,
    decompose_homography,
    two_view_init_homography,
)

CAM = PinholeCamera.make(460.0, 460.0, 320.0, 240.0)


def make_scene(rng, n=200, planar=False, depth=5.0):
    if planar:
        p = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, depth)], -1
        )
    else:
        p = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(3, 9, n)], -1
        )
    return jnp.asarray(p.astype(np.float32))


class TestPoseOpt:
    def test_recovers_pose_with_noise_and_outliers(self, rng):
        p_w = make_scene(rng, 300)
        xi_true = jnp.asarray([0.1, -0.05, 0.2, 0.03, -0.02, 0.05], jnp.float32)
        T_true = se3_exp(xi_true)
        uv = project_pinhole(CAM, se3_apply(T_true, p_w))
        uv = uv + jnp.asarray(rng.normal(0, 0.5, uv.shape).astype(np.float32))
        # 15% outliers
        out = rng.random(300) < 0.15
        uv = jnp.where(
            jnp.asarray(out)[:, None],
            uv + jnp.asarray(rng.uniform(20, 80, uv.shape).astype(np.float32)),
            uv,
        )
        T0 = se3_exp(xi_true + jnp.asarray([0.05, 0.05, -0.05, 0.02, 0.02, -0.02]))
        res = pose_only_optimize(T0, CAM, p_w, uv, jnp.ones(300, bool))
        assert int(res.n_inliers) > 200
        dt = np.asarray(res.pose.t) - np.asarray(T_true.t)
        dR = np.asarray(res.pose.R) @ np.asarray(T_true.R).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert np.linalg.norm(dt) < 0.01, dt
        assert ang < 0.005, ang

    def test_all_invalid_is_safe(self, rng):
        p_w = make_scene(rng, 50)
        uv = jnp.zeros((50, 2), jnp.float32)
        T0 = se3_exp(jnp.zeros(6))
        res = pose_only_optimize(T0, CAM, p_w, uv, jnp.zeros(50, bool))
        assert int(res.n_inliers) == 0
        assert np.all(np.isfinite(np.asarray(res.pose.t)))


class TestTriangulate:
    def test_recovers_points(self, rng):
        p_w = make_scene(rng, 150)
        T1 = se3_exp(jnp.zeros(6))
        T2 = se3_exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.02, 0.0], jnp.float32))
        uv1 = project_pinhole(CAM, se3_apply(T1, p_w))
        uv2 = project_pinhole(CAM, se3_apply(T2, p_w))
        pts, info = triangulate_midpoint(T1, T2, CAM, uv1, uv2)
        np.testing.assert_allclose(np.asarray(pts), np.asarray(p_w), atol=5e-2)
        assert np.all(np.asarray(info["z1"]) > 0)
        assert np.all(np.asarray(info["z2"]) > 0)


class TestHomography:
    def test_dlt_vs_cv2(self, rng):
        import cv2

        p_w = make_scene(rng, 100, planar=True)
        T2 = se3_exp(jnp.asarray([0.4, 0.1, 0.0, 0.05, -0.1, 0.02], jnp.float32))
        uv1 = project_pinhole(CAM, p_w)
        uv2 = project_pinhole(CAM, se3_apply(T2, p_w))
        H_ours = np.asarray(homography_dlt(uv1, uv2))
        H_cv, _ = cv2.findHomography(np.asarray(uv1), np.asarray(uv2), 0)
        np.testing.assert_allclose(H_ours / H_ours[2, 2], H_cv / H_cv[2, 2], atol=5e-3)

    def test_decompose_contains_truth(self, rng):
        # calibrated homography of plane z=d with normal n: H = R + t n^T / d
        xi = jnp.asarray([0.3, -0.1, 0.05, 0.04, 0.08, -0.03], jnp.float32)
        T = se3_exp(xi)
        d = 5.0
        n = np.array([0.0, 0.0, 1.0], np.float32)  # plane normal in cam1
        H = np.asarray(T.R) + np.outer(np.asarray(T.t) / d, n)
        Rs, ts, ns = decompose_homography(jnp.asarray(H))
        # truth: R, t/d (decomposition scales t by plane distance)
        best = 1e9
        for i in range(8):
            dR = np.asarray(Rs[i]) @ np.asarray(T.R).T
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            dt = np.linalg.norm(np.asarray(ts[i]) - np.asarray(T.t) / d)
            best = min(best, ang + dt)
        assert best < 1e-3, best

    def test_two_view_init_planar(self, rng):
        p_w = make_scene(rng, 300, planar=True)
        xi = jnp.asarray([0.5, 0.15, 0.1, 0.03, -0.1, 0.02], jnp.float32)
        T2 = se3_exp(xi)
        uv1 = project_pinhole(CAM, p_w)
        uv2 = project_pinhole(CAM, se3_apply(T2, p_w))
        res = two_view_init_homography(CAM, uv1, uv2, jnp.ones(300, bool))
        assert bool(res.ok)
        R = np.asarray(res.T2cw[:9]).reshape(3, 3)
        t = np.asarray(res.T2cw[9:])
        dR = R @ np.asarray(T2.R).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.01, ang
        t_true = np.asarray(T2.t) / np.linalg.norm(np.asarray(T2.t))
        assert np.linalg.norm(t - t_true) < 0.05, (t, t_true)
        # triangulated points should match ground truth up to the global scale
        pts = np.asarray(res.points)[np.asarray(res.point_ok)]
        gt = np.asarray(p_w)[np.asarray(res.point_ok)]
        scale = np.linalg.norm(np.asarray(T2.t))
        np.testing.assert_allclose(pts * scale, gt, atol=0.1)
