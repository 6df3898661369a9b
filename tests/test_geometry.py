"""Geometry golden tests vs scipy / cv2 (the reference validates its transform
math the same way in src/test/TransformationsTest.cpp — pure-math asserts)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsp

from lpslam_tpu.geometry import (
    so3_exp,
    so3_log,
    quat_to_rot,
    rot_to_quat,
    quat_mul,
    se3_exp,
    se3_log,
    se3_compose,
    se3_inverse,
    se3_apply,
    SE3,
    sim3_exp,
    sim3_log,
    sim3_apply,
    sim3_compose,
    sim3_inverse,
    PinholeCamera,
    project_pinhole,
    unproject_pinhole,
    distort_radtan,
    undistort_points_radtan,
    distort_fisheye,
    undistort_points_fisheye,
    lpslam_to_optical,
    optical_to_lpslam,
)


def random_rotvecs(rng, n, scale=2.5, max_norm=None):
    w = (rng.standard_normal((n, 3)) * scale).astype(np.float32)
    if max_norm is not None:
        nrm = np.linalg.norm(w, axis=-1, keepdims=True)
        w = np.where(nrm > max_norm, w * (max_norm / nrm), w)
    return w.astype(np.float32)


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        w = random_rotvecs(rng, 64)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        R_ref = Rsp.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=2e-5)

    def test_log_roundtrip(self, rng):
        # |theta| < pi so the rotation vector is the canonical representative
        w = random_rotvecs(rng, 64, scale=0.9, max_norm=3.0)
        w2 = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(w2, w, atol=5e-5)

    def test_log_large_angle_rotation_equivalent(self, rng):
        # beyond pi the vector wraps, but the rotation must round-trip
        w = random_rotvecs(rng, 64, scale=2.5)
        R = so3_exp(jnp.asarray(w))
        R2 = so3_exp(so3_log(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)

    def test_log_near_zero_and_pi(self):
        for ang in [1e-9, 1e-5, 3.1, 3.14]:
            w = np.asarray([ang, 0.0, 0.0], np.float32)
            w2 = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
            np.testing.assert_allclose(w2, w, atol=1e-4)

    def test_quat_roundtrip(self, rng):
        w = random_rotvecs(rng, 64)
        R = so3_exp(jnp.asarray(w))
        R2 = quat_to_rot(rot_to_quat(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=2e-6)

    def test_quat_vs_scipy(self, rng):
        w = random_rotvecs(rng, 32)
        q = np.asarray(rot_to_quat(so3_exp(jnp.asarray(w))))  # (w,x,y,z)
        q_ref = Rsp.from_rotvec(w).as_quat()  # (x,y,z,w)
        q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)
        sign = np.sign(q_ref[:, :1])
        sign[sign == 0] = 1
        np.testing.assert_allclose(q, q_ref * sign, atol=2e-5)

    def test_quat_mul_matches_rotation_compose(self, rng):
        wa, wb = random_rotvecs(rng, 8), random_rotvecs(rng, 8)
        qa, qb = rot_to_quat(so3_exp(jnp.asarray(wa))), rot_to_quat(so3_exp(jnp.asarray(wb)))
        R_mul = quat_to_rot(quat_mul(qa, qb))
        R_ref = so3_exp(jnp.asarray(wa)) @ so3_exp(jnp.asarray(wb))
        np.testing.assert_allclose(np.asarray(R_mul), np.asarray(R_ref), atol=5e-6)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = (rng.standard_normal((32, 6)) * 1.0).astype(np.float32)
        xi[:, 3:] = random_rotvecs(rng, 32, scale=1.0, max_norm=3.0)
        T = se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_compose_inverse(self, rng):
        xi = (rng.standard_normal((16, 6))).astype(np.float32)
        T = se3_exp(jnp.asarray(xi))
        I = se3_compose(T, se3_inverse(T))
        np.testing.assert_allclose(np.asarray(I.R), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), 0, atol=1e-5)

    def test_apply_matches_matrix(self, rng):
        xi = rng.standard_normal((8, 6)).astype(np.float32)
        p = rng.standard_normal((8, 3)).astype(np.float32)
        T = se3_exp(jnp.asarray(xi))
        out = np.asarray(se3_apply(T, jnp.asarray(p)))
        ref = np.einsum("bij,bj->bi", np.asarray(T.R), p) + np.asarray(T.t)
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = (rng.standard_normal((32, 7)) * 0.8).astype(np.float32)
        S = sim3_exp(jnp.asarray(xi))
        xi2 = np.asarray(sim3_log(S))
        np.testing.assert_allclose(xi2, xi, atol=2e-4)

    def test_exp_log_small(self):
        xi = np.zeros((1, 7), np.float32)
        xi[0, :3] = [0.1, -0.2, 0.3]
        S = sim3_exp(jnp.asarray(xi))
        np.testing.assert_allclose(np.asarray(S.s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sim3_log(S)), xi, atol=1e-5)

    def test_compose_inverse(self, rng):
        xi = (rng.standard_normal((8, 7)) * 0.5).astype(np.float32)
        S = sim3_exp(jnp.asarray(xi))
        I = sim3_compose(S, sim3_inverse(S))
        np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)

    def test_scale_action(self):
        xi = np.zeros((7,), np.float32)
        xi[6] = np.log(2.0)
        S = sim3_exp(jnp.asarray(xi))
        p = jnp.asarray([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(sim3_apply(S, p)), [2.0, 4.0, 6.0], atol=1e-5)


class TestCamera:
    def test_project_unproject(self, rng):
        cam = PinholeCamera.make(458.0, 457.0, 367.2, 248.4)
        p = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        p[:, 2] = rng.uniform(0.5, 10.0, 100)
        uv = project_pinhole(cam, jnp.asarray(p))
        rays = unproject_pinhole(cam, uv, depth=jnp.asarray(p[:, 2]))
        np.testing.assert_allclose(np.asarray(rays), p, rtol=1e-5, atol=1e-4)

    def test_radtan_vs_cv2(self, rng):
        import cv2

        dist = np.asarray([-0.28, 0.07, 1e-4, 2e-5, 0.0], np.float32)
        xy = rng.uniform(-0.5, 0.5, (50, 2)).astype(np.float32)
        ours = np.asarray(distort_radtan(jnp.asarray(xy), jnp.asarray(dist)))
        pts3 = np.concatenate([xy, np.ones((50, 1), np.float32)], axis=1)
        ref, _ = cv2.projectPoints(
            pts3.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), np.eye(3), dist
        )
        np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=1e-5)

    def test_radtan_undistort_roundtrip(self, rng):
        dist = jnp.asarray([-0.28, 0.07, 1e-4, 2e-5, 0.0])
        xy = jnp.asarray(rng.uniform(-0.4, 0.4, (50, 2)).astype(np.float32))
        xy2 = undistort_points_radtan(distort_radtan(xy, dist), dist)
        np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-5)

    def test_fisheye_vs_cv2(self, rng):
        import cv2

        dist = np.asarray([-0.01, 0.02, -0.005, 0.001], np.float32)
        xy = rng.uniform(-0.8, 0.8, (50, 2)).astype(np.float32)
        ours = np.asarray(distort_fisheye(jnp.asarray(xy), jnp.asarray(dist)))
        pts3 = np.concatenate([xy, np.ones((50, 1), np.float32)], axis=1).astype(np.float64)
        ref, _ = cv2.fisheye.projectPoints(
            pts3.reshape(1, -1, 3), np.zeros(3), np.zeros(3), np.eye(3), dist.astype(np.float64)
        )
        np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=1e-4)

    def test_fisheye_undistort_roundtrip(self, rng):
        dist = jnp.asarray([-0.01, 0.02, -0.005, 0.001])
        xy = jnp.asarray(rng.uniform(-0.6, 0.6, (50, 2)).astype(np.float32))
        xy2 = undistort_points_fisheye(distort_fisheye(xy, dist), dist)
        np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-4)


class TestFrames:
    def test_roundtrip(self, rng):
        v = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(optical_to_lpslam(lpslam_to_optical(v))), np.asarray(v)
        )

    def test_convention(self):
        # lpslam (1,0,0) -> optical (0,-1,0): matches the reference's
        # OpenVSLAMVConvert (OpenVSLAMTrackerBase.h:22-33).
        v = jnp.asarray([1.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(lpslam_to_optical(v)), [0.0, -1.0, 0.0])


class TestOmniModel:
    """Mei unified omnidirectional model (reference `omni` camera — whose own
    rectify path is stubbed out; ours is implemented)."""

    def test_undistort_maps_invert_projection(self):
        import jax.numpy as jnp
        from lpslam_tpu.geometry.camera import project_omni, omni_undistort_maps

        rng = np.random.default_rng(0)
        K = np.array([[300.0, 0, 320], [0, 300.0, 240], [0, 0, 1]])
        dist5 = np.array([0.9, -0.2, 0.05, 1e-3, -1e-3])
        H, W = 480, 640
        maps, K_new = omni_undistort_maps(K, dist5, (H, W))

        pts = np.stack(
            [rng.uniform(-1, 1, 200), rng.uniform(-0.7, 0.7, 200),
             np.full(200, 2.0)], -1
        )
        # source (omni) pixel of each point
        md = np.asarray(project_omni(jnp.asarray(pts), float(dist5[0]),
                                     jnp.asarray(dist5[1:5])))
        src = np.stack([K[0, 0] * md[:, 0] + K[0, 2],
                        K[1, 1] * md[:, 1] + K[1, 2]], -1)
        # target (ideal pinhole K_new) pixel
        tgt = np.stack(
            [K_new[0, 0] * pts[:, 0] / pts[:, 2] + K_new[0, 2],
             K_new[1, 1] * pts[:, 1] / pts[:, 2] + K_new[1, 2]], -1)
        ok = ((tgt[:, 0] > 1) & (tgt[:, 0] < W - 2)
              & (tgt[:, 1] > 1) & (tgt[:, 1] < H - 2))
        assert ok.sum() > 100
        # the map at the target pixel must point back at the source pixel
        # (bilinear interp of the map grid at the fractional target coords)
        err = []
        for t, s in zip(tgt[ok], src[ok]):
            x0, y0 = int(t[0]), int(t[1])
            fx, fy = t[0] - x0, t[1] - y0
            m = (maps[y0, x0] * (1 - fx) * (1 - fy)
                 + maps[y0, x0 + 1] * fx * (1 - fy)
                 + maps[y0 + 1, x0] * (1 - fx) * fy
                 + maps[y0 + 1, x0 + 1] * fx * fy)
            err.append(np.linalg.norm(m - s))
        assert np.median(err) < 0.1, np.median(err)
        assert np.max(err) < 1.0, np.max(err)
