"""Relocalization: robust PnP (IRLS-DLT), keyframe-candidate attempts with
geometric verification, and post-blackout POSITION accuracy (VERDICT r1 #5:
recovery must be measured in pose error, not just status)."""
import numpy as np
import pytest

import jax.numpy as jnp

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.geometry.se3 import SE3, se3_exp
from lpslam_tpu.frontend.relocalize import pnp_irls, relocalize_attempt
from lpslam_tpu.frontend.tracker import MonoTracker, TrackerConfig, TrackerStatus as TS
from lpslam_tpu.kernels.orb import OrbParams
from lpslam_tpu.mapstore import MapConfig
from lpslam_tpu.io.synthetic import make_sequence


CAM = PinholeCamera.make(300.0, 300.0, 160.0, 120.0)


def _project(T, pts):
    p_c = pts @ np.asarray(T.R).T + np.asarray(T.t)
    return np.stack(
        [300.0 * p_c[:, 0] / p_c[:, 2] + 160.0,
         300.0 * p_c[:, 1] / p_c[:, 2] + 120.0], -1
    ), p_c[:, 2]


class TestPnp:
    def _gt_pose(self, seed):
        rng = np.random.default_rng(seed)
        xi = np.concatenate([rng.uniform(-0.5, 0.5, 3), rng.uniform(-0.3, 0.3, 3)])
        return se3_exp(jnp.asarray(xi, jnp.float32))

    def test_recovers_exact_pose(self):
        rng = np.random.default_rng(0)
        T = self._gt_pose(1)
        pts = np.stack(
            [rng.uniform(-2, 2, 60), rng.uniform(-1.5, 1.5, 60), rng.uniform(4, 8, 60)], -1
        ).astype(np.float32)
        uv, z = _project(T, pts)
        ok = jnp.ones((60,), bool)
        est = pnp_irls(jnp.asarray(pts), jnp.asarray(uv, jnp.float32), ok, CAM)
        np.testing.assert_allclose(np.asarray(est.R), np.asarray(T.R), atol=1e-3)
        np.testing.assert_allclose(np.asarray(est.t), np.asarray(T.t), atol=5e-3)

    def test_robust_to_outliers_and_noise(self):
        rng = np.random.default_rng(2)
        T = self._gt_pose(3)
        n = 120
        pts = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)], -1
        ).astype(np.float32)
        uv, _ = _project(T, pts)
        uv += rng.normal(0, 0.5, uv.shape)           # pixel noise
        n_out = 30                                    # 25% gross outliers
        uv[:n_out] = rng.uniform(0, 320, (n_out, 2))
        est = pnp_irls(jnp.asarray(pts), jnp.asarray(uv, jnp.float32),
                       jnp.ones((n,), bool), CAM)
        # rotation error
        dR = np.asarray(est.R) @ np.asarray(T.R).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.02, ang
        assert np.linalg.norm(np.asarray(est.t) - np.asarray(T.t)) < 0.1

    def test_invalid_points_ignored(self):
        rng = np.random.default_rng(4)
        T = self._gt_pose(5)
        n = 80
        pts = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)], -1
        ).astype(np.float32)
        uv, _ = _project(T, pts)
        uv[40:] = 0.0                                  # garbage, masked out
        valid = jnp.asarray(np.arange(n) < 40)
        est = pnp_irls(jnp.asarray(pts), jnp.asarray(uv, jnp.float32), valid, CAM)
        np.testing.assert_allclose(np.asarray(est.t), np.asarray(T.t), atol=1e-2)


@pytest.mark.slow
class TestRelocalization:
    def _build_tracker(self, seq):
        cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
        cfg = TrackerConfig(
            orb=OrbParams(num_keypoints=512, num_levels=3),
            map_cfg=MapConfig(max_keyframes=32, max_landmarks=4096, num_keypoints=512),
        )
        return MonoTracker(cam, cfg)

    def test_relocalize_from_multiple_map_locations(self):
        """Build a map, then relocalize the source images of >=3 distinct
        keyframes spread across the map; the recovered POSITION must land on
        that keyframe's pose in the current (BA-refined) map."""
        seq = make_sequence(num_frames=30, h=240, w=320, seed=12, motion="orbit", fx=230.0)
        tr = self._build_tracker(seq)
        for t in range(len(seq.images)):
            tr.process(seq.images[t])
        assert tr.status == TS.TRACKING

        m = tr.map
        nk = tr.n_keyframes
        assert nk >= 4
        # three keyframes spread across the session (skip the init pair:
        # their source views have the least-constrained geometry)
        probes = sorted({2, nk // 2, nk - 1})
        assert len(probes) >= 3
        n_ok = 0
        for k in probes:
            fid = int(np.asarray(m.kf_frame_id)[k])
            feats = tr._extract(seq.images[fid])
            tr.status = TS.LOST
            ok = tr.relocalize_with_candidates(feats, list(range(nk)), min_inliers=20)
            assert ok, f"no geometric verification at keyframe {k}"
            center = -np.asarray(tr.pose.R).T @ np.asarray(tr.pose.t)
            kf_center = -np.asarray(m.kf_R[k]).T @ np.asarray(m.kf_t[k])
            err = np.linalg.norm(center - kf_center)
            assert err < 0.05, (k, err)
            n_ok += 1
        assert n_ok >= 3

    def test_blackout_recovery_position_accuracy(self):
        """After a blackout, the recovered pose must be metrically close to
        where the tracker would have been — not merely status=TRACKING."""
        seq = make_sequence(num_frames=34, h=240, w=320, seed=12, motion="orbit", fx=230.0)
        tr = self._build_tracker(seq)
        black = np.zeros_like(seq.images[0])
        recovered_err = None
        for t in range(len(seq.images)):
            img = black if 12 <= t <= 16 else seq.images[t]
            st, pose = tr.process(img)
            if t > 16 and st == TS.TRACKING and recovered_err is None:
                # position error vs a clean reference run at the same frame
                recovered_err = (t, -np.asarray(pose.R).T @ np.asarray(pose.t))
        assert recovered_err is not None, "never recovered"
        t_rec, center = recovered_err

        # clean reference run (no blackout), same seed/sequence
        tr2 = self._build_tracker(seq)
        ref_center = None
        for t in range(t_rec + 1):
            st, pose = tr2.process(seq.images[t])
            if t == t_rec and pose is not None:
                ref_center = -np.asarray(pose.R).T @ np.asarray(pose.t)
        assert ref_center is not None
        err = np.linalg.norm(center - ref_center)
        assert err < 0.1, f"recovered {err:.3f} away from clean-run position"
