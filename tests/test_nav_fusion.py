"""Navigation-state fusion parity (VERDICT item 6).

The reference builds an openvslam navigation_state from odometry on EVERY
feed and the engine uses it as the pose prior
(/root/reference/src/Trackers/OpenVSLAMTracker.cpp:76-120); the stereo
tracker additionally injects reference (ground-truth) poses from the sensor
stream (/root/reference/src/Trackers/OpenVSLAMStereoTracker.cpp:70-104).
These tests cover the lpslam_tpu equivalents:

- VSLAMTracker derives a per-frame prior: absolute from a map-frame state,
  frame-to-frame odometry delta composed on the last pose otherwise.
- Reference-flagged global states are latched as ref_pose.
- A (noisy) nav prior lets the engine survive motion that breaks the
  constant-velocity model, reducing ATE vs no prior.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.geometry.se3 import SE3, se3_compose, se3_inverse
from lpslam_tpu.frontend import MonoTracker, TrackerConfig, TrackerStatus
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.kernels.orb import OrbParams
from lpslam_tpu.mapstore import MapConfig
from lpslam_tpu.pipeline.queues import CameraQueueEntry, SensorQueueEntry
from lpslam_tpu.pipeline.trackers import VSLAMTracker
from lpslam_tpu.eval import ate_rmse


class _StubEngine:
    """Records the nav_prior VSLAMTracker passes to engine.process."""

    def __init__(self):
        self.status = TrackerStatus.TRACKING
        self.pose = SE3(jnp.eye(3), jnp.zeros(3))
        self.mapping_in_flight = False
        self._compactions = []
        self.captured = []
        self.mapping_enabled = True

    def process(self, image, aux=None, nav_prior=None):
        self.captured.append(nav_prior)
        return TrackerStatus.TRACKING, self.pose

    def _drain_compact_stats(self, only_ready=False):
        return []


def _tracker_with_stub():
    cam = PinholeCamera.make(230.0, 230.0, 160.0, 120.0)
    tr = VSLAMTracker(cam, {"loop_closure": False})
    tr.engine = _StubEngine()
    return tr


def _entry(ts=0.0):
    return CameraQueueEntry(
        timestamp=ts, camera_number=0, image=np.zeros((24, 32), np.uint8)
    )


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


class TestNavPriorPlumbing:
    def test_map_state_is_absolute_prior(self):
        tr = _tracker_with_stub()
        pos = np.array([1.0, 2.0, 3.0], np.float32)
        R_wc = _rot_y(0.3)
        tr.process_image(_entry(), nav_odom=None, nav_map=(pos, R_wc))
        prior = tr.engine.captured[-1]
        assert prior is not None
        np.testing.assert_allclose(np.asarray(prior.R), R_wc.T, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(prior.t), -R_wc.T @ pos, atol=1e-5
        )

    def test_odometry_contributes_delta_not_absolute(self):
        tr = _tracker_with_stub()
        # tracker's current pose differs from the odometry world by an
        # arbitrary offset; the delta must still predict correctly
        R0, p0 = _rot_y(0.1), np.array([0.5, 0.0, 0.0], np.float32)
        R1, p1 = _rot_y(0.25), np.array([0.7, 0.1, 0.0], np.float32)
        tr.process_image(_entry(0.0), nav_odom=(p0, R0))
        assert tr.engine.captured[-1] is None  # first odom: no delta yet
        tr.process_image(_entry(0.1), nav_odom=(p1, R1))
        prior = tr.engine.captured[-1]
        assert prior is not None

        def tcw(R_wc, pos):
            return SE3(jnp.asarray(R_wc.T), jnp.asarray(-R_wc.T @ pos))

        expect = se3_compose(
            se3_compose(tcw(R1, p1), se3_inverse(tcw(R0, p0))), tr.engine.pose
        )
        np.testing.assert_allclose(np.asarray(prior.R), np.asarray(expect.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(prior.t), np.asarray(expect.t), atol=1e-5)

    def test_no_delta_when_not_tracking(self):
        tr = _tracker_with_stub()
        tr.engine.status = TrackerStatus.LOST
        tr.process_image(_entry(0.0), nav_odom=(np.zeros(3), np.eye(3)))
        tr.process_image(_entry(0.1), nav_odom=(np.ones(3), np.eye(3)))
        assert tr.engine.captured[-1] is None

    def test_reference_pose_latched(self):
        tr = _tracker_with_stub()
        pos = np.array([4.0, 5.0, 6.0], np.float32)
        sv = SensorQueueEntry(
            timestamp=0.0, kind="global_state", state=(pos, np.eye(3, dtype=np.float32)),
            reference=True,
        )
        sv_plain = SensorQueueEntry(
            timestamp=0.0, kind="global_state",
            state=(np.zeros(3, np.float32), np.eye(3, dtype=np.float32)),
        )
        tr.process_image(_entry(), sensor_values=(sv_plain,))
        assert tr.ref_pose is None
        tr.process_image(_entry(), sensor_values=(sv,))
        assert tr.ref_pose is not None
        np.testing.assert_allclose(tr.ref_pose[0], pos)


@pytest.mark.slow
def test_nav_prior_rescues_discontinuous_motion():
    """A mid-sequence velocity reversal breaks the constant-velocity
    prediction; a noisy odometry-derived prior keeps the tracker locked and
    lowers ATE (VERDICT round-1 item 6 done-condition). RGB-D mode so the
    map scale is metric and the odometry delta applies directly."""
    from lpslam_tpu.frontend.stereo import RGBDTracker

    # back-and-forth sweep with an abrupt reversal: positions go out along x
    # then snap back at 3x the outbound step
    n = 36
    poses = []
    x = 0.0
    for t in range(n):
        # the reversal must be violent enough to break constant-velocity
        # prediction (the round-4 descriptor upgrade made CV survive the
        # old -0.105 jump, which inverted the test's premise)
        vx = 0.035 if t < 24 else -0.7
        x += vx
        poses.append(SE3(np.eye(3, dtype=np.float32),
                         np.array([x, 0.02 * np.sin(0.3 * t), 0.0], np.float32)))
    seq = make_sequence(
        num_frames=n, h=240, w=320, seed=3, fx=230.0, poses=poses, with_depth=True
    )
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=384, num_levels=3),
        map_cfg=MapConfig(max_keyframes=32, max_landmarks=4096, num_keypoints=384),
    )
    rng = np.random.default_rng(0)

    def run(with_prior):
        tracker = RGBDTracker(cam, cfg=cfg, max_depth=20.0)
        for t in range(n):
            prior = None
            if with_prior and tracker.status == TrackerStatus.TRACKING:
                # derive the prior the way the pipeline does: GT delta (noisy
                # odometry) composed onto the tracker's own last pose
                Twc0, Twc1 = poses[t - 1], poses[t]
                d_t = (np.asarray(Twc1.t) - np.asarray(Twc0.t))
                noisy = d_t * (1.0 + rng.normal(0, 0.05)) + rng.normal(0, 0.003, 3)
                delta = SE3(jnp.eye(3), jnp.asarray(-noisy, jnp.float32))
                prior = se3_compose(delta, tracker.pose)
            tracker.process(seq.images[t], aux=seq.depths[t], nav_prior=prior)
        est, gt = [], []
        n_tracking = 0
        for (fid, pose, st) in tracker.trajectory:
            if st == int(TrackerStatus.TRACKING):
                n_tracking += 1
            if pose is None:
                continue
            est.append(-np.asarray(pose.R).T @ np.asarray(pose.t))
            gt.append(np.asarray(seq.poses_wc[fid].t))
        if len(est) < 8:
            return 1e9, n_tracking
        rmse, _ = ate_rmse(np.asarray(est), np.asarray(gt))
        return rmse, n_tracking

    rmse_prior, frames_prior = run(True)
    rmse_cv, frames_cv = run(False)
    assert frames_prior >= frames_cv
    assert rmse_prior < 0.15, rmse_prior
    # prior must help (strictly better, or CV already failed outright)
    assert rmse_prior <= rmse_cv + 1e-6, (rmse_prior, rmse_cv)


def test_two_eye_batched_extraction_matches_sequential():
    """Batched L/R extraction (one compiled program, leading batch dim of 2 —
    the TPU replacement for the reference's std::async eye pair,
    OpenVSLAMStereoTracker.cpp:199-213) must agree with per-eye extraction."""
    from lpslam_tpu.frontend.stereo import _extract_two_eyes
    from lpslam_tpu.kernels.orb import extract_orb

    seq = make_sequence(num_frames=2, h=120, w=160, seed=7, fx=120.0)
    params = OrbParams(num_keypoints=128, num_levels=2)
    left = jnp.asarray(seq.images[0])
    right = jnp.asarray(seq.images[1])
    batched = _extract_two_eyes(jnp.stack([left, right]), params)
    for i, im in enumerate([left, right]):
        single = extract_orb(im, params)
        np.testing.assert_allclose(
            np.asarray(jax_tree_get(batched, i, "xy")), np.asarray(single.xy),
            atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(jax_tree_get(batched, i, "desc")), np.asarray(single.desc)
        )
        np.testing.assert_array_equal(
            np.asarray(jax_tree_get(batched, i, "valid")), np.asarray(single.valid)
        )


def jax_tree_get(feats, i, field):
    return getattr(feats, field)[i]
