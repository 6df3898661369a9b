"""Pose-uncertainty propagation (Space.h:33-163 value+sigma parity):
pose_opt derives sigmas from the inlier covariance; they flow through
TrackerResult -> ResultQueueEntry -> reconstruction callback -> recording."""
import numpy as np
import pytest

import jax.numpy as jnp


def _synth_pose_problem(n_obs, noise=0.5, seed=0):
    from lpslam_tpu.geometry import PinholeCamera
    from lpslam_tpu.geometry.se3 import SE3

    rng = np.random.default_rng(seed)
    cam = PinholeCamera.make(230.0, 230.0, 160.0, 120.0)
    p_w = rng.uniform([-3, -2, 2.0], [3, 2, 8.0], (n_obs, 3)).astype(np.float32)
    pose = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    uv = np.stack([
        230.0 * p_w[:, 0] / p_w[:, 2] + 160.0,
        230.0 * p_w[:, 1] / p_w[:, 2] + 120.0,
    ], -1) + rng.normal(0, noise, (n_obs, 2))
    return cam, pose, jnp.asarray(p_w), jnp.asarray(uv.astype(np.float32))


class TestPoseOptSigma:
    def test_sigma_finite_and_scales_with_observations(self):
        from lpslam_tpu.frontend.pose_opt import pose_only_optimize

        sigmas = {}
        for n in (30, 300):
            cam, pose, p_w, uv = _synth_pose_problem(n)
            res = pose_only_optimize(
                pose, cam, p_w, uv, jnp.ones(n, bool), iters=6
            )
            sp = np.asarray(res.sigma_pos)
            assert np.all(np.isfinite(sp)) and np.all(sp > 0)
            assert np.isfinite(float(res.sigma_rot)) and float(res.sigma_rot) > 0
            sigmas[n] = sp.mean()
        # 10x the observations -> roughly sqrt(10)x smaller sigma
        assert sigmas[300] < 0.6 * sigmas[30], sigmas

    def test_sigma_scales_with_noise(self):
        from lpslam_tpu.frontend.pose_opt import pose_only_optimize

        out = {}
        for noise in (0.3, 3.0):
            cam, pose, p_w, uv = _synth_pose_problem(200, noise=noise)
            res = pose_only_optimize(
                pose, cam, p_w, uv, jnp.ones(200, bool), iters=6
            )
            out[noise] = float(np.asarray(res.sigma_pos).mean())
        assert out[3.0] > 2.0 * out[0.3], out


class TestSigmaPipelinePropagation:
    def test_result_queue_and_recording_roundtrip(self, tmp_path):
        """TrackerResult sigmas must reach the reconstruction callback and
        survive the proto recording round trip (RecordEngine.cpp:36-45)."""
        from types import SimpleNamespace
        from lpslam_tpu.pipeline.manager import SlamManager
        from lpslam_tpu.pipeline.queues import CameraQueueEntry
        from lpslam_tpu.io import lpslam_pb as pb

        sig = np.array([0.01, 0.02, 0.03])

        class FakeTracker:
            def start(self, sensor_queue=None):
                pass

            def stop(self):
                pass

            def process_image(self, entry, nav_odom, nav_map, sensor_values):
                return [SimpleNamespace(
                    timestamp=entry.timestamp,
                    position=np.asarray([1.0, 2.0, 3.0]),
                    orientation_wxyz=np.asarray([1.0, 0, 0, 0]),
                    valid=True,
                    position_sigma=sig,
                    orientation_sigma=0.05,
                )]

        rec_path = str(tmp_path / "rec.lpslam")
        mgr = SlamManager()
        mgr.trackers.append(FakeTracker())
        mgr.recorder.set_output_file(rec_path)
        mgr.recorder.start()
        mgr._record_enabled = True
        mgr.camera_queue.push(CameraQueueEntry(
            timestamp=1.0, image=np.zeros((16, 16), np.float32)))
        mgr._work(None)
        res = mgr.result_queue.pop(timeout=1.0)
        np.testing.assert_allclose(res.position_sigma, sig)
        assert res.orientation_sigma == 0.05
        mgr.recorder.stop()

        results = [m for kind, m in pb.ProtoStreamReader(rec_path)
                   if kind == pb.MSG_RESULT]
        assert len(results) == 1
        p = results[0].state.position
        np.testing.assert_allclose(
            [p.x_sigma, p.y_sigma, p.z_sigma], sig)
        assert results[0].state.orientation.sigma == pytest.approx(0.05)
