"""End-to-end monocular SLAM on a synthetic sequence with exact ground truth.

This is the integration bar the reference never had (SURVEY.md §4: no e2e
tests in the reference tree): frames in → trajectory out → ATE checked.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.frontend import MonoTracker, TrackerConfig, TrackerStatus
from lpslam_tpu.frontend.tracker import TrackerStatus as TS
from lpslam_tpu.kernels.orb import OrbParams
from lpslam_tpu.mapstore import MapConfig
from lpslam_tpu.eval import ate_rmse


@pytest.mark.slow
def test_mono_tracking_synthetic():
    seq = make_sequence(num_frames=40, h=240, w=320, seed=1, motion="orbit", fx=230.0)
    cam = PinholeCamera.make(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2]
    )
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=512, num_levels=3),
        map_cfg=MapConfig(max_keyframes=32, max_landmarks=4096, num_keypoints=512),
    )
    tracker = MonoTracker(cam, cfg)

    statuses = []
    for t in range(len(seq.images)):
        st, pose = tracker.process(seq.images[t])
        statuses.append(int(st))

    # must initialize within the first frames and track most of the sequence
    n_tracking = sum(1 for s in statuses if s == TS.TRACKING)
    assert n_tracking > 0.6 * len(statuses), statuses

    # ATE (Sim3-aligned; mono scale is a gauge freedom)
    est, gt = [], []
    for (fid, pose, st) in tracker.trajectory:
        if pose is None:
            continue
        # trajectory stores Tcw; camera center = -R^T t
        c = -pose.R.T @ pose.t
        est.append(c)
        gt.append(np.asarray(seq.poses_wc[fid].t))
    est = np.asarray(est)
    gt = np.asarray(gt)
    assert len(est) >= 20
    rmse, _ = ate_rmse(est, gt)
    # ground-truth excursion is ~1m; a working tracker lands well under 10cm
    assert rmse < 0.10, rmse
