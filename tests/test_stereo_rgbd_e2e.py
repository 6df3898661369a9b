"""Stereo and RGB-D end-to-end tracking on synthetic sequences (BASELINE
configs 2 and 3): metric scale, no mono bootstrap, ATE checked without
scale alignment (depth sensors must recover absolute scale)."""
import numpy as np
import pytest

import jax.numpy as jnp

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.frontend import TrackerConfig
from lpslam_tpu.frontend.stereo import StereoTracker, RGBDTracker
from lpslam_tpu.frontend.tracker import TrackerStatus as TS
from lpslam_tpu.kernels.orb import OrbParams
from lpslam_tpu.mapstore import MapConfig
from lpslam_tpu.eval import ate_rmse


CFG = TrackerConfig(
    orb=OrbParams(num_keypoints=512, num_levels=3),
    map_cfg=MapConfig(max_keyframes=32, max_landmarks=4096, num_keypoints=512),
)


def run_and_eval(tracker, seq, aux_list):
    statuses = []
    for t in range(len(seq.images)):
        st, _ = tracker.process(seq.images[t], aux=aux_list[t])
        statuses.append(int(st))
    est, gt = [], []
    for (fid, pose, st) in tracker.trajectory:
        if pose is None:
            continue
        est.append(-pose.R.T @ pose.t)
        gt.append(np.asarray(seq.poses_wc[fid].t))
    est, gt = np.asarray(est), np.asarray(gt)
    # depth sensors are metric: alignment without scale
    rmse, _ = ate_rmse(est, gt, with_scale=False)
    n_track = sum(1 for s in statuses if s == TS.TRACKING)
    return rmse, n_track, len(statuses), est, gt


@pytest.mark.slow
def test_stereo_tracking_synthetic():
    # baseline chosen so the reference's depth_threshold*baseline cutoff
    # (40*b = 8) comfortably covers the scene plane at z=5
    b = 0.2
    seq = make_sequence(
        num_frames=30, h=240, w=320, seed=2, motion="orbit", fx=230.0,
        stereo_baseline=b,
    )
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = StereoTracker(cam, focal_x_baseline=seq.K[0, 0] * b, cfg=CFG)
    rmse, n_track, n, est, gt = run_and_eval(tr, seq, seq.images_r)
    assert n_track > 0.8 * n, n_track
    # single-plane scenes are the worst case for per-frame stereo pose
    # (lateral translation aliases into rotation until BA accumulates views);
    # bound reflects that — RGB-D (dense exact depth) holds 0.05 below
    assert rmse < 0.15, rmse
    # metric scale check: total path length within 10% of ground truth
    pl_est = np.linalg.norm(np.diff(est, axis=0), axis=1).sum()
    pl_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert abs(pl_est - pl_gt) / pl_gt < 0.15, (pl_est, pl_gt)


@pytest.mark.slow
def test_rgbd_tracking_synthetic():
    seq = make_sequence(
        num_frames=30, h=240, w=320, seed=3, motion="orbit", fx=230.0,
        with_depth=True,
    )
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = RGBDTracker(cam, cfg=CFG, max_depth=20.0)
    rmse, n_track, n, est, gt = run_and_eval(tr, seq, seq.depths)
    assert n_track > 0.8 * n, n_track
    assert rmse < 0.05, rmse
