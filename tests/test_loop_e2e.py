"""Loop-closure end-to-end: a closed-orbit synthetic sequence must produce a
verified loop detection (BoW query + Sim3 inliers) and keep the map finite
and consistent after pose-graph correction (BASELINE config 4 capability)."""
import numpy as np
import pytest

import jax.numpy as jnp

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.frontend import MonoTracker, TrackerConfig
from lpslam_tpu.frontend.tracker import TrackerStatus
from lpslam_tpu.kernels.orb import OrbParams
from lpslam_tpu.mapstore import MapConfig
from lpslam_tpu.loop import train_vocabulary, LoopCloser, LoopConfig
from lpslam_tpu.eval import ate_rmse


@pytest.mark.slow
def test_loop_detection_on_closed_orbit():
    # 50-frame closed orbit: the view at the end revisits the start
    seq = make_sequence(num_frames=50, h=240, w=320, seed=4, motion="orbit", fx=230.0)
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=512, num_levels=3),
        map_cfg=MapConfig(max_keyframes=32, max_landmarks=8192, num_keypoints=512),
    )
    tr = MonoTracker(cam, cfg)

    closer = None
    added = 0
    detections = []
    for t in range(len(seq.images)):
        tr.process(seq.images[t])
        nk = tr.n_keyframes
        if closer is None and nk >= 3:
            m = tr.map
            desc = np.asarray(m.kf_desc[:nk]).reshape(-1, 8)
            valid = np.asarray(m.kf_kp_valid[:nk]).reshape(-1)
            vocab = train_vocabulary(desc[valid][:4096], n_words=256, iters=5)
            # consistency=1: this 50-frame toy orbit has only ~1 keyframe in
            # revisited territory — the multi-keyframe consistency gate is
            # exercised separately (test_loop.py::test_consistency_gate)
            closer = LoopCloser(vocab, cfg.map_cfg.max_keyframes,
                                LoopConfig(min_gap=6, min_score=0.12,
                                           consistency=1))
            for k in range(nk):
                closer.add_keyframe(m, k)
            added = nk
        elif closer is not None and nk > added:
            for k in range(added, nk):
                closer.add_keyframe(tr.map, k)
                new_map, res = closer.try_close(tr.map, k)
                if res.detected:
                    detections.append((k, res))
                    tr.map = new_map
                    from lpslam_tpu.geometry.se3 import SE3

                    kk = tr.map.n_kf - 1
                    tr.pose = SE3(tr.map.kf_R[kk], tr.map.kf_t[kk])
            added = nk

    assert len(detections) >= 1, "no loop closure fired on a closed orbit"
    k, res = detections[0]
    assert res.n_inliers >= 15
    # map must stay finite and usable after correction
    assert np.isfinite(np.asarray(tr.map.lm_pos)).all()
    assert np.isfinite(np.asarray(tr.map.kf_t)).all()

    # trajectory quality after closure: still within a sane ATE
    est, gt = [], []
    for (fid, pose, st) in tr.trajectory:
        if pose is None:
            continue
        est.append(-pose.R.T @ pose.t)
        gt.append(np.asarray(seq.poses_wc[fid].t))
    rmse, _ = ate_rmse(np.asarray(est), np.asarray(gt))
    assert rmse < 0.25, rmse
