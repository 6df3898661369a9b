"""Deterministic replay: the same frame sequence must produce the identical
trajectory twice (SURVEY §7: replay-mode determinism makes ATE regression
tests stable — unlike the reference's thread-racy pipeline)."""
import numpy as np
import pytest

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.frontend import MonoTracker, TrackerConfig
from lpslam_tpu.kernels.orb import OrbParams
from lpslam_tpu.mapstore import MapConfig


def run_once(seq, cam, cfg):
    tr = MonoTracker(cam, cfg)
    poses = []
    for t in range(len(seq.images)):
        st, pose = tr.process(seq.images[t])
        poses.append(None if pose is None else np.asarray(pose.t))
    return poses


@pytest.mark.slow
def test_tracker_is_deterministic():
    seq = make_sequence(num_frames=18, h=240, w=320, seed=9, motion="orbit", fx=230.0)
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=256, num_levels=2),
        map_cfg=MapConfig(max_keyframes=16, max_landmarks=2048, num_keypoints=256),
    )
    a = run_once(seq, cam, cfg)
    b = run_once(seq, cam, cfg)
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        assert (pa is None) == (pb is None)
        if pa is not None:
            np.testing.assert_array_equal(pa, pb)
