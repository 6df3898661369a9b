"""Fault injection: blind the camera mid-sequence and verify loss + recovery
(the reference's BlackoutImage test scenario — frames are zeroed, tracking
must report Lost, then re-acquire when vision returns)."""
import numpy as np
import pytest

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.frontend import MonoTracker, TrackerConfig
from lpslam_tpu.frontend.tracker import TrackerStatus as TS
from lpslam_tpu.kernels.orb import OrbParams
from lpslam_tpu.mapstore import MapConfig


@pytest.mark.slow
def test_blackout_loss_and_recovery():
    seq = make_sequence(num_frames=30, h=240, w=320, seed=12, motion="orbit", fx=230.0)
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=512, num_levels=3),
        map_cfg=MapConfig(max_keyframes=32, max_landmarks=4096, num_keypoints=512),
    )
    tr = MonoTracker(cam, cfg)

    statuses = []
    black = np.zeros_like(seq.images[0])
    for t in range(len(seq.images)):
        # blind frames 12..16 (after the map is established)
        img = black if 12 <= t <= 16 else seq.images[t]
        st, _ = tr.process(img)
        statuses.append(st)

    # tracked before the blackout
    assert TS.TRACKING in statuses[:12]
    # lost during the blackout (no corners at all)
    assert any(s == TS.LOST for s in statuses[12:17]), statuses[12:17]
    # recovered after vision returns (wide-radius LOST rematch against the
    # intact map re-acquires within a few frames)
    assert TS.TRACKING in statuses[18:], statuses[17:]
    # and stays tracking at the end
    assert statuses[-1] == TS.TRACKING or statuses[-2] == TS.TRACKING
