"""Record → replay product loop: record a synthetic session to the wire
format, then run SLAM from the recording alone (the reference's de-facto
integration harness, SURVEY.md §4)."""
import time

import numpy as np
import pytest

from lpslam_tpu.pipeline.manager import SlamManager
from lpslam_tpu.pipeline.config import CameraConfig
from lpslam_tpu.pipeline.record import RecordEngine
from lpslam_tpu.pipeline.queues import CameraQueueEntry
from lpslam_tpu.io.synthetic import make_sequence


@pytest.mark.slow
def test_record_then_replay_tracks(tmp_path):
    seq = make_sequence(num_frames=20, h=240, w=320, seed=11, motion="orbit", fx=230.0)
    path = str(tmp_path / "session.pb")

    # record the raw frames (as the pipeline's RecordEngine would)
    rec = RecordEngine(jpeg_quality=95)
    rec.set_output_file(path)
    rec.start()
    for t in range(len(seq.images)):
        rec.store_camera_image(
            CameraQueueEntry(timestamp=t / 20.0, image=seq.images[t])
        )
    time.sleep(0.5)
    rec.stop()

    # fresh pipeline fed only by the recording
    mgr = SlamManager()
    mgr.set_camera_configuration(
        CameraConfig(number=0, fx=float(seq.K[0, 0]), fy=float(seq.K[1, 1]),
                     cx=float(seq.K[0, 2]), cy=float(seq.K[1, 2]))
    )
    src = mgr.add_source_by_name("Replay", {"file": path})
    mgr.add_tracker_by_name("VSLAM", {"mode": "mono", "keypoints": 512,
                                      "max_keyframes": 16, "max_landmarks": 4096})
    results = []
    mgr.on_reconstruction = results.append
    mgr.start()
    t0 = time.time()
    while time.time() - t0 < 240:
        if src.done and mgr.camera_queue.empty():
            break
        time.sleep(0.2)
    time.sleep(1.0)
    st = mgr.get_status()
    mgr.stop()

    assert st.frames_processed >= 18
    n_valid = sum(1 for r in results if r.valid)
    assert n_valid > 8, (st.frames_processed, n_valid, st.localization)
