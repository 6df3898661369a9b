"""The chunked device loop as the PRODUCT's frame loop.

Round-2 gap: the fast path (ChunkedTracker) was a separate program from the
parity surface (SlamManager/VSLAMTracker). These tests pin the unification:
the same tracker stage that carries processors/record/callbacks drives the
compiled chunk scan, with per-frame results delivered at chunk boundaries
and trajectories equivalent to the per-frame host path (the reference's hot
loop IS its pipeline, /root/reference/src/Manager/SlamManager.cpp:54-239).
"""
import time

import numpy as np
import pytest

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.pipeline.queues import CameraQueueEntry
from lpslam_tpu.pipeline.trackers import VSLAMTracker
from lpslam_tpu.eval import ate_rmse


def _run_tracker(seq, chunk, keypoints=384, **extra):
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = VSLAMTracker(cam, {
        "mode": "mono", "keypoints": keypoints, "chunk_size": chunk,
        "max_keyframes": 32, "max_landmarks": 4096, **extra,
    })
    results = []
    for t in range(len(seq.images)):
        entry = CameraQueueEntry(timestamp=float(t) / 20.0, image=seq.images[t])
        r = tr.process_image(entry)
        if r is not None:
            results.extend(r)
    results.extend(tr.flush())
    return tr, results


def _traj_ate(tr, seq):
    est, gt = [], []
    for fid, pose, st in tr.engine.trajectory:
        if pose is None:
            continue
        est.append(-np.asarray(pose.R).T @ np.asarray(pose.t))
        gt.append(np.asarray(seq.poses_wc[fid].t))
    return ate_rmse(np.asarray(est), np.asarray(gt), with_scale=True)[0]


@pytest.mark.slow
def test_vslam_tracker_chunked_parity_with_host():
    """The chunked tracker stage must (a) deliver exactly one result per
    frame through the deferred protocol and (b) match the host path's
    trajectory accuracy on the same sequence."""
    seq = make_sequence(num_frames=44, h=240, w=320, seed=1, motion="orbit",
                        fx=230.0)

    host_tr, host_results = _run_tracker(seq, chunk=0)
    chunk_tr, chunk_results = _run_tracker(seq, chunk=8)

    # every frame appears exactly once in the trajectory, in order (host
    # init frames return [] — the manager emits their invalid entries — so
    # the per-frame contract is pinned on the trajectory record)
    fids = [fid for fid, _, _ in chunk_tr.engine.trajectory]
    assert fids == list(range(len(seq.images)))
    ts = [r.timestamp for r in chunk_results]
    assert ts == sorted(ts)

    n_valid_host = sum(r.valid for r in host_results)
    n_valid_chunk = sum(r.valid for r in chunk_results)
    assert n_valid_chunk >= 0.9 * n_valid_host

    ate_host = _traj_ate(host_tr, seq)
    ate_chunk = _traj_ate(chunk_tr, seq)
    # equivalent accuracy: the chunk scan is the same per-frame program in
    # lax.scan form (same matching, pose opt, keyframe policy, per-keyframe
    # local BA)
    assert ate_chunk < max(1.5 * ate_host, ate_host + 0.02), (ate_chunk, ate_host)


@pytest.mark.slow
def test_chunked_deferred_result_protocol():
    """While buffering, process_image returns None (manager must not emit an
    invalid result); at the boundary it returns the whole chunk's results."""
    seq = make_sequence(num_frames=30, h=240, w=320, seed=1, motion="orbit",
                        fx=230.0)
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = VSLAMTracker(cam, {"mode": "mono", "keypoints": 384, "chunk_size": 8,
                            "max_keyframes": 32, "max_landmarks": 4096})
    kinds = []
    for t in range(len(seq.images)):
        entry = CameraQueueEntry(timestamp=float(t), image=seq.images[t])
        r = tr.process_image(entry)
        kinds.append(None if r is None else len(r))
    tail = tr.flush()

    assert any(k is None for k in kinds), "no frame was ever deferred"
    # every chunked frame's result is eventually emitted: deferred (None)
    # frames are covered by boundary emissions plus the final flush
    n_deferred = sum(1 for k in kinds if k is None)
    emitted = sum(k for k in kinds if k) + len(tail)
    assert emitted >= n_deferred
    # and the trajectory records every frame exactly once, in order
    fids = [fid for fid, _, _ in tr.engine.trajectory]
    assert fids == list(range(len(seq.images)))


@pytest.mark.slow
def test_slam_manager_chunked_end_to_end():
    """SlamManager drives the chunked tracker: every source frame yields a
    reconstruction callback (deferred frames excluded from invalid pushes),
    and the pipeline reaches TRACKING through the chunk scan."""
    from lpslam_tpu.pipeline.manager import SlamManager
    from lpslam_tpu.pipeline.config import CameraConfig

    mgr = SlamManager()
    src = mgr.add_source_by_name("Synthetic", {"num_frames": 30, "fps": 200.0})
    K = src.K
    mgr.set_camera_configuration(
        CameraConfig(number=0, fx=float(K[0, 0]), fy=float(K[1, 1]),
                     cx=float(K[0, 2]), cy=float(K[1, 2]))
    )
    mgr.add_tracker_by_name("VSLAM", {
        "mode": "mono", "keypoints": 384, "chunk_size": 8,
        "max_keyframes": 32, "max_landmarks": 4096,
    })
    results = []
    mgr.on_reconstruction = results.append
    mgr.start()
    t0 = time.time()
    while time.time() - t0 < 300:
        if src.done and mgr.camera_queue.empty():
            break
        time.sleep(0.2)
    time.sleep(1.0)
    st = mgr.get_status()
    mgr.stop()  # flushes deferred chunk results through the notify worker
    time.sleep(0.2)

    assert st.error == "", st.error
    assert st.frames_processed >= 25
    # one result per processed frame — chunk deferral must not create
    # phantom invalid entries or drop frames (stop() flushes the tail)
    assert len(results) >= st.frames_processed - 1, (
        len(results), st.frames_processed
    )
    n_valid = sum(1 for r in results if r.valid)
    assert n_valid > 10, (st.frames_processed, n_valid, st.localization)
    assert st.localization == "TRACKING"
