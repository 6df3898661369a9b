"""Asynchronous loop closing in the pipeline tracker.

The reference engine runs loop detection in a dedicated loop-closing thread
(OpenVSLAMTrackerBase.cpp:238-255 keeps mapping+loop modules running beside
tracking). Here, `VSLAMTracker` submits BoW insert + detect/verify jobs to a
single background worker and applies an accepted verdict later as ONE
compiled dispatch (`loop.detector.correct_loop`), so the keyframe's own frame
never blocks on closure work. These tests pin:
 - async and sync modes both close the loop on a closed orbit, with
   equivalent trajectory quality;
 - verdict keyframe indices are remapped through compactions that land while
   verification is in flight (and dropped if a party was culled).
"""
import numpy as np
import pytest

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.pipeline.queues import CameraQueueEntry
from lpslam_tpu.pipeline.trackers import VSLAMTracker
from lpslam_tpu.loop.detector import LoopConfig, LoopResult, LoopVerdict
from lpslam_tpu.eval import ate_rmse


def _run(seq, loop_async):
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = VSLAMTracker(cam, {
        "mode": "mono", "keypoints": 512, "max_keyframes": 32,
        "max_landmarks": 8192, "loop_closure": True, "loop_async": loop_async,
        # force the lazy self-trained vocabulary (deterministic for this
        # synthetic scene) instead of the shipped asset
        "vocab_file": "/nonexistent/vocab",
    })
    # the 50-frame toy orbit has ~1 keyframe in revisited territory: relax
    # the gates the same way test_loop_e2e does
    tr._loop_cfg = lambda: LoopConfig(min_gap=6, min_score=0.12, consistency=1)
    closed = {"n": 0}
    orig = tr._loop_resync_pose
    def spy():
        closed["n"] += 1
        orig()
    tr._loop_resync_pose = spy

    for t in range(len(seq.images)):
        tr.process_image(CameraQueueEntry(timestamp=float(t) / 20.0,
                                          image=seq.images[t]))
    tr.flush()
    tr.stop()
    return tr, closed["n"]


def _ate(tr, seq):
    est, gt = [], []
    for fid, pose, st in tr.engine.trajectory:
        if pose is None:
            continue
        est.append(-np.asarray(pose.R).T @ np.asarray(pose.t))
        gt.append(np.asarray(seq.poses_wc[fid].t))
    return ate_rmse(np.asarray(est), np.asarray(gt))[0]


@pytest.mark.slow
def test_async_loop_closes_with_sync_quality():
    seq = make_sequence(num_frames=50, h=240, w=320, seed=4, motion="orbit",
                        fx=230.0)
    tr_a, n_async = _run(seq, loop_async=True)
    tr_s, n_sync = _run(seq, loop_async=False)

    assert n_sync >= 1, "sync loop closure did not fire on a closed orbit"
    assert n_async >= 1, "async loop closure did not fire on a closed orbit"
    for tr in (tr_a, tr_s):
        assert np.isfinite(np.asarray(tr.engine.map.lm_pos)).all()
        assert np.isfinite(np.asarray(tr.engine.map.kf_t)).all()
    # both corrected trajectories in the same quality band
    assert _ate(tr_a, seq) < 0.25
    assert _ate(tr_s, seq) < 0.25
    # async resources released
    assert tr_a._loop_exec is None


@pytest.mark.slow
def test_verification_latency_off_the_frame_path(monkeypatch):
    """A slow loop verification must not stall the frames that trigger it:
    with loop_async on, keyframe frames submit the job and return; the
    verdict lands on a later frame (or at flush). Sync mode would pay the
    full verification latency inside process_image on every new keyframe."""
    import time as _time
    from lpslam_tpu.loop.detector import LoopCloser

    DELAY = 2.5
    calls = []
    orig_verify = LoopCloser.verify

    def slow_verify(self, m, k):
        _time.sleep(DELAY)
        calls.append(k)
        return orig_verify(self, m, k)

    monkeypatch.setattr(LoopCloser, "verify", slow_verify)

    seq = make_sequence(num_frames=36, h=240, w=320, seed=4, motion="orbit",
                        fx=230.0)
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])

    def run_once():
        # same shapes as _run() above: every jitted program is already in
        # the process-wide cache from the first test, so warmup is cheap
        tr = VSLAMTracker(cam, {
            "mode": "mono", "keypoints": 512, "max_keyframes": 32,
            "max_landmarks": 8192, "loop_closure": True, "loop_async": True,
            "vocab_file": "/nonexistent/vocab",
        })
        tr._loop_cfg = lambda: LoopConfig(
            min_gap=6, min_score=0.12, consistency=1
        )
        frame_walls = []
        for t in range(len(seq.images)):
            t0 = _time.monotonic()
            tr.process_image(CameraQueueEntry(timestamp=float(t) / 20.0,
                                              image=seq.images[t]))
            frame_walls.append(_time.monotonic() - t0)
        tr.flush()
        tr.stop()
        return frame_walls

    # pass 1 warms every jitted program (XLA compiles take 5-15 s on a cold
    # cache and would otherwise dominate frame walls, hiding whether any
    # REAL verify blocking exists); pass 2 re-runs the identical shapes
    # against the process-wide jit cache and is the one measured
    run_once()
    calls.clear()
    frame_walls = run_once()

    assert len(calls) >= 2, "no verification jobs ran"
    # no frame waited for a verification (generous CPU-noise margin, still
    # far below the injected delay)
    assert max(frame_walls) < DELAY * 0.8, max(frame_walls)


class _ApplySpy:
    def __init__(self):
        self.calls = []

    def apply(self, m, verdict, cam=None):
        self.calls.append(verdict)
        return m, verdict.result


def _bare_tracker():
    cam = PinholeCamera.make(230.0, 230.0, 160.0, 120.0)
    tr = VSLAMTracker(cam, {"mode": "mono", "keypoints": 64,
                            "max_keyframes": 8, "max_landmarks": 256,
                            "loop_closure": True})
    tr._loop_resync_pose = lambda: None
    tr.loop_closer = _ApplySpy()
    return tr


def test_verdict_indices_remap_through_compaction():
    """A compaction that lands while verification is in flight permutes the
    keyframe slots; the verdict's (k_new, candidate) must be translated into
    the new slot layout before the correction is dispatched."""
    tr = _bare_tracker()
    # old slots [0,2,3,5,7] survive, in that order -> new indices 0..4
    tr._loop_perm_log = [(np.array([0, 2, 3, 5, 7]), 5)]
    v = LoopVerdict(LoopResult(True, 2, 50, 20), 7, object())
    assert tr._loop_apply(v, epoch=0) is True
    applied = tr.loop_closer.calls[0]
    assert applied.k_new == 4          # old slot 7 -> new index 4
    assert applied.result.candidate == 1  # old slot 2 -> new index 1


def test_verdict_dropped_when_party_culled():
    tr = _bare_tracker()
    tr._loop_perm_log = [(np.array([0, 1, 3]), 3)]  # slot 2 was culled
    v = LoopVerdict(LoopResult(True, 2, 50, 20), 3, object())
    assert tr._loop_apply(v, epoch=0) is False
    assert tr.loop_closer.calls == []


def test_verdict_epoch_skips_already_seen_perms():
    """Permutations logged BEFORE the verdict was submitted must not be
    re-applied to its indices."""
    tr = _bare_tracker()
    tr._loop_perm_log = [(np.array([1, 2, 3]), 3),   # epoch 0 (already seen)
                         (np.array([0, 2, 1]), 3)]   # epoch 1 (new)
    v = LoopVerdict(LoopResult(True, 1, 50, 20), 2, object())
    assert tr._loop_apply(v, epoch=1) is True
    applied = tr.loop_closer.calls[0]
    assert applied.k_new == 1          # slot 2 -> index 1 under perm[1] only
    assert applied.result.candidate == 2
