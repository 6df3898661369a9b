"""Async mapping: keyframe frames must not stall the tracking loop (the
reference overlaps tracking/mapping/loop threads, OpenVSLAMTrackerBase.cpp:
238-255; here the keyframe pipeline is dispatched and adopted one frame
later). Also checks sync/async produce equivalent trajectories."""
import time

import numpy as np
import pytest

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.frontend.tracker import MonoTracker, TrackerConfig, TrackerStatus as TS
from lpslam_tpu.kernels.orb import OrbParams
from lpslam_tpu.mapstore import MapConfig


def _run(seq, async_mapping, record_times=False):
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=384, num_levels=2),
        map_cfg=MapConfig(max_keyframes=24, max_landmarks=4096, num_keypoints=384),
        async_mapping=async_mapping,
    )
    tr = MonoTracker(cam, cfg)
    times, kf_flags = [], []
    for t in range(len(seq.images)):
        kf_before = tr.last_kf_frame
        t0 = time.perf_counter()
        st, pose = tr.process(seq.images[t])
        # force this frame's tracking outputs only (the state machine already
        # synced n_inliers; this mirrors a consumer reading the pose)
        dt = time.perf_counter() - t0
        times.append(dt)
        kf_flags.append(tr.last_kf_frame != kf_before)
    return tr, np.asarray(times), np.asarray(kf_flags)


@pytest.mark.slow
class TestAsyncMapping:
    def test_keyframe_frames_within_budget(self):
        """With async mapping, a keyframe frame dispatches the mapping chain
        without waiting for it: keyframe frames must stay within a small
        multiple of the median frame time (the r1 design ran mapping inline
        and stalled 5-10x on keyframe frames)."""
        seq = make_sequence(num_frames=60, h=240, w=320, seed=4, motion="orbit")
        tr, times, kf = _run(seq, async_mapping=True)
        assert tr.status == TS.TRACKING
        # skip the compile window: everything up to and including the second
        # keyframe insertion (first triggers pipeline compilation)
        kf_idx = np.flatnonzero(kf)
        assert len(kf_idx) >= 4, "too few keyframes to measure"
        start = kf_idx[1] + 2
        t_meas, kf_meas = times[start:], kf[start:]
        med = float(np.median(t_meas))
        kf_times = t_meas[kf_meas]
        assert len(kf_times) >= 2
        # budget: keyframe frames within 2x the median frame time (allow a
        # single scheduling-noise outlier on the 2-CPU test machine)
        over = np.sum(kf_times > 2.0 * med)
        assert over <= 1, (
            f"keyframe frames stall the loop: {np.sort(kf_times)[::-1][:4]}"
            f" vs median {med:.4f}"
        )

    def test_async_does_not_degrade_accuracy(self):
        """Deferred adoption shifts BA timing by one frame, so trajectories
        are not identical — but accuracy against ground truth must not
        degrade relative to the synchronous pipeline. Two seeds: single
        sequences are sensitive to descriptor-bit-level changes (a hard
        sequence can penalize either timing), so both must stay within
        bound and the AVERAGE must not regress."""
        from lpslam_tpu.eval import ate_rmse

        ates = {True: [], False: []}
        for seed in (3, 7):
            seq = make_sequence(num_frames=40, h=240, w=320, seed=seed,
                                motion="orbit")
            for mode in (True, False):
                tr, _, _ = _run(seq, async_mapping=mode)
                est, gt = [], []
                for f, p, s in tr.trajectory:
                    if p is None:
                        continue
                    est.append(-p.R.T @ p.t)
                    gt.append(np.asarray(seq.poses_wc[f].t))
                assert len(est) > 25
                r, _ = ate_rmse(np.asarray(est), np.asarray(gt), with_scale=True)
                ates[mode].append(float(r))
        for a, s in zip(ates[True], ates[False]):
            assert a <= max(1.8 * s, s + 0.03), ates
        assert np.mean(ates[True]) <= np.mean(ates[False]) + 0.02, ates

    def test_map_consistency_after_async_run(self):
        """After an async run, pending state is drained and the map is
        self-consistent (indices in range, counts exact)."""
        seq = make_sequence(num_frames=40, h=240, w=320, seed=6, motion="orbit")
        tr, _, _ = _run(seq, async_mapping=True)
        nk = tr.n_keyframes  # forces adoption + drain
        m = tr.map if tr._pending_map is None else tr._pending_map[0]
        nl = int(m.n_lm)
        kf_lm = np.asarray(m.kf_lm_idx)[:nk]
        assert kf_lm.max() < nl
        valid = np.asarray(m.lm_valid)
        assert valid[:nl].all() and not valid[nl:].any()
        tr._drain_compact_stats()
        assert tr._kf_count == nk
