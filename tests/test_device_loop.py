"""Device-resident chunked tracking loop (frontend/device_loop.py).

The chunk scan must be a faithful batched form of the host per-frame path:
same state machine outcomes, equivalent accuracy, keyframes inserted under
lax.cond inside the compiled program, host state synced from one packed
fetch per chunk.
"""
import numpy as np
import pytest

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.frontend import MonoTracker, TrackerConfig, TrackerStatus
from lpslam_tpu.frontend.device_loop import ChunkedTracker
from lpslam_tpu.kernels.orb import OrbParams
from lpslam_tpu.mapstore import MapConfig
from lpslam_tpu.eval import ate_rmse


def _setup(seq):
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=384, num_levels=2),
        map_cfg=MapConfig(max_keyframes=24, max_landmarks=4096, num_keypoints=384),
    )
    return cam, cfg


@pytest.mark.slow
def test_chunked_matches_per_frame_quality():
    seq = make_sequence(num_frames=36, h=240, w=320, seed=1, motion="orbit",
                        fx=230.0)
    cam, cfg = _setup(seq)

    # host per-frame reference run
    ref = MonoTracker(cam, cfg)
    for t in range(len(seq.images)):
        ref.process(seq.images[t])

    # chunked run: host init, then 8-frame chunks
    eng = MonoTracker(cam, cfg)
    t = 0
    while eng.status != TrackerStatus.TRACKING and t < 12:
        eng.process(seq.images[t])
        t += 1
    assert eng.status == TrackerStatus.TRACKING
    ct = ChunkedTracker(eng)
    t0 = t
    while t + 8 <= len(seq.images):
        ct.process_chunk(np.stack(seq.images[t:t + 8]))
        t += 8
    ct.sync()
    sts, n_inl, pR, pt, kf_ins, sig_p, sig_r = ct.collect()

    assert eng.status == TrackerStatus.TRACKING
    assert (sts == int(TrackerStatus.TRACKING)).mean() > 0.9
    assert kf_ins.sum() >= 2          # keyframes inserted inside the scan
    assert eng._kf_count >= 4         # sync() propagated the device counter
    assert eng.frame_id == t          # host frame counter advanced chunk-wise

    est, gt = [], []
    for i in range(len(sts)):
        if sts[i] != int(TrackerStatus.TRACKING):
            continue
        est.append(-pR[i].T @ pt[i])
        gt.append(np.asarray(seq.poses_wc[t0 + i].t))
    rmse, _ = ate_rmse(np.asarray(est), np.asarray(gt), with_scale=True)
    assert rmse < 0.10, rmse

    # same order of accuracy as the per-frame path on this sequence
    ref_est, ref_gt = [], []
    for fid, pose, st in ref.trajectory:
        if pose is None:
            continue
        ref_est.append(-np.asarray(pose.R).T @ np.asarray(pose.t))
        ref_gt.append(np.asarray(seq.poses_wc[fid].t))
    ref_rmse, _ = ate_rmse(np.asarray(ref_est), np.asarray(ref_gt), with_scale=True)
    assert rmse < max(2.0 * ref_rmse, ref_rmse + 0.03), (rmse, ref_rmse)


def test_chunked_requires_initialization():
    seq = make_sequence(num_frames=4, h=120, w=160, seed=2, fx=120.0)
    cam, cfg = _setup(seq)
    eng = MonoTracker(cam, cfg)
    ct = ChunkedTracker(eng)
    assert not ct.ready
    with pytest.raises(AssertionError):
        ct.process_chunk(np.stack(seq.images[:2]))


def test_collect_empty():
    seq = make_sequence(num_frames=2, h=120, w=160, seed=2, fx=120.0)
    cam, cfg = _setup(seq)
    ct = ChunkedTracker(MonoTracker(cam, cfg))
    sts, n_inl, pR, pt, kf, sig_p, sig_r = ct.collect()
    assert sts.shape == (0,) and pR.shape == (0, 3, 3)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["stereo", "rgbd"])
def test_chunked_depth_modes(mode, scan_ba_interval=None, ate_bound=0.13):
    """Stereo / RGB-D chunk scans: depth-seeded keyframes under lax.cond
    (insert_keyframe_depth + far-point triangulation), metric-scale ATE."""
    from lpslam_tpu.frontend.stereo import StereoTracker, RGBDTracker

    baseline = 0.1
    seq = make_sequence(
        num_frames=28, h=240, w=320, seed=2, motion="orbit", fx=230.0,
        stereo_baseline=baseline if mode == "stereo" else 0.0,
        with_depth=mode == "rgbd",
    )
    cam, cfg = _setup(seq)
    if scan_ba_interval is not None:
        cfg = cfg._replace(scan_ba_min_interval_depth=scan_ba_interval)
    if mode == "stereo":
        eng = StereoTracker(cam, focal_x_baseline=230.0 * baseline, cfg=cfg,
                            depth_threshold=60.0)
        aux = lambda t: seq.images_r[t]
        chunk = lambda a, b: np.stack(
            [np.stack([seq.images[t], seq.images_r[t]]) for t in range(a, b)]
        )
    else:
        eng = RGBDTracker(cam, cfg=cfg, max_depth=20.0)
        aux = lambda t: seq.depths[t]
        chunk = lambda a, b: (
            np.stack(seq.images[a:b]), np.stack(seq.depths[a:b])
        )

    t = 0
    while eng.status != TrackerStatus.TRACKING and t < 6:
        eng.process(seq.images[t], aux=aux(t))
        t += 1
    assert eng.status == TrackerStatus.TRACKING

    ct = ChunkedTracker(eng)
    assert ct.mode == mode
    t0 = t
    while t + 8 <= len(seq.images):
        ct.process_chunk(chunk(t, t + 8))
        t += 8
    ct.sync()
    sts, n_inl, pR, pt, kf_ins, sig_p, sig_r = ct.collect()
    assert (sts == int(TrackerStatus.TRACKING)).mean() > 0.9
    assert kf_ins.sum() >= 2

    est, gt = [], []
    for i in range(len(sts)):
        if sts[i] != int(TrackerStatus.TRACKING):
            continue
        est.append(-pR[i].T @ pt[i])
        gt.append(np.asarray(seq.poses_wc[t0 + i].t))
    # metric modes: NO scale alignment — depth must anchor true scale.
    # Bound anchored on the host per-frame path (~0.125 on this 28-frame
    # burst). Depth modes now default to scan_ba_min_interval_depth=0 (BA
    # on every keyframe, the host path's cadence — r4 measured the mono
    # rate cap costing ~17% here: 0.146 vs 0.125), so the chunk loop runs
    # the same program at the same cadence and must meet the host bound.
    rmse, _ = ate_rmse(np.asarray(est), np.asarray(gt), with_scale=False)
    assert rmse < ate_bound, rmse


@pytest.mark.slow
def test_chunked_stereo_rate_capped():
    """The mono-style in-scan BA rate cap stays available for depth modes
    (throughput escape hatch); its measured short-burst accuracy cost is
    bounded so regressions in the capped path stay visible."""
    test_chunked_depth_modes("stereo", scan_ba_interval=8, ate_bound=0.16)
