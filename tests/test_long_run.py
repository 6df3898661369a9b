"""Long-trajectory survival of the chunked device loop.

The reference engine's mapping thread culls redundant keyframes
continuously, so arbitrarily long sessions never exhaust the map database
(/root/reference — OpenVSLAM local-map-cleaner; SURVEY.md §5 long-context).
The chunked scan must match: boundary cull/compaction keeps the store under
its fixed capacities for thousands of frames WITHOUT host round trips, and
keyframe insertion must never starve at the capacity wall.
"""
import numpy as np
import pytest

from lpslam_tpu.geometry import PinholeCamera
from lpslam_tpu.io.synthetic import make_sequence
from lpslam_tpu.frontend import MonoTracker, TrackerConfig, TrackerStatus
from lpslam_tpu.frontend.device_loop import ChunkedTracker
from lpslam_tpu.kernels.orb import OrbParams
from lpslam_tpu.mapstore import MapConfig


@pytest.mark.slow
def test_chunked_long_run_capacity_and_insertion():
    """2000+ frames through the chunk loop with a deliberately small store
    (K=16): n_kf must stay under capacity at every chunk boundary, and
    keyframes must still be inserted in the final tenth of the run (no
    silent starvation at the wall — round-2 gap)."""
    CHUNK = 16
    # 1024 frames = 5 full orbit cycles against a 16-keyframe store — the
    # capacity/starvation asserts bind identically at this length (they
    # trip within ~2 cycles when broken); the 2048+-frame product-capacity
    # soak moved on-chip (tools/soak_long_run.py, SOAK artifacts)
    N_FRAMES = 1024
    # cycling orbit (period 200) so the per-frame motion rate matches a
    # real camera regardless of sequence length — the camera keeps circling
    # the same scene, the canonical long-session SLAM workload
    import jax.numpy as jnp
    from lpslam_tpu.geometry.se3 import se3_exp

    period = 200
    poses = []
    for t in range(N_FRAMES):
        tt = (t % period) / (period - 1)
        xi = np.array(
            [0.6 * np.sin(2 * np.pi * tt), 0.3 * (1 - np.cos(2 * np.pi * tt)),
             0.35 * np.sin(np.pi * tt), 0.04 * np.sin(2 * np.pi * tt),
             0.06 * np.sin(2 * np.pi * tt), 0.03 * tt],
            np.float32,
        )
        poses.append(se3_exp(jnp.asarray(xi)))
    seq = make_sequence(
        num_frames=N_FRAMES, h=240, w=320, seed=3, fx=230.0, poses=poses
    )
    cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=256, num_levels=2),
        map_cfg=MapConfig(max_keyframes=16, max_landmarks=2048,
                          num_keypoints=256),
    )
    eng = MonoTracker(cam, cfg)
    t = 0
    while eng.status != TrackerStatus.TRACKING and t < 40:
        eng.process(seq.images[t])
        t += 1
    assert eng.status == TrackerStatus.TRACKING

    ct = ChunkedTracker(eng)
    K = cfg.map_cfg.max_keyframes
    n_kf_trace = []
    while t + CHUNK <= N_FRAMES:
        ct.process_chunk(np.stack(seq.images[t:t + CHUNK]))
        t += CHUNK
        n_kf_trace.append(int(eng.map.n_kf))  # post-boundary-compaction
    ct.sync()
    sts, n_inl, pR, pt, kf_ins, sig_p, sig_r = ct.drain()

    # capacity held at EVERY boundary, not just the end
    assert max(n_kf_trace) < K, (max(n_kf_trace), K)
    assert int(eng.map.n_lm) < cfg.map_cfg.max_landmarks

    # tracking survived the whole run
    assert (sts == int(TrackerStatus.TRACKING)).mean() > 0.95

    # insertion never starved: keyframes still created in the last tenth
    tail = kf_ins[-len(kf_ins) // 10:]
    assert tail.sum() >= 1, "keyframe insertion starved at capacity"
    # and across the whole run far more keyframes were inserted than the
    # store can hold — i.e. culling actually recycled slots
    assert kf_ins.sum() > 2 * K, int(kf_ins.sum())

    # compaction events were queued for host-side tables (loop closer etc.)
    events = eng.drain_compactions()
    assert len(events) > 0
    ko, nk = events[-1]
    assert nk <= K and ko.shape == (K,)
