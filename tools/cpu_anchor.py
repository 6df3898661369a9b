"""Measured CPU anchor for the bench: run THIS tracker on the host CPU at
the exact bench operating point (1200 keypoints, 3 levels, 640x480 ray-cast
room frames, full pipeline incl. local BA) and report tracked fps.

BASELINE.md's throughput target is anchored on "OpenVSLAM-class CPU trackers
run ~30 fps on desktop CPUs" (class knowledge, not measured here). This
script replaces assumption with measurement for the hardware we DO have:
the same workload, same code, on this host's CPUs — recorded alongside the
class-knowledge anchor in BENCH detail so both multiples are explicit.

Run with a clean CPU env:
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/cpu_anchor.py
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    from lpslam_tpu.io.benchmark import SyntheticBenchmark
    from lpslam_tpu.eval.run_dataset import build_rectifier
    from lpslam_tpu.pipeline.queues import CameraQueueEntry
    from lpslam_tpu.frontend import MonoTracker, TrackerConfig, TrackerStatus
    from lpslam_tpu.frontend.device_loop import ChunkedTracker
    from lpslam_tpu.kernels.orb import OrbParams
    from lpslam_tpu.mapstore import MapConfig

    CHUNK = 16
    n_init, n_meas = 16, 48
    total = n_init + 2 * CHUNK + n_meas + CHUNK
    ds = SyntheticBenchmark(num_frames=total, h=480, w=640, seed=0,
                            turns=1.08 * total / 556.0)
    frames_u8 = np.stack([np.clip(f.image, 0, 255).astype(np.uint8)
                          for f in ds])
    proc, cam, _ = build_rectifier(ds.intr, "mono")
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=1200, num_levels=3),
        map_cfg=MapConfig(max_keyframes=128, max_landmarks=24576,
                          num_keypoints=1200),
    )
    engine = MonoTracker(cam, cfg)

    def rectify(img):
        entry = CameraQueueEntry(timestamp=0.0, image=img.astype(np.float32))
        return proc.process_image(entry).image if proc is not None else img

    t = 0
    while engine.status != TrackerStatus.TRACKING and t < n_init:
        engine.process(rectify(frames_u8[t])); t += 1
    rmap = np.asarray(proc._maps[0]) if proc is not None else None
    ct = ChunkedTracker(engine, rectify_map=rmap)
    ct.process_chunk(frames_u8[t:t + CHUNK]); t += CHUNK
    ct.sync()

    t0 = time.perf_counter()
    done = 0
    while done < n_meas:
        ct.process_chunk(frames_u8[t:t + CHUNK])
        t += CHUNK
        done += CHUNK
    ct.sync()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "cpu_anchor_tracked_fps",
        "value": round(done / wall, 2),
        "unit": "frames/s",
        "host_cpus": os.cpu_count(),
        "frames": done,
        "keypoints": 1200,
        "note": ("this tracker, same operating point, host CPU via XLA:CPU — "
                 "measured anchor recorded beside the 30 fps desktop-CPU "
                 "class anchor in BASELINE.md"),
    }))


if __name__ == "__main__":
    main()
