"""Where does the chunk-loop time go? Run on the real chip.

Measures, at the bench operating point (1200 kp, 640x480, CHUNK=16):
  A. upload-only: host->device staging of raw uint8 chunks
  B. scan-only: chunk scans with frames pre-staged, boundary work disabled
  C. scan+boundary: chunk scans + chunk-boundary cull/compact dispatches
  D. full bench loop (inline prefetch), as bench.py measures today
"""
from __future__ import annotations

import json
import time

import numpy as np


CHUNK = 16


def main():
    from lpslam_tpu.io.benchmark import SyntheticBenchmark
    from lpslam_tpu.eval.run_dataset import build_rectifier
    from lpslam_tpu.pipeline.queues import CameraQueueEntry
    from lpslam_tpu.frontend import MonoTracker, TrackerConfig, TrackerStatus
    from lpslam_tpu.frontend.device_loop import ChunkedTracker
    from lpslam_tpu.kernels.orb import OrbParams
    from lpslam_tpu.mapstore import MapConfig
    import jax

    n_init, n_meas = 16, 160
    total = n_init + 2 * CHUNK + n_meas + CHUNK
    ds = SyntheticBenchmark(num_frames=total, h=480, w=640, seed=0,
                            turns=1.08 * total / 556.0)
    frames_u8 = np.stack([np.clip(f.image, 0, 255).astype(np.uint8) for f in ds])

    proc, cam, _ = build_rectifier(ds.intr, "mono")
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=1200, num_levels=3),
        map_cfg=MapConfig(max_keyframes=128, max_landmarks=24576,
                          num_keypoints=1200),
    )

    def make_tracker(boundary_compact=True):
        engine = MonoTracker(cam, cfg)

        def rectify(img):
            entry = CameraQueueEntry(timestamp=0.0, image=img.astype(np.float32))
            return proc.process_image(entry).image if proc is not None else img

        t = 0
        while engine.status != TrackerStatus.TRACKING and t < n_init:
            engine.process(rectify(frames_u8[t]))
            t += 1
        rmap = np.asarray(proc._maps[0]) if proc is not None else None
        ct = ChunkedTracker(engine, rectify_map=rmap)
        ct.boundary_compact = boundary_compact
        return ct, t

    out = {}

    # --- A: upload-only bandwidth
    ct, t0 = make_tracker()
    h = ct.prefetch(frames_u8[0:CHUNK])
    jax.block_until_ready(h)
    tA = time.perf_counter()
    handles = []
    for k in range(10):
        h = ct.prefetch(frames_u8[k * CHUNK:(k + 1) * CHUNK])
        handles.append(h)
    jax.block_until_ready(handles)
    dA = time.perf_counter() - tA
    out["upload_ms_per_frame"] = round(dA / (10 * CHUNK) * 1e3, 3)
    out["upload_fps_ceiling"] = round(10 * CHUNK / dA, 1)

    # --- B/C: scan-only vs scan+boundary
    for name, compact in (("scan_only", False), ("scan_boundary", True)):
        ct, t = make_tracker(boundary_compact=compact)
        for _ in range(2):  # warmup/compile
            ct.process_chunk(frames_u8[t:t + CHUNK]); t += CHUNK
        ct.sync()
        staged = []
        while t + CHUNK <= len(frames_u8) and len(staged) * CHUNK < n_meas:
            staged.append(ct.prefetch(frames_u8[t:t + CHUNK])); t += CHUNK
        jax.block_until_ready(staged)
        tm = time.perf_counter()
        for s in staged:
            ct.process_chunk(s)
        ct.sync()
        d = time.perf_counter() - tm
        out[name + "_fps"] = round(len(staged) * CHUNK / d, 1)
        out[name + "_ms_per_frame"] = round(d / (len(staged) * CHUNK) * 1e3, 3)
        out[name + "_keyframes"] = int(ct.engine._kf_count)

    # --- D: bench loop as-is (inline prefetch)
    ct, t = make_tracker()
    for _ in range(2):
        ct.process_chunk(frames_u8[t:t + CHUNK]); t += CHUNK
    ct.sync()
    tm = time.perf_counter()
    nxt = ct.prefetch(frames_u8[t:t + CHUNK])
    done = 0
    while done < n_meas:
        cur = nxt
        t += CHUNK
        if t + CHUNK <= len(frames_u8):
            nxt = ct.prefetch(frames_u8[t:t + CHUNK])
        ct.process_chunk(cur)
        done += CHUNK
    ct.sync()
    d = time.perf_counter() - tm
    out["bench_loop_fps"] = round(done / d, 1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
