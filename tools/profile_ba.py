"""Microbenchmark the windowed local BA on the real chip, at the bench
operating point's map shapes (K=128, P=24576, N=1200), plus scan cost with
BA disabled entirely — to size the in-scan BA budget."""
from __future__ import annotations

import json
import sys
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
    from lpslam_tpu.backend.ba import local_ba
    import jax

    n_init = 16
    total = n_init + 10 * CHUNK
    ds = SyntheticBenchmark(num_frames=total, h=480, w=640, seed=0,
                            turns=1.08 * total / 556.0)
    frames_u8 = np.stack([np.clip(f.image, 0, 255).astype(np.uint8) for f in ds])
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

    out = {}

    # --- scan with NO in-scan BA (pre-staged frames)
    ct = ChunkedTracker(engine, rectify_map=rmap, local_ba_every_chunk=False)
    ct.boundary_compact = False
    for _ in range(2):
        ct.process_chunk(frames_u8[t:t + CHUNK]); t += CHUNK
    ct.sync()
    staged = []
    while t + CHUNK <= len(frames_u8):
        staged.append(ct.prefetch(frames_u8[t:t + CHUNK])); t += CHUNK
    jax.block_until_ready(staged)
    tm = time.perf_counter()
    for s in staged:
        ct.process_chunk(s)
    ct.sync()
    d = time.perf_counter() - tm
    out["scan_no_ba_ms_per_frame"] = round(d / (len(staged) * CHUNK) * 1e3, 3)
    out["scan_no_ba_fps"] = round(len(staged) * CHUNK / d, 1)
    print("scan done", out, file=sys.stderr, flush=True)

    # --- local BA microbench on the resulting map
    import functools
    m = jax.block_until_ready(engine.map)
    jba = jax.jit(local_ba, static_argnames=("window", "iters", "covisibility"))
    for window, iters in [(6, 8), (6, 4), (6, 2), (4, 8), (6, 1)]:
        r = jba(m, cam, window=window, iters=iters, covisibility=True)
        jax.block_until_ready(r)
        tb = time.perf_counter()
        for _ in range(5):
            r = jba(m, cam, window=window, iters=iters, covisibility=True)
            jax.block_until_ready(r)
        out[f"local_ba_w{window}_i{iters}_ms"] = round(
            (time.perf_counter() - tb) / 5 * 1e3, 2)
        print("ba", window, iters, out[f"local_ba_w{window}_i{iters}_ms"], file=sys.stderr, flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
