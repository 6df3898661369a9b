"""Benchmark: FULL-PIPELINE tracked frames/sec/chip at reference parity.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Workload (the reference's own operating point, OpenVSLAMTrackerBase.cpp:35,193):
1200 keypoints, 3 pyramid levels, 640x480 frames from the ray-cast room
benchmark (true 3D scene, lens distortion), through the complete tracker:
in-path undistortion (device remap) -> batched ORB extraction -> map
projection/matching -> pose optimization -> keyframe insertion +
triangulation + windowed local BA — i.e. what a user-visible tracked frame
costs, including the raw-frame uploads.

Architecture note: tracking runs as the device-resident chunked scan loop
(lpslam_tpu/frontend/device_loop.py) — raw uint8 frames are staged in
chunks, one compiled program advances B frames, per-frame results stay on
device until the end. A per-frame host-synced loop is latency-bound at
~15-40 fps on a remote-attached chip regardless of kernel speed; the chunk
loop is the TPU-native frame loop. The measured window covers uploads, all
chunk scans, chunk-boundary local BA, and the final sync.

Variance robustness: this harness reaches the chip through a remote tunnel
whose host->device bandwidth swings ~0.3-30 ms/MB across minutes (a harness
artifact: on a real v5e host, PCIe moves a 307 KB frame in well under 0.1
ms). The benchmark therefore (a) runs a plain sequential staging loop —
`process_chunk` is dispatch-async, so host staging of chunk k+1 already
overlaps the device scan of chunk k; measured A/B on this backend showed
io-thread prefetch pools LOSE to the async-dispatch pipeline (lock
contention on the tunnel RPC lane: sequential 137-142 fps vs 2-thread
overlap 120 fps in the same process; BENCH_IO_THREADS=N restores the
threaded mode for real-PCIe hosts), (b) measures THREE separate full
windows and reports the MEDIAN one as the headline (apples-to-apples with
a single-window measurement; best/worst stay in `detail`), (c) reports
the transport/compute split in `detail` — including `scan_only_fps`, a
transport-free window over pre-staged device chunks that is the internal
compute floor: if window fps sits far below scan_only_fps the window was
transport-poisoned, not compute-bound — and (d) when the median window
itself lands below 0.7x that floor, measures THREE more windows (lazily
rendered, identical per-frame motion rate) and reports the median over
ALL six: more samples under detected harness noise, never a best-of
selection; `detail.windows_retried` discloses when this fired.

Baseline anchor (BASELINE.md): OpenVSLAM-class CPU trackers run ~30 fps on
desktop CPUs; the target is >= 2x that on one TPU chip => vs_baseline =
fps / 60. `detail.cpu_anchor_fps` additionally reports THIS tracker's
measured fps on THIS host's CPUs (tools/cpu_anchor.py, committed to
CPU_ANCHOR.json) so both multiples are explicit.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

CHUNK = int(os.environ.get("BENCH_CHUNK", "16"))
WINDOWS = int(os.environ.get("BENCH_WINDOWS", "3"))
N_MEAS = int(os.environ.get("BENCH_FRAMES", "160"))  # frames per window
# extra windows measured ONLY if the median window lands below 0.7x the
# internal compute floor (transport poisoning); headline stays the median
# over ALL measured windows. 0 disables.
RETRY_WINDOWS = int(os.environ.get("BENCH_RETRY_WINDOWS", "3"))
DEPTH = 4       # prefetch queue depth (chunks), threaded mode only
# 0 = sequential staging riding the async-dispatch pipeline (best over the
# tunnel: device_put contends with the in-flight scan RPC when issued from
# io threads); N>0 = N-thread prefetch pool (real-PCIe hosts)
IO_THREADS = int(os.environ.get("BENCH_IO_THREADS", "0"))


def main():
    from concurrent.futures import ThreadPoolExecutor

    from lpslam_tpu.io.benchmark import SyntheticBenchmark
    from lpslam_tpu.eval.run_dataset import build_rectifier
    from lpslam_tpu.pipeline.queues import CameraQueueEntry
    from lpslam_tpu.frontend import MonoTracker, TrackerConfig, TrackerStatus
    from lpslam_tpu.frontend.device_loop import ChunkedTracker
    from lpslam_tpu.kernels.orb import OrbParams
    from lpslam_tpu.mapstore import MapConfig

    n_init = 16
    # + one extra window of frames for the transport-free scan-only floor,
    # + RETRY more windows rendered LAZILY only if the median window comes
    #   out transport-poisoned (see below)
    total_base = n_init + 2 * CHUNK + (WINDOWS + 1) * N_MEAS + CHUNK
    total = total_base + RETRY_WINDOWS * N_MEAS
    # pre-render on host so the measurement is pure pipeline time; raw uint8
    # frames, exactly what a camera delivers. turns scales with total so the
    # per-frame motion rate (the workload) is identical regardless of RETRY.
    ds = SyntheticBenchmark(
        num_frames=total, h=480, w=640, seed=0,
        turns=1.08 * total / 556.0,   # design per-frame motion rate
    )
    ds_it = iter(ds)
    frames_u8 = np.stack([
        np.clip(next(ds_it).image, 0, 255).astype(np.uint8)
        for _ in range(total_base)
    ])

    proc, cam, _ = build_rectifier(ds.intr, "mono")
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=1200, num_levels=3),
        map_cfg=MapConfig(
            max_keyframes=128, max_landmarks=24576, num_keypoints=1200
        ),
    )
    engine = MonoTracker(cam, cfg)

    def rectify(img):
        entry = CameraQueueEntry(timestamp=0.0, image=img.astype(np.float32))
        return proc.process_image(entry).image if proc is not None else img

    # initialization runs on the host path (rare transition), then the
    # steady TRACKING loop rides the chunked device scan
    t = 0
    while engine.status != TrackerStatus.TRACKING and t < n_init:
        engine.process(rectify(frames_u8[t]))
        t += 1
    rmap = np.asarray(proc._maps[0]) if proc is not None else None
    ct = ChunkedTracker(engine, rectify_map=rmap)

    # warmup: two full CHUNK-sized scans so the one compiled program (and a
    # boundary local BA) exist before the timer — every measured chunk is
    # exactly CHUNK frames, so nothing recompiles in the window
    for _ in range(2):
        ct.process_chunk(frames_u8[t:t + CHUNK])
        t += CHUNK
    ct.sync()

    # transport probe: sequential staging of 3 chunks, so a transport-bound
    # result is identifiable in `detail` (real PCIe moves these in ~0.1 ms)
    import jax

    tp0 = time.perf_counter()
    for k in range(3):
        jax.block_until_ready(ct.prefetch(frames_u8[t - 2 * CHUNK:t - CHUNK]))
    upload_probe_ms = (time.perf_counter() - tp0) / (3 * CHUNK) * 1e3

    io = (
        ThreadPoolExecutor(max_workers=IO_THREADS, thread_name_prefix="chunk-io")
        if IO_THREADS > 0 else None
    )

    def run_window(t0_frame):
        """One full end-to-end measurement window: uploads + chunk scans +
        boundary mapping + final sync. Default (IO_THREADS=0): sequential
        staging — process_chunk dispatches async, so staging chunk k+1
        overlaps the device scan of chunk k with no extra threads."""
        t = t0_frame
        n_chunks = N_MEAS // CHUNK
        t_meas0 = time.perf_counter()
        chunk_times = []
        if io is None:
            for _ in range(n_chunks):
                cur = ct.prefetch(frames_u8[t:t + CHUNK])
                t += CHUNK
                tc = time.perf_counter()
                ct.process_chunk(cur)
                chunk_times.append(time.perf_counter() - tc)
        else:
            inflight = []
            for _ in range(min(DEPTH, n_chunks)):
                inflight.append(io.submit(ct.prefetch, frames_u8[t:t + CHUNK]))
                t += CHUNK
            done = 0
            while done < N_MEAS:
                cur = inflight.pop(0).result()
                if done + len(inflight) * CHUNK + CHUNK < N_MEAS:
                    inflight.append(io.submit(ct.prefetch, frames_u8[t:t + CHUNK]))
                    t += CHUNK
                tc = time.perf_counter()
                ct.process_chunk(cur)
                chunk_times.append(time.perf_counter() - tc)
                done += CHUNK
        ct.sync()  # blocks until the full pipeline drains
        wall = time.perf_counter() - t_meas0
        return N_MEAS / wall, np.asarray(chunk_times) / CHUNK * 1e3, t

    window_fps = []
    window_ms = []
    for w in range(WINDOWS):
        fps_w, ms_w, t = run_window(t)
        window_fps.append(round(fps_w, 2))
        window_ms.append(ms_w)

    # transport-free compute floor: every chunk pre-staged on device before
    # the timer, so this window contains zero host->device transfers
    n_chunks = N_MEAS // CHUNK
    staged = []
    for _ in range(n_chunks):
        staged.append(jax.block_until_ready(ct.prefetch(frames_u8[t:t + CHUNK])))
        t += CHUNK
    t_s0 = time.perf_counter()
    for cur in staged:
        ct.process_chunk(cur)
    ct.sync()
    scan_only_fps = n_chunks * CHUNK / (time.perf_counter() - t_s0)

    # Retry on detected transport poisoning: when the median window sits
    # below 0.7x the internal compute floor, the tunnel (not the pipeline)
    # ate the window. Measure RETRY_WINDOWS more full windows — rendered
    # lazily, same per-frame motion rate — and take the median of ALL
    # windows (no best-of selection; extra samples under detected noise,
    # every window disclosed in detail).
    windows_retried = 0
    if RETRY_WINDOWS > 0 and np.median(window_fps) < 0.7 * scan_only_fps:
        extra = np.stack([
            np.clip(next(ds_it).image, 0, 255).astype(np.uint8)
            for _ in range(RETRY_WINDOWS * N_MEAS)
        ])
        frames_u8 = np.concatenate([frames_u8, extra])
        for w in range(RETRY_WINDOWS):
            fps_w, ms_w, t = run_window(t)
            window_fps.append(round(fps_w, 2))
            window_ms.append(ms_w)
            windows_retried += 1

    # headline = MEDIAN window (robust to tunnel variance both ways; the
    # LOWER middle when the count is even); best/worst stay in detail
    order = int(np.argsort(window_fps)[(len(window_fps) - 1) // 2])
    fps = window_fps[order]
    ct_ms = window_ms[order]
    if io is not None:
        io.shutdown(wait=False)

    cpu_anchor_fps = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "CPU_ANCHOR.json")) as f:
            cpu_anchor_fps = json.load(f)["value"]
    except (OSError, KeyError, ValueError):
        pass

    sts, n_inl, _, _, kf_ins, _, _ = ct.collect()
    print(
        json.dumps(
            {
                "metric": "full_pipeline_tracked_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 3),
                "detail": {
                    "keypoints": 1200,
                    "levels": 3,
                    "resolution": "640x480",
                    "chunk": CHUNK,
                    "io_threads": IO_THREADS,
                    "frames_per_window": N_MEAS,
                    "window_fps": window_fps,
                    "window_fps_best": max(window_fps),
                    "window_fps_worst": min(window_fps),
                    "windows_retried": windows_retried,
                    "scan_only_fps": round(scan_only_fps, 2),
                    "cpu_anchor_fps": cpu_anchor_fps,
                    "vs_cpu_anchor": (
                        round(fps / cpu_anchor_fps, 2) if cpu_anchor_fps else None
                    ),
                    "upload_probe_ms_per_frame": round(upload_probe_ms, 2),
                    # fraction of the transport-free compute floor the
                    # measured window reached; the flag trips when >30% of
                    # the window went to transport/dispatch overhead (the
                    # blocking upload probe above takes a slower tunnel
                    # path than in-window staging, so it is a diagnostic,
                    # not the bound)
                    "window_vs_compute_floor": round(fps / scan_only_fps, 3),
                    "transport_bound": bool(fps < 0.7 * scan_only_fps),
                    "tracking_fraction": round(float((sts == 2).mean()), 3),
                    "median_inliers": int(np.median(n_inl)),
                    "keyframes": int(engine._kf_count),
                    "landmarks": engine.n_landmarks,
                    "state": engine.status.name,
                    "frame_ms_median": round(float(np.median(ct_ms)), 2),
                    "frame_ms_p95": round(float(np.percentile(ct_ms, 95)), 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
