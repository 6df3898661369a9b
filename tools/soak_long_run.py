"""On-chip long-run soak at PRODUCT capacity (round-5 task: the long-run
test exists only on CPU with a small store; the bench measures 160-frame
windows — this is the missing artifact in between).

2000+ frames of the ray-cast room through the PRODUCT frame loop
(VSLAMTracker with the chunked device scan), at the reference operating
point: MapConfig(max_keyframes=128, max_landmarks=24576, 1200 keypoints),
640x480, loop closure ON, multiple orbit revisits. Asserts:

  - no NaN/Inf in any emitted pose and none in the final map
  - keyframe/landmark occupancy stays under capacity at every sample
  - tracked fraction >= 0.95 over the whole run
  - fps stability: last-quartile fps >= 0.7x first-quartile fps (no
    monotonic slowdown as the map fills / culls / loop-closes)

Usage:
  PYTHONPATH=/root/repo python tools/soak_long_run.py \
      [--frames 2048] [--chunk 16] [--out SOAK_r05.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--keypoints", type=int, default=1200)
    ap.add_argument("--turns", type=float, default=0.0,
                    help="orbit turns (default: design rate => ~3.7 revisits)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    from lpslam_tpu.io.benchmark import SyntheticBenchmark
    from lpslam_tpu.eval.run_dataset import build_rectifier
    from lpslam_tpu.pipeline.queues import CameraQueueEntry
    from lpslam_tpu.pipeline.trackers import VSLAMTracker
    from lpslam_tpu.eval import ate_rmse

    nf = args.frames
    turns = args.turns or 1.08 * nf / 600.0  # design per-frame motion rate
    ds = SyntheticBenchmark(num_frames=nf, h=480, w=640, seed=0, turns=turns)
    proc, cam, _ = build_rectifier(ds.intr, "mono")

    tracker = VSLAMTracker(cam, {
        "mode": "mono",
        "keypoints": args.keypoints,
        "levels": 3,
        "max_keyframes": 128,
        "max_landmarks": 24576,
        "loop_closure": True,
        "vocab_file": "lpslam_tpu/assets/orb_vocab.npz",
        "chunk_size": args.chunk,
    })

    win = 128  # fps sampling window (frames)
    win_t0 = time.perf_counter()
    fps_windows = []
    occupancy = []
    t_start = time.perf_counter()
    for i, frame in enumerate(ds):
        entry = CameraQueueEntry(timestamp=frame.timestamp, image=frame.image)
        if proc is not None:
            entry = proc.process_image(entry)
        tracker.process_image(entry)
        if (i + 1) % win == 0:
            now = time.perf_counter()
            fps_windows.append(round(win / (now - win_t0), 2))
            win_t0 = now
            eng = tracker.engine
            occupancy.append({"frame": i + 1,
                              "n_kf": int(eng.n_keyframes),
                              "n_lm": int(eng.n_landmarks)})
            print(f"frame {i + 1}/{nf}: {fps_windows[-1]} fps, "
                  f"kf {occupancy[-1]['n_kf']}/128 "
                  f"lm {occupancy[-1]['n_lm']}/24576",
                  file=sys.stderr, flush=True)
    tracker.flush()
    wall = time.perf_counter() - t_start

    eng = tracker.engine
    est, fids = [], []
    n_bad = 0
    for fid, pose, st in eng.trajectory:
        if pose is None:
            continue
        c = -pose.R.T @ pose.t
        if not np.all(np.isfinite(c)):
            n_bad += 1
            continue
        est.append(c)
        fids.append(fid)
    est = np.asarray(est)

    # map finiteness
    m = eng.map
    map_finite = bool(
        np.all(np.isfinite(np.asarray(m.kf_R)[: int(m.n_kf)]))
        and np.all(np.isfinite(np.asarray(m.kf_t)[: int(m.n_kf)]))
    )

    q = max(len(fps_windows) // 4, 1)
    fps_first, fps_last = (float(np.mean(fps_windows[:q])),
                           float(np.mean(fps_windows[-q:])))
    tracked_frac = len(est) / nf
    max_kf = max(o["n_kf"] for o in occupancy)
    max_lm = max(o["n_lm"] for o in occupancy)

    gt = ds.ground_truth()
    ate = None
    if len(est) > 10:
        gt_pos = gt.positions[np.asarray(fids)]
        rmse, _ = ate_rmse(est, gt_pos, with_scale=True)
        ate = round(float(rmse), 4)

    checks = {
        "no_nan_poses": n_bad == 0,
        "map_finite": map_finite,
        "capacity_held": max_kf < 128 and max_lm < 24576,
        "tracked_frac_ge_095": tracked_frac >= 0.95,
        "fps_stable": fps_last >= 0.7 * fps_first,
    }
    out = {
        "metric": "long_run_soak",
        "platform": jax.default_backend(),
        "frames": nf,
        "chunk": args.chunk,
        "keypoints": args.keypoints,
        "orbit_turns": round(turns, 2),
        "map_capacity": {"max_keyframes": 128, "max_landmarks": 24576},
        "wall_s": round(wall, 1),
        "mean_fps": round(nf / wall, 2),
        "fps_windows": fps_windows,
        "fps_first_quartile": round(fps_first, 2),
        "fps_last_quartile": round(fps_last, 2),
        "tracked": len(est),
        "tracked_frac": round(tracked_frac, 4),
        "nan_poses": n_bad,
        "max_keyframes_seen": max_kf,
        "max_landmarks_seen": max_lm,
        "final_keyframes": int(eng.n_keyframes),
        "final_landmarks": int(eng.n_landmarks),
        "ate_rmse_sim3": ate,
        "checks": checks,
        "ok": all(checks.values()),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
