"""Dataset evaluation runner: BASELINE configs 1-3 in one command.

    python -m lpslam_tpu.eval.run_dataset --tum /data/rgbd_dataset_fr1_xyz --mode mono
    python -m lpslam_tpu.eval.run_dataset --euroc /data/MH_01_easy --mode stereo
    python -m lpslam_tpu.eval.run_dataset --tum ... --mode rgbd

Runs the tracker over the sequence, aligns against ground truth, and prints a
JSON line with ATE RMSE + throughput (the BASELINE.md metric).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tum", help="TUM RGB-D sequence directory")
    p.add_argument("--euroc", help="EuRoC MAV sequence directory")
    p.add_argument("--mode", default="mono", choices=["mono", "stereo", "rgbd"])
    p.add_argument("--keypoints", type=int, default=1024)
    p.add_argument("--levels", type=int, default=3)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--max-keyframes", type=int, default=256)
    p.add_argument("--max-landmarks", type=int, default=32768)
    p.add_argument("--export-trajectory", help="TUM-format trajectory output")
    args = p.parse_args(argv)

    from ..geometry import PinholeCamera
    from ..frontend import MonoTracker, TrackerConfig
    from ..frontend.stereo import StereoTracker, RGBDTracker
    from ..kernels.orb import OrbParams
    from ..mapstore import MapConfig
    from ..eval import ate_rmse
    from ..io.datasets import (
        EurocDataset, TumRgbdDataset, EUROC_CAM0, TUM_FR1,
    )

    if args.tum:
        ds = TumRgbdDataset(args.tum, with_depth=args.mode == "rgbd")
        intr = TUM_FR1
    elif args.euroc:
        ds = EurocDataset(args.euroc, stereo=args.mode == "stereo")
        intr = EUROC_CAM0
    else:
        p.error("--tum or --euroc required")

    cam = PinholeCamera.make(intr["fx"], intr["fy"], intr["cx"], intr["cy"])
    cfg = TrackerConfig(
        orb=OrbParams(num_keypoints=args.keypoints, num_levels=args.levels),
        map_cfg=MapConfig(
            max_keyframes=args.max_keyframes,
            max_landmarks=args.max_landmarks,
            num_keypoints=args.keypoints,
        ),
    )
    if args.mode == "stereo":
        fxb = intr["fx"] * intr.get("baseline", 0.11)
        tracker = StereoTracker(cam, focal_x_baseline=fxb, cfg=cfg)
    elif args.mode == "rgbd":
        tracker = RGBDTracker(cam, cfg=cfg)
    else:
        tracker = MonoTracker(cam, cfg)

    timestamps = []
    t_start = time.perf_counter()
    n = 0
    for frame in ds:
        aux = frame.image_right if args.mode == "stereo" else frame.depth
        tracker.process(frame.image, aux=aux)
        timestamps.append(frame.timestamp)
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    wall = time.perf_counter() - t_start

    est, ts_tracked = [], []
    for i, (fid, pose, st) in enumerate(tracker.trajectory):
        if pose is None:
            continue
        est.append(-pose.R.T @ pose.t)
        ts_tracked.append(timestamps[fid] if fid < len(timestamps) else timestamps[-1])
    est = np.asarray(est)

    result = {
        "frames": n,
        "tracked": len(est),
        "keyframes": tracker.n_keyframes,
        "landmarks": tracker.n_landmarks,
        "fps": round(n / max(wall, 1e-9), 2),
    }
    gt = ds.ground_truth()
    if gt is not None and len(est) > 10:
        gt_pos = gt.positions_at(np.asarray(ts_tracked))
        rmse, _ = ate_rmse(est, gt_pos, with_scale=args.mode == "mono")
        result["ate_rmse"] = round(float(rmse), 4)

    if args.export_trajectory:
        with open(args.export_trajectory, "w") as f:
            for ts, c in zip(ts_tracked, est):
                f.write(f"{ts} {c[0]} {c[1]} {c[2]} 0 0 0 1\n")

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
