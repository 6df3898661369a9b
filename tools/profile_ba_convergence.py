"""Convergence profile of the staged-LM local BA on REAL map windows
(VERDICT r4 weak #7: the outlier test needed iters 20->30 after the staged
rework — does production local BA at iters=8 under-converge phase 3?).

Builds a real map by tracking the room benchmark on the host path, snapshots
the MapStore at several points, and for each snapshot runs local_ba at a
range of iteration counts from the SAME state, reporting the final Huber
cost, the cost decrease relative to iters=24 (treated as converged), and the
wall time per call. An iters=N row whose cost sits within ~1% of the
converged cost means N is enough on real windows.

Usage (chip or CPU):
  PYTHONPATH=/root/repo[:$PYTHONPATH] python tools/profile_ba_convergence.py \
      [--mode stereo] [--frames 90] [--out PROFILE_BA_CONV.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="stereo", choices=["mono", "stereo"])
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--keypoints", type=int, default=1200)
    ap.add_argument("--iters", default="4,6,8,12,16,24")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    from lpslam_tpu.io.benchmark import SyntheticBenchmark
    from lpslam_tpu.eval.run_dataset import build_rectifier
    from lpslam_tpu.pipeline.queues import CameraQueueEntry
    from lpslam_tpu.pipeline.trackers import VSLAMTracker
    from lpslam_tpu.backend.ba import local_ba, bundle_adjust

    nf = args.frames
    ds = SyntheticBenchmark(num_frames=nf, h=480, w=640, seed=0,
                            stereo=args.mode == "stereo",
                            turns=1.08 * nf / 600.0)
    proc, cam, fxb = build_rectifier(ds.intr, args.mode)
    tracker = VSLAMTracker(cam, {
        "mode": args.mode, "keypoints": args.keypoints, "levels": 3,
        "max_keyframes": 128, "max_landmarks": 24576,
        "focal_x_baseline": fxb if args.mode == "stereo" else 0.0,
    })

    snapshots = []
    snap_at = {nf // 3, 2 * nf // 3, nf - 1}
    for i, frame in enumerate(ds):
        entry = CameraQueueEntry(
            timestamp=frame.timestamp, image=frame.image,
            image_second=frame.image_right,
        )
        if proc is not None:
            entry = proc.process_image(entry)
        tracker.process_image(entry)
        if i in snap_at and int(tracker.engine.map.n_kf) >= 6:
            snapshots.append((i, tracker.engine.map))
    if not snapshots:
        print("no snapshots with enough keyframes", file=sys.stderr)
        return 1

    iters_list = [int(s) for s in args.iters.split(",")]
    ref_iters = max(iters_list)
    rows = []
    for fid, m in snapshots:
        per = {"frame": fid, "n_kf": int(m.n_kf), "n_lm": int(m.n_lm),
               "by_iters": []}
        costs = {}
        for it in iters_list:
            m_new, ba_res = local_ba(m, tracker.engine.cam, window=6,
                                     iters=it, covisibility=True)  # warm
            jax.block_until_ready(m_new.kf_t)
            t0 = time.perf_counter()
            m_new, ba_res = local_ba(m, tracker.engine.cam, window=6,
                                     iters=it, covisibility=True)
            jax.block_until_ready(m_new.kf_t)
            wall_ms = (time.perf_counter() - t0) * 1e3
            fc = float(ba_res.final_cost)
            costs[it] = fc
            per["by_iters"].append({
                "iters": it, "final_cost": round(fc, 2),
                "wall_ms": round(wall_ms, 1),
            })
        ref = costs.get(ref_iters)
        if ref:
            for r in per["by_iters"]:
                if r["final_cost"] is not None:
                    r["excess_vs_converged"] = round(
                        r["final_cost"] / ref - 1.0, 4
                    )
        rows.append(per)
        print(json.dumps(per), file=sys.stderr, flush=True)

    out = {
        "metric": "local_ba_staged_lm_convergence",
        "platform": jax.default_backend(),
        "mode": args.mode,
        "keypoints": args.keypoints,
        "window": 6,
        "note": "same real MapStore snapshot optimized at each iters count;"
                f" iters={ref_iters} treated as converged reference",
        "snapshots": rows,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
