"""Standalone runner — reference lpslam-standalone parity
(/root/reference/src/tools/lpslam-standalone.cpp:17-124): config file, replay
input, recording, logging verbosity, plus a synthetic demo mode.

Usage:
    python -m lpslam_tpu.pipeline.cli --config cfg.json
    python -m lpslam_tpu.pipeline.cli --synthetic [--frames N] [--mode mono]
    python -m lpslam_tpu.pipeline.cli --replay recording.pb --config cfg.json
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="lpslam_tpu standalone runner")
    p.add_argument("--config", help="JSON configuration file")
    p.add_argument("--replay", help="replay a recorded .pb stream")
    p.add_argument("--record", action="store_true", help="record session to .pb")
    p.add_argument(
        "--record-no-video", action="store_true",
        help="record sensors/results but no camera frames",
    )
    p.add_argument(
        "--show-live", action="store_true",
        help="display frames in an OpenCV window (needs a display)",
    )
    p.add_argument(
        "--store-images", metavar="DIR",
        help="dump every 10th raw frame as PNG into DIR",
    )
    p.add_argument("--logfile", help="log to file")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--verbose-debug", action="store_true")
    p.add_argument("--synthetic", action="store_true", help="run the built-in synthetic demo")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--mode", default="mono", choices=["mono", "stereo", "rgbd"])
    p.add_argument("--export-trajectory", help="write trajectory to this file (TUM format)")
    p.add_argument("--export-map-csv", help="write landmark CSV")
    args = p.parse_args(argv)

    level = (
        logging.DEBUG if args.verbose_debug
        else logging.INFO if args.verbose
        else logging.WARNING
    )
    logging.basicConfig(
        level=level,
        filename=args.logfile,
        format="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
    )
    log = logging.getLogger("lpslam")

    from ..pipeline.manager import SlamManager
    from ..pipeline.config import load_config_file, CameraConfig

    results = []

    def on_reconstruction(res):
        results.append(res)

    if args.synthetic:
        mgr = SlamManager()
        src_cfg = {
            "num_frames": args.frames,
            "stereo_baseline": 0.2 if args.mode == "stereo" else 0.0,
            "with_depth": args.mode == "rgbd",
        }
        src = mgr.add_source_by_name("Synthetic", src_cfg)
        K = src.K
        cam = CameraConfig(
            number=0, model="no_distortion",
            fx=float(K[0, 0]), fy=float(K[1, 1]),
            cx=float(K[0, 2]), cy=float(K[1, 2]),
            focal_x_baseline=float(K[0, 0]) * 0.2,
        )
        mgr.set_camera_configuration(cam)
        mgr.add_tracker_by_name("VSLAM", {"mode": args.mode})
        mgr.on_reconstruction = on_reconstruction
        mgr.set_recording(args.record or args.record_no_video)
        if args.record_no_video:
            mgr.recorder.record_images = False
        mgr.show_live = args.show_live
        mgr.store_images_dir = args.store_images
        mgr.start()
        t0 = time.time()
        # wait for the source to finish AND the worker to drain (first frames
        # pay the jit compile cost)
        while time.time() - t0 < 900:
            if src.done and mgr.camera_queue.empty():
                break
            time.sleep(0.1)
        time.sleep(1.0)
        st = mgr.get_status()
        mgr.stop()
        n_valid = sum(1 for r in results if r.valid)
        print(json.dumps({
            "frames": st.frames_processed,
            "tracked": n_valid,
            "keyframes": st.keyframes,
            "landmarks": st.landmarks,
            "state": st.localization,
            "fps": round(st.fps, 2),
        }))
        if args.export_trajectory:
            with open(args.export_trajectory, "w") as f:
                for r in results:
                    if r.valid:
                        q = r.orientation_wxyz
                        f.write(
                            f"{r.timestamp} {r.position[0]} {r.position[1]} "
                            f"{r.position[2]} {q[1]} {q[2]} {q[3]} {q[0]}\n"
                        )
        if args.export_map_csv:
            mgr.mapping_export_csv(args.export_map_csv)
        return 0

    if not args.config:
        p.error("--config or --synthetic required")
    mgr = SlamManager()
    mgr.read_configuration_file(args.config)
    if args.replay:
        mgr.add_source_by_name("Replay", {"file": args.replay})
    mgr.on_reconstruction = on_reconstruction
    mgr.set_recording(args.record or args.record_no_video or mgr._record_enabled)
    if args.record_no_video:
        mgr.recorder.record_images = False
    if args.show_live:
        mgr.show_live = True
    if args.store_images:
        mgr.store_images_dir = args.store_images
    mgr.start()
    log.info("running — Ctrl-C to stop")
    try:
        while True:
            time.sleep(1.0)
            st = mgr.get_status()
            log.info(
                "state=%s kf=%d lm=%d fps=%.1f",
                st.localization, st.keyframes, st.landmarks, st.fps,
            )
            finite_sources = [s for s in mgr.sources if hasattr(s, "done")]
            if (
                finite_sources
                and all(s.done for s in finite_sources)
                and mgr.camera_queue.empty()
            ):
                break
    except KeyboardInterrupt:
        pass
    mgr.stop()
    n_valid = sum(1 for r in results if r.valid)
    print(json.dumps({"frames": mgr.get_status().frames_processed, "tracked": n_valid}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
