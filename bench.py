"""Benchmark: tracked frames/sec/chip on the per-frame SLAM step.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline anchor (BASELINE.md): OpenVSLAM-class CPU trackers run ~30 fps on
desktop CPU; the target is >= 2x that on one TPU v5e chip, i.e. 60 fps. We
report tracked frames/sec for the full jitted per-frame step (ORB pyramid +
FAST + BRIEF + map matching + pose optimization, 512 keypoints, 3 levels,
480x640) and vs_baseline = fps / 60.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import entry

    step, (img, m, pose) = entry()
    jstep = jax.jit(step)

    # compile
    out = jstep(img, m, pose)
    jax.block_until_ready(out)

    # bench: feed the same image repeatedly (tracking-step throughput; the
    # content of the image does not change the op schedule)
    n_warm, n_iter = 3, 30
    for _ in range(n_warm):
        jax.block_until_ready(jstep(img, m, pose))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = jstep(img, m, pose)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iter / dt

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
