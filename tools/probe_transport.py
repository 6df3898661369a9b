"""Probe host->device transport over the current backend/tunnel.

Measures effective upload bandwidth (ms per 640x480 uint8 frame) as a
function of chunk size and number of concurrent upload threads, to pick
bench.py's CHUNK / IO_THREADS / DEPTH. On real PCIe this whole probe is
sub-second; over the dev tunnel it exposes the fixed per-transfer cost
vs streaming bandwidth split.

Usage: PYTHONPATH=. python tools/probe_transport.py
"""
from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax

    h, w = 480, 640
    rng = np.random.default_rng(0)
    rows = []
    for chunk in (8, 16, 32, 64):
        frames = rng.integers(0, 255, (chunk, h, w), dtype=np.uint8)
        # warm
        jax.block_until_ready(jax.device_put(frames))
        for threads in (1, 2, 4):
            n_rep = max(2, 64 // chunk)
            if threads == 1:
                t0 = time.perf_counter()
                for _ in range(n_rep):
                    jax.block_until_ready(jax.device_put(frames))
                dt = time.perf_counter() - t0
            else:
                ex = ThreadPoolExecutor(max_workers=threads)
                t0 = time.perf_counter()
                futs = [ex.submit(lambda: jax.block_until_ready(
                    jax.device_put(frames))) for _ in range(n_rep * threads)]
                for f in futs:
                    f.result()
                dt = time.perf_counter() - t0
                n_rep *= threads
                ex.shutdown(wait=False)
            ms_per_frame = dt / (n_rep * chunk) * 1e3
            mb_s = n_rep * chunk * h * w / dt / 1e6
            rows.append({"chunk": chunk, "threads": threads,
                         "ms_per_frame": round(ms_per_frame, 2),
                         "MB_s": round(mb_s, 1)})
            print(rows[-1], file=sys.stderr, flush=True)
    print(json.dumps({"metric": "upload_transport_probe",
                      "backend": jax.default_backend(), "rows": rows}))


if __name__ == "__main__":
    main()
