"""Ablation: BA damping formulation x guarded-inverse tolerance, measured
END TO END on the stereo room benchmark (the configuration that produced the
round-4 TPU NaN explosion, commit 3171115).

Round 4 shipped absolute (Levenberg) point-block damping with a permissive
inv3x3_guarded catastrophe gate (tol=1e12), justified by two claims that
lived only in code comments:
  - "relative (Marquardt) damping measured 6x worse ATE on the stereo e2e"
  - "freezing 1e9-residual blocks [tight tol] cost up to 3x ATE"
This tool turns those claims into a committed artifact: it re-runs the SAME
eval (lpslam_tpu.eval.run_dataset --bench room --mode stereo --loop) under
each formulation via the env knobs read at import by backend/ba.py
(LPSLAM_BA_DAMPING, LPSLAM_BA_GUARD_TOL), each in a fresh subprocess so the
choice is traced into every compiled program.

Usage:
  PYTHONPATH=/root/repo python tools/ablate_ba_robustness.py \
      [--frames 600] [--out ABLATION_BA_r05.json] [--mode stereo]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

CONFIGS = [
    # (name, damping, guard_tol)
    ("shipped_absolute_tol1e12", "absolute", "1e12"),
    ("absolute_tight_tol1e-2", "absolute", "1e-2"),
    ("relative_marquardt_tol1e12", "relative", "1e12"),
]


def run_one(name, damping, tol, args):
    env = dict(os.environ)
    env["LPSLAM_BA_DAMPING"] = damping
    env["LPSLAM_BA_GUARD_TOL"] = tol
    env.setdefault("PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out_path = tf.name
    cmd = [
        sys.executable, "-m", "lpslam_tpu.eval.run_dataset",
        "--bench", "room", "--mode", args.mode,
        "--frames", str(args.frames), "--loop",
        "--vocab", args.vocab, "--json-out", out_path,
    ]
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=5400)
    wall = time.time() - t0
    row = {"config": name, "damping": damping, "guard_tol": float(tol),
           "wall_s": round(wall, 1)}
    try:
        with open(out_path) as f:
            row.update(json.load(f))
    except (OSError, ValueError):
        row["error"] = (r.stderr or r.stdout)[-2000:]
    os.unlink(out_path)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--mode", default="stereo")
    ap.add_argument("--vocab", default="lpslam_tpu/assets/orb_vocab.npz")
    ap.add_argument("--out", default="ABLATION_BA_r05.json")
    args = ap.parse_args()

    rows = []
    for name, damping, tol in CONFIGS:
        print(f"== {name} (damping={damping}, tol={tol}) ==",
              file=sys.stderr, flush=True)
        row = run_one(name, damping, tol, args)
        print(json.dumps(row), file=sys.stderr, flush=True)
        rows.append(row)

    import jax

    artifact = {
        "benchmark": f"room {args.mode} {args.frames} frames, loop closure on"
                     " (the round-4 NaN-explosion configuration)",
        "platform": jax.default_backend(),
        "knobs": "LPSLAM_BA_DAMPING / LPSLAM_BA_GUARD_TOL read at import by"
                 " lpslam_tpu/backend/ba.py; fresh subprocess per config",
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
