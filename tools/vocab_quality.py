"""Loop-candidate quality check: same-place vs different-place BoW score
separation + top-1 retrieval accuracy, per vocabulary.

Round 4 switched the default descriptor to the polar-DFT BRIEF
(kernels/orb.py) while the shipped vocabulary was still trained on the old
binned descriptor — word assignment quality under that distribution shift
was unmeasured. This tool measures it: render the room benchmark (orbit
that revisits its own path after one full turn), extract descriptors with
the CURRENT default extractor, and for each candidate vocabulary report

  - mean/median BoW similarity of SAME-PLACE pairs (frame i vs i+T, one
    orbit period apart: the camera is back where it started)
  - mean/median similarity of DIFFERENT-PLACE pairs (i vs i+T/2: opposite
    side of the orbit)
  - separation = mean(same) / mean(diff)  (DBoW2-style score contrast)
  - top-1 retrieval: for queries in the second turn, the best-scoring
    database frame from the first turn must lie within --radius m of the
    query's true position (the loop-closure candidate test that matters)

Usage:
  PYTHONPATH=/root/repo python tools/vocab_quality.py \
      --vocab lpslam_tpu/assets/orb_vocab.npz [--vocab old_vocab.npz ...] \
      [--frames 640] [--out VOCAB_QUALITY.json]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", action="append", default=[],
                    help="vocabulary file (repeatable)")
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--keypoints", type=int, default=1200)
    ap.add_argument("--radius", type=float, default=0.6,
                    help="true-position radius for a correct retrieval (m)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if not args.vocab:
        args.vocab = ["lpslam_tpu/assets/orb_vocab.npz"]

    import jax
    import jax.numpy as jnp

    from lpslam_tpu.io.benchmark import SyntheticBenchmark
    from lpslam_tpu.kernels.orb import OrbParams, extract_orb
    from lpslam_tpu.loop.vocab import (
        load_vocabulary, bow_vector, bow_similarity,
    )

    nf = args.frames
    # keep the 600-frame design motion rate; T = frames per orbit period
    turns = 1.15 * nf / 600.0
    ds = SyntheticBenchmark(num_frames=nf, h=480, w=640, seed=0, turns=turns)
    T = int(round((nf - 1) / turns))  # frames per full orbit

    params = OrbParams(num_keypoints=args.keypoints, num_levels=3)
    ext = jax.jit(lambda im: extract_orb(im, params))
    descs, valids, positions = [], [], []
    for i, fr in enumerate(ds):
        f = ext(jnp.asarray(fr.image, jnp.float32))
        descs.append(f.desc)
        valids.append(f.valid)
        if (i + 1) % 160 == 0:
            print(f"extracted {i + 1}/{nf}", file=sys.stderr, flush=True)
    pos = ds.ground_truth().positions  # one row per frame

    same_pairs = [(i, i + T) for i in range(0, nf - T)]
    diff_pairs = [(i, i + T // 2) for i in range(0, nf - T // 2, 7)]

    results = []
    for vp in args.vocab:
        vocab = load_vocabulary(vp)
        bow = jax.jit(lambda d, v: bow_vector(vocab, d, v))
        vecs = np.stack([np.asarray(bow(d, v)) for d, v in zip(descs, valids)])

        def scores(pairs):
            return np.asarray([
                float(bow_similarity(vecs[a], vecs[b][None])[0])
                for a, b in pairs
            ])

        s_same = scores(same_pairs)
        s_diff = scores(diff_pairs)

        # top-1 retrieval: queries from the revisit segment, database = the
        # first turn minus a 60-frame temporal exclusion window
        db = vecs[:T]
        hits, n_q = 0, 0
        for q in range(T, nf, 5):
            sims = bow_similarity(vecs[q], db)
            cand = int(np.argmax(np.asarray(sims)))
            n_q += 1
            hits += float(np.linalg.norm(pos[cand] - pos[q])) <= args.radius
        results.append({
            "vocab": vp,
            "words": int(vocab.words.shape[0]),
            "same_place_mean": round(float(s_same.mean()), 4),
            "same_place_median": round(float(np.median(s_same)), 4),
            "diff_place_mean": round(float(s_diff.mean()), 4),
            "diff_place_median": round(float(np.median(s_diff)), 4),
            "separation": round(float(s_same.mean() / max(s_diff.mean(), 1e-9)), 3),
            "top1_retrieval_acc": round(hits / max(n_q, 1), 4),
            "queries": n_q,
        })
        print(json.dumps(results[-1]), file=sys.stderr, flush=True)

    out = {
        "benchmark": f"room orbit, {nf} frames, period {T} frames; "
                     f"same-place = i vs i+T, diff-place = i vs i+T/2",
        "descriptor": "current default extractor (polar-DFT BRIEF)",
        "platform": jax.default_backend(),
        "radius_m": args.radius,
        "vocabularies": results,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
