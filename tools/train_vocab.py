"""Train the shipped hierarchical ORB vocabulary (orb_vocab.dbow2 parity
asset) on a diverse synthetic corpus — many ray-cast rooms and procedural
textures, no external data needed (the reference ships a DBoW2 tree trained
offline on large image collections; conan-packages/dbow2-conan).

Usage:  PYTHONPATH=. python tools/train_vocab.py [--out lpslam_tpu/assets/orb_vocab.npz]

Corpus: R rooms (SyntheticBenchmark seeds — distinct plane textures and
geometry) x F viewpoints each, plus T procedural-texture sequences
(make_sequence seeds/motions). ~1200 descriptors per frame.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def collect_corpus(rooms: int, frames_per: int, tex_seqs: int,
                   keypoints: int = 800):
    import jax
    from lpslam_tpu.io.benchmark import SyntheticBenchmark
    from lpslam_tpu.io.synthetic import make_sequence
    from lpslam_tpu.kernels.orb import OrbParams, extract_orb
    import jax.numpy as jnp

    params = OrbParams(num_keypoints=keypoints, num_levels=3)
    ext = jax.jit(lambda im: extract_orb(im, params))

    descs, docs = [], []
    doc = 0

    def add(img):
        nonlocal doc
        f = ext(jnp.asarray(img, jnp.float32))
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        descs.append(d)
        docs.append(np.full(len(d), doc))
        doc += 1

    for r in range(rooms):
        ds = SyntheticBenchmark(num_frames=frames_per, h=480, w=640,
                                seed=100 + r, turns=1.0)
        for fr in ds:
            add(fr.image)
        print(f"room {r + 1}/{rooms}: {sum(len(d) for d in descs)} descriptors",
              file=sys.stderr, flush=True)

    for s in range(tex_seqs):
        seq = make_sequence(num_frames=frames_per, h=480, w=640,
                            seed=500 + s,
                            motion=("orbit", "forward", "pan")[s % 3])
        for img in seq.images:
            add(img)
        print(f"tex seq {s + 1}/{tex_seqs}: {sum(len(d) for d in descs)}",
              file=sys.stderr, flush=True)

    return np.concatenate(descs), np.concatenate(docs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpslam_tpu/assets/orb_vocab.npz")
    ap.add_argument("--rooms", type=int, default=12)
    ap.add_argument("--frames-per", type=int, default=24)
    ap.add_argument("--tex-seqs", type=int, default=9)
    ap.add_argument("--branching", type=int, default=32)
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    from lpslam_tpu.loop.vocab import train_vocabulary_tree, save_vocabulary

    t0 = time.time()
    desc, docs = collect_corpus(args.rooms, args.frames_per, args.tex_seqs)
    print(f"corpus: {len(desc)} descriptors from {docs.max() + 1} frames "
          f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    vocab = train_vocabulary_tree(
        desc, branching=args.branching, depth=args.depth, doc_ids=docs,
        progress=lambda lv, n_nodes, n_leaves: print(
            f"level {lv}: {n_nodes} open nodes, {n_leaves} leaves "
            f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True),
    )
    W = vocab.words.shape[0]
    save_vocabulary(vocab, args.out)
    print(f"saved {args.out}: {W} words "
          f"(branching {args.branching}^{args.depth}), "
          f"{time.time() - t0:.0f}s total")


if __name__ == "__main__":
    main()
