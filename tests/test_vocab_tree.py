"""Hierarchical (tree-trained) vocabulary at DBoW2-credible scale.

The shipped asset (lpslam_tpu/assets/orb_vocab.npz) is trained by
tools/train_vocab.py with hierarchical k-majority (branching 32, depth 3 —
~32k leaves) over a diverse synthetic corpus; runtime word assignment stays
ONE int8 MXU matmul over all leaves (exact nearest word — strictly better
than DBoW2's approximate tree walk). Pins:
 - the asset is at credible scale (>= 10^4 leaves) with sane idf;
 - tree training produces a usable vocabulary (assignment covers leaves);
 - place recognition across >= 3 visually distinct synthetic scenes:
   same-place pairs score above the loop gate, cross-scene pairs below it
   (no cross-scene false positives at the default gates).
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lpslam_tpu.loop.vocab import (
    Vocabulary,
    train_vocabulary_tree,
    load_vocabulary,
    assign_words,
    bow_vector,
    bow_similarity,
)
from lpslam_tpu.loop.detector import LoopConfig

ASSET = os.path.join(os.path.dirname(__file__), "..", "lpslam_tpu",
                     "assets", "orb_vocab.npz")


def test_shipped_vocab_scale_and_sanity():
    vocab = load_vocabulary(ASSET)
    W = vocab.words.shape[0]
    assert W >= 10_000, f"shipped vocabulary too small ({W} words)"
    assert vocab.words_pm1.shape == (W, 256)
    assert np.isfinite(np.asarray(vocab.idf)).all()
    assert (np.asarray(vocab.idf) >= 0).all()
    # words must be (near-)distinct: identical centroids waste capacity
    w = np.asarray(vocab.words)
    uniq = len(np.unique(w, axis=0))
    assert uniq > 0.9 * W, f"only {uniq}/{W} distinct words"


def test_tree_training_small_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    # clustered binary data: 40 ground-truth prototypes with bit noise
    protos = rng.integers(0, 2, (40, 256))
    bits = np.repeat(protos, 50, axis=0)
    flip = rng.random(bits.shape) < 0.03
    bits = bits ^ flip
    desc = np.packbits(bits.astype(np.uint8), axis=1).view(np.uint32).reshape(-1, 8)
    docs = rng.integers(0, 25, (len(desc),))

    vocab = train_vocabulary_tree(desc, branching=8, depth=2, iters=6,
                                  doc_ids=docs, node_sample=2048)
    W = vocab.words.shape[0]
    assert 8 <= W <= 64
    ids = np.asarray(assign_words(vocab, jnp.asarray(desc[:500])))
    assert (ids >= 0).all() and (ids < W).all()
    # clustered data must spread over many words, not collapse to a few
    assert len(np.unique(ids)) >= 8


@pytest.mark.slow
def test_no_cross_scene_false_positives():
    from lpslam_tpu.io.benchmark import SyntheticBenchmark
    from lpslam_tpu.kernels.orb import OrbParams, extract_orb

    vocab = load_vocabulary(ASSET)
    params = OrbParams(num_keypoints=600, num_levels=3)
    ext = jax.jit(lambda im: extract_orb(im, params))

    # 3 visually distinct scenes (unseen seeds: training used 100.. / 500..)
    vecs = {}
    for s, seed in enumerate((7, 17, 27)):
        ds = SyntheticBenchmark(num_frames=3, h=240, w=320, seed=seed,
                                turns=0.02)
        frames = [f.image for f in ds]
        for i in (0, 2):  # two nearby viewpoints of the same place
            f = ext(jnp.asarray(frames[i], jnp.float32))
            vecs[(s, i)] = np.asarray(bow_vector(vocab, f.desc, f.valid))

    gate = LoopConfig().min_score
    same = [float(vecs[(s, 0)] @ vecs[(s, 2)]) for s in range(3)]
    cross = [float(vecs[(a, 0)] @ vecs[(b, 2)])
             for a in range(3) for b in range(3) if a != b]
    assert min(same) > gate, f"same-place scores {same} below gate {gate}"
    assert max(cross) < gate, f"cross-scene scores {cross} reach gate {gate}"
    # and a clear margin between the populations
    assert min(same) > 2.0 * max(cross), (same, cross)
