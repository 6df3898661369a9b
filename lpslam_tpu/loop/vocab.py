"""Bag-of-binary-words vocabulary — the DBoW2 capability, TPU-shaped.

The reference stack scores place-recognition candidates with a DBoW2 ORB
vocabulary tree (vocab file `orb_vocab.dbow2`,
/root/reference/src/Trackers/OpenVSLAMTrackerBase.h:88; dep recipe
/root/reference/conan-packages/dbow2-conan/conanfile.py). A CPU tree walk is
pointer-chasing; on TPU a FLAT vocabulary is faster and simpler: W binary
centroids resident in HBM, word assignment = one {-1,+1} int8 matmul on the
MXU (argmax similarity == argmin Hamming), BoW vectors are dense (W,) tf-idf
arrays, and keyframe-database queries are a single matvec.

The vocabulary is trained with k-majority (binary k-means): assignment on the
MXU, centroid update by per-bit majority vote — all jitted.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..kernels.match import _unpack_pm1, BITS


class Vocabulary(NamedTuple):
    words: jnp.ndarray      # (W, 8) uint32 binary centroids
    words_pm1: jnp.ndarray  # (W, 256) int8 — matmul-ready unpacked form
    idf: jnp.ndarray        # (W,) float32 inverse-document-frequency weights


def _pack_bits(bits):
    """(N, 256) {0,1} -> (N, 8) uint32."""
    w = jnp.asarray((1 << np.arange(32)).astype(np.uint32))
    return jnp.sum(
        bits.reshape(-1, 8, 32).astype(jnp.uint32) * w, axis=-1, dtype=jnp.uint32
    )


@functools.partial(jax.jit, static_argnames=("n_words", "iters"))
def _kmajority(desc_pm1, n_words: int, iters: int, seed):
    """Binary k-means: centers as +-1 vectors, majority-vote updates."""
    n = desc_pm1.shape[0]
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (n_words,), replace=False)
    centers = desc_pm1[init_idx].astype(jnp.float32)  # (W, 256) in [-1, 1]

    def step(centers, _):
        sim = jnp.dot(
            desc_pm1.astype(jnp.float32), centers.T,
            preferred_element_type=jnp.float32,
        )  # (N, W)
        assign = jnp.argmax(sim, axis=1)
        onehot = jax.nn.one_hot(assign, n_words, dtype=jnp.float32)  # (N, W)
        sums = onehot.T @ desc_pm1.astype(jnp.float32)               # (W, 256)
        counts = jnp.sum(onehot, axis=0)[:, None]
        new_centers = jnp.where(counts > 0, jnp.sign(sums), centers)
        new_centers = jnp.where(new_centers == 0, 1.0, new_centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def train_vocabulary(descriptors, n_words: int = 1024, iters: int = 8, seed: int = 0):
    """descriptors: (N, 8) uint32 training set -> Vocabulary.

    idf is computed treating each training descriptor as one 'document
    sample'; callers may re-estimate from keyframes later.
    """
    pm1 = _unpack_pm1(jnp.asarray(descriptors))
    centers = _kmajority(pm1, n_words, iters, seed)
    bits = (centers > 0).astype(jnp.uint32)
    words = _pack_bits(bits)
    words_pm1 = centers.astype(jnp.int8)
    # document frequency over the training set
    sim = jnp.dot(
        pm1.astype(jnp.float32), centers.T, preferred_element_type=jnp.float32
    )
    assign = jnp.argmax(sim, axis=1)
    df = jnp.zeros((n_words,), jnp.float32).at[assign].add(1.0)
    n = descriptors.shape[0]
    idf = jnp.log(jnp.maximum(n / jnp.maximum(df, 1.0), 1.0))
    return Vocabulary(words=words, words_pm1=words_pm1, idf=idf)


@functools.partial(jax.jit, static_argnames=("n_words", "iters"))
def _kmajority_node(desc_pm1, weight, n_words: int, iters: int, seed):
    """Weighted binary k-means over a FIXED-SIZE node sample (S, 256).

    One compiled program serves every node of the hierarchical training
    recursion (nodes pad/subsample to the same S), so a 32k-leaf tree trains
    with exactly one compile per level-shape instead of one per node.
    weight: (S,) float32 — 0 marks padding rows."""
    key = jax.random.PRNGKey(seed)
    # weighted reservoir-style init: pick rows with probability ~ weight
    score = jax.random.uniform(key, (desc_pm1.shape[0],)) * (weight > 0)
    init_idx = jax.lax.top_k(score, n_words)[1]
    centers = desc_pm1[init_idx].astype(jnp.float32)

    def step(centers, _):
        sim = jnp.dot(desc_pm1.astype(jnp.float32), centers.T,
                      preferred_element_type=jnp.float32)
        assign = jnp.argmax(sim, axis=1)
        onehot = jax.nn.one_hot(assign, n_words, dtype=jnp.float32) * weight[:, None]
        sums = onehot.T @ desc_pm1.astype(jnp.float32)
        counts = jnp.sum(onehot, axis=0)[:, None]
        new_centers = jnp.where(counts > 0, jnp.sign(sums), centers)
        return jnp.where(new_centers == 0, 1.0, new_centers), None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    # final assignment of the (unpadded) rows
    sim = jnp.dot(desc_pm1.astype(jnp.float32), centers.T,
                  preferred_element_type=jnp.float32)
    return centers, jnp.argmax(sim, axis=1)


def train_vocabulary_tree(descriptors, branching: int = 32, depth: int = 3,
                          iters: int = 8, seed: int = 0,
                          node_sample: int = 8192,
                          doc_ids=None, progress=None) -> Vocabulary:
    """Hierarchical k-majority training to branching**depth leaves — the
    DBoW2 vocabulary-tree scale (orb_vocab.dbow2 is a 10^6-leaf tree;
    conan-packages/dbow2-conan/conanfile.py) — trained the TPU way.

    Training is hierarchical because flat k-means at W=32k is intractable
    (the one-hot assignment matrix alone is N x W); each node's k-majority
    runs on a fixed-size device sample so ONE compiled program serves every
    node. The RUNTIME stays flat: the leaves are flattened into a (W, 256)
    int8 matrix and word assignment is a single MXU matmul over all of them
    (exact nearest-word, strictly better than DBoW2's approximate tree walk,
    and one op instead of `depth` dependent gathers).

    doc_ids: optional (N,) int array mapping each training descriptor to its
    source frame — idf is then computed over frames (documents), matching
    tf-idf semantics; default treats each descriptor as its own document.
    """
    desc = np.asarray(descriptors)
    n = len(desc)
    rng = np.random.default_rng(seed)
    pm1_all = np.asarray(_unpack_pm1(jnp.asarray(desc)), np.int8)

    def sample_node(idx):
        """Fixed-size (node_sample, 256) view of a node's descriptors."""
        take = idx if len(idx) <= node_sample else rng.choice(
            idx, node_sample, replace=False)
        pad = node_sample - len(take)
        w = np.ones(node_sample, np.float32)
        if pad:
            w[len(take):] = 0.0
            take = np.concatenate([take, np.full(pad, idx[0])])
        return pm1_all[take], w

    # recursion by level: nodes = list of descriptor-index arrays
    nodes = [np.arange(n)]
    leaves = []
    for level in range(depth):
        nxt = []
        for ni, idx in enumerate(nodes):
            if len(idx) < 2 * branching:
                # too small to split further — its own leaf (majority vector)
                leaves.append(idx)
                continue
            sub, w = sample_node(idx)
            centers, _ = _kmajority_node(
                jnp.asarray(sub), jnp.asarray(w), branching, iters,
                seed + level * 131 + ni,
            )
            # assign ALL of the node's descriptors to the children (batched)
            ass = np.asarray(jnp.argmax(
                jnp.dot(jnp.asarray(pm1_all[idx], jnp.float32),
                        centers.T, precision=jax.lax.Precision.HIGHEST),
                axis=1))
            for c in range(branching):
                child = idx[ass == c]
                if len(child) == 0:
                    continue
                if level == depth - 1:
                    leaves.append(child)
                else:
                    nxt.append(child)
        nodes = nxt
        if progress:
            progress(level, len(nodes), len(leaves))
    leaves.extend(nodes)  # any non-terminal stragglers

    # leaf centroids: per-bit majority vote over the leaf's members
    W = len(leaves)
    words_bits = np.zeros((W, BITS), np.uint8)
    df = np.zeros((W,), np.float64)
    docs = np.asarray(doc_ids) if doc_ids is not None else np.arange(n)
    n_docs = len(np.unique(docs))
    for wi, idx in enumerate(leaves):
        votes = pm1_all[idx].sum(axis=0)
        words_bits[wi] = votes > 0
        df[wi] = len(np.unique(docs[idx]))
    words = np.asarray(_pack_bits(jnp.asarray(words_bits)))
    idf = np.log(np.maximum(n_docs / np.maximum(df, 1.0), 1.0)).astype(np.float32)
    pm1 = (words_bits.astype(np.int8) * 2 - 1)
    return Vocabulary(words=jnp.asarray(words), words_pm1=jnp.asarray(pm1),
                      idf=jnp.asarray(idf))


def assign_words(vocab: Vocabulary, desc, valid=None):
    """(N,8) descriptors -> (N,) word ids (argmin Hamming via MXU matmul)."""
    pm1 = _unpack_pm1(desc)
    sim = jax.lax.dot_general(
        pm1, vocab.words_pm1,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    ids = jnp.argmax(sim, axis=1).astype(jnp.int32)
    if valid is not None:
        ids = jnp.where(valid, ids, -1)
    return ids


def bow_vector(vocab: Vocabulary, desc, valid):
    """tf-idf BoW vector (W,) float32, L2-normalized."""
    ids = assign_words(vocab, desc, valid)
    W = vocab.words.shape[0]
    tf = jnp.zeros((W,), jnp.float32).at[jnp.maximum(ids, 0)].add(
        valid.astype(jnp.float32)
    )
    v = tf * vocab.idf
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-9)


def bow_similarity(query_vec, db_vecs):
    """Cosine similarity of one query against a (K, W) database: one matvec."""
    return db_vecs @ query_vec


def save_vocabulary(vocab: Vocabulary, path: str) -> None:
    """Persist a vocabulary (the role of the reference's orb_vocab.dbow2 file,
    /root/reference/src/Trackers/OpenVSLAMTrackerBase.h:88)."""
    np.savez_compressed(
        path if path.endswith(".npz") else path + ".npz",
        words=np.asarray(vocab.words),
        idf=np.asarray(vocab.idf),
    )


def load_vocabulary(path: str) -> Vocabulary:
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    words = jnp.asarray(data["words"])
    pm1 = _unpack_pm1(words).astype(jnp.int8)
    return Vocabulary(words=words, words_pm1=pm1, idf=jnp.asarray(data["idf"]))
