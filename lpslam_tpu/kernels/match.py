"""Binary-descriptor matching: Hamming distances on the VPU/MXU, masked
mutual-nearest-neighbor and projection-window matching.

TPU-native design: the reference engine matches descriptors with per-keypoint
loops and early-outs (CPU-friendly); here matching is a dense masked distance
matrix — XOR+popcount on packed uint32 lanes for small sets, or an int8
(+1/-1) matmul reformulation that runs on the MXU for large sets
(d_ham = (256 - dot(a_pm1, b_pm1)) / 2). Dense + mask beats sparse + branch on
this hardware by a wide margin.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BITS = 256
WORDS = 8
BIG = jnp.float32(1e9)


def hamming_matrix(desc_a, desc_b):
    """(Na,8)x(Nb,8) uint32 -> (Na,Nb) int32 Hamming distances (popcount)."""
    x = desc_a[:, None, :] ^ desc_b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def _unpack_pm1(desc):
    """(N,8) uint32 -> (N,256) int8 in {-1,+1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], BITS).astype(jnp.int8)
    return bits * jnp.int8(2) - jnp.int8(1)


def hamming_matrix_mxu(desc_a, desc_b):
    """Hamming distances via +/-1 int8 matmul on the MXU.

    dot(a,b) over {-1,+1}^256 = 256 - 2*hamming  =>  h = (256 - dot)/2.
    """
    a = _unpack_pm1(desc_a)
    b = _unpack_pm1(desc_b)
    dot = jax.lax.dot_general(
        a,
        b,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (BITS - dot) // 2


def match_mutual_nn(
    desc_a,
    desc_b,
    valid_a,
    valid_b,
    max_distance: int = 50,
    ratio: float = 0.9,
    use_mxu: bool = True,
):
    """Mutual nearest-neighbor matching with Lowe ratio and distance gates.

    Returns (idx_b (Na,) int32, ok (Na,) bool): for each a-keypoint, its
    matched b index (valid only where ok).
    """
    D = (hamming_matrix_mxu if use_mxu else hamming_matrix)(desc_a, desc_b)
    D = D.astype(jnp.float32)
    D = jnp.where(valid_a[:, None] & valid_b[None, :], D, BIG)

    best_b = jnp.argmin(D, axis=1)
    na = desc_a.shape[0]
    rows = jnp.arange(na)
    d1 = D[rows, best_b]
    D2 = D.at[rows, best_b].set(BIG)
    d2 = jnp.min(D2, axis=1)

    best_a_of_b = jnp.argmin(D, axis=0)  # (Nb,)
    mutual = best_a_of_b[best_b] == rows

    ok = (
        mutual
        & (d1 <= max_distance)
        & (d1 <= ratio * d2)
        & valid_a
    )
    return best_b.astype(jnp.int32), ok


def match_projected(
    desc_q,
    uv_q,
    valid_q,
    desc_kp,
    uv_kp,
    valid_kp,
    radius: float,
    max_distance: int = 80,
    use_mxu: bool = True,
):
    """Match query items (e.g. projected landmarks) against frame keypoints
    within a pixel search window — the tracking matcher.

    desc_q: (Nq,8) descriptors of queries; uv_q: (Nq,2) predicted pixels.
    desc_kp/uv_kp: frame keypoints. Returns (idx (Nq,), ok (Nq,)).
    """
    D = (hamming_matrix_mxu if use_mxu else hamming_matrix)(desc_q, desc_kp)
    D = D.astype(jnp.float32)
    d2px = jnp.sum((uv_q[:, None, :] - uv_kp[None, :, :]) ** 2, axis=-1)
    in_window = d2px <= radius * radius
    D = jnp.where(in_window & valid_q[:, None] & valid_kp[None, :], D, BIG)

    best = jnp.argmin(D, axis=1)
    rows = jnp.arange(desc_q.shape[0])
    d1 = D[rows, best]
    ok = (d1 <= max_distance) & valid_q
    return best.astype(jnp.int32), ok


def orientation_consistency(angle_a, angle_b, idx, ok, bins: int = 30, keep_top: int = 3):
    """Histogram-filter matches by rotation consistency (the reference engine's
    check-orientation step): keep matches whose angle difference falls in the
    `keep_top` most-populated of `bins` histogram bins.
    """
    diff = angle_a - angle_b[idx]
    diff = jnp.mod(diff + np.pi, 2 * np.pi) - np.pi
    bin_idx = jnp.clip(
        ((diff + np.pi) * (bins / (2 * np.pi))).astype(jnp.int32), 0, bins - 1
    )
    hist = jnp.zeros((bins,), jnp.int32).at[bin_idx].add(ok.astype(jnp.int32))
    top_bins = jax.lax.top_k(hist, keep_top)[1]
    in_top = jnp.any(bin_idx[:, None] == top_bins[None, :], axis=1)
    return ok & in_top
