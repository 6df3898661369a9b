"""Device-resident keyframe / landmark store with fixed capacities.

This replaces the reference engine's pointer-graph map database (OpenVSLAM
map_database of keyframe*/landmark* with covisibility lists, serialized to
map.db — load/save at /root/reference/src/Trackers/OpenVSLAMTrackerBase.cpp:242-295)
with structure-of-arrays device buffers:

- landmarks:   position / descriptor / bookkeeping, (M,) slots + valid mask
- keyframes:   pose + the full fixed-size keypoint set of the frame, (K,) slots
- observations: implicit — keyframe slot n observing landmark l is encoded as
  ``kf_lm_idx[k, n] = l`` (−1 when the keypoint has no landmark), which is
  exactly the (camera, point, uv) triplet list bundle adjustment consumes.

Everything is a pytree of jnp arrays → it jits, shards (dist/ shards the K and
M axes across hosts), and checkpoints (npz, mapstore/checkpoint.py) for the
map.db save/load parity.

Free-slot management is an append-only counter; `compact_map` (host-side,
rare) drops invalidated landmarks / culled keyframes and remaps indices so
long sessions never hit the capacity walls.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MapConfig(NamedTuple):
    max_keyframes: int = 64
    max_landmarks: int = 8192
    num_keypoints: int = 512   # keypoint slots per keyframe (= OrbParams.num_keypoints)


class MapStore(NamedTuple):
    # landmarks
    lm_pos: jnp.ndarray        # (M, 3) float32 world positions
    lm_desc: jnp.ndarray       # (M, 8) uint32 representative descriptor
    lm_valid: jnp.ndarray      # (M,) bool
    lm_n_obs: jnp.ndarray      # (M,) int32 — number of keyframes observing
    lm_first_kf: jnp.ndarray   # (M,) int32 — keyframe that created it
    lm_n_visible: jnp.ndarray  # (M,) int32 — frames where projection predicted
    lm_n_found: jnp.ndarray    # (M,) int32 — frames where actually matched
    # keyframes (Tcw: world -> camera)
    kf_R: jnp.ndarray          # (K, 3, 3)
    kf_t: jnp.ndarray          # (K, 3)
    kf_valid: jnp.ndarray      # (K,) bool
    kf_frame_id: jnp.ndarray   # (K,) int32 — source frame number (timestamps map)
    # per-keyframe keypoints (static N slots each)
    kf_uv: jnp.ndarray         # (K, N, 2) float32 keypoint pixels
    kf_desc: jnp.ndarray       # (K, N, 8) uint32
    kf_kp_valid: jnp.ndarray   # (K, N) bool
    kf_lm_idx: jnp.ndarray     # (K, N) int32 — landmark index or -1
    # counters
    n_kf: jnp.ndarray          # () int32
    n_lm: jnp.ndarray          # () int32


def empty_map(cfg: MapConfig) -> MapStore:
    M, K, N = cfg.max_landmarks, cfg.max_keyframes, cfg.num_keypoints
    return MapStore(
        lm_pos=jnp.zeros((M, 3), jnp.float32),
        lm_desc=jnp.zeros((M, 8), jnp.uint32),
        lm_valid=jnp.zeros((M,), bool),
        lm_n_obs=jnp.zeros((M,), jnp.int32),
        lm_first_kf=jnp.full((M,), -1, jnp.int32),
        lm_n_visible=jnp.zeros((M,), jnp.int32),
        lm_n_found=jnp.zeros((M,), jnp.int32),
        kf_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)).copy(),
        kf_t=jnp.zeros((K, 3), jnp.float32),
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_uv=jnp.zeros((K, N, 2), jnp.float32),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_lm_idx=jnp.full((K, N), -1, jnp.int32),
        n_kf=jnp.int32(0),
        n_lm=jnp.int32(0),
    )


def insert_keyframe_slots(
    m: MapStore,
    R,
    t,
    uv,
    desc,
    kp_valid,
    lm_idx,
    frame_id,
) -> MapStore:
    """Write a keyframe into slot n_kf (functional update). All shapes static.

    lm_idx: (N,) landmark association per keypoint slot (−1 = none).
    Landmark n_obs counters for the newly-associated landmarks are bumped.
    """
    k = m.n_kf
    obs_bump = jnp.zeros_like(m.lm_n_obs).at[jnp.maximum(lm_idx, 0)].add(
        (lm_idx >= 0).astype(jnp.int32)
    )
    return m._replace(
        kf_R=m.kf_R.at[k].set(R),
        kf_t=m.kf_t.at[k].set(t),
        kf_valid=m.kf_valid.at[k].set(True),
        kf_frame_id=m.kf_frame_id.at[k].set(frame_id),
        kf_uv=m.kf_uv.at[k].set(uv),
        kf_desc=m.kf_desc.at[k].set(desc),
        kf_kp_valid=m.kf_kp_valid.at[k].set(kp_valid),
        kf_lm_idx=m.kf_lm_idx.at[k].set(lm_idx),
        lm_n_obs=m.lm_n_obs + obs_bump,
        n_kf=m.n_kf + 1,
    )


# ---------------------------------------------------------------------------
# Keyframe culling + compaction (the engine's mapping-module map maintenance:
# OpenVSLAM culls keyframes whose landmarks are redundantly observed and
# erases dead landmarks, which is what keeps long sessions inside a bounded
# map. Here both are fused into one static-shape device program: flag
# redundant keyframes, drop orphaned landmarks, then stably partition valid
# entries to the front of the fixed-capacity arrays and remap all indices.)
# ---------------------------------------------------------------------------


class CompactResult(NamedTuple):
    map: MapStore
    kf_order: jnp.ndarray     # (K,) new slot -> old slot permutation
    lm_order: jnp.ndarray     # (M,) new slot -> old slot permutation
    n_kf_culled: jnp.ndarray  # () int32


@functools.partial(
    jax.jit, static_argnames=("keep_latest", "force_min_one", "max_cull")
)
def cull_and_compact(
    m: MapStore,
    keep_latest: int = 3,
    redundancy: float = 0.9,
    min_other_obs: int = 3,
    force_min_one: bool = False,
    max_cull: int = 1,
    force_free: int = 0,
) -> CompactResult:
    """Cull redundant keyframes, drop orphaned landmarks, compact the store.

    A keyframe is redundant when >= `redundancy` of its associated landmarks
    are observed by >= `min_other_obs` other keyframes (OpenVSLAM's
    local-map-cleaner rule). The newest `keep_latest` keyframes and the two
    oldest (monocular gauge anchors) are protected. With `force_min_one`,
    the single most redundant cullable keyframe is dropped even below the
    threshold — the capacity-pressure escape hatch.

    Culling proceeds one keyframe at a time for up to `max_cull` passes:
    each pass recomputes every candidate's redundancy with the previous
    culls applied (observation counters decremented), so covisible groups
    are never over-dropped by a mass cull — the engine's cleaner is also
    incremental. The per-keyframe host path uses max_cull=1 (one pass per
    insertion); the chunked device loop runs the boundary pass with
    max_cull sized to the keyframes a chunk can insert, keeping the cull
    rate matched to the insert rate without host round trips.

    `force_free` (traced int, 0 = off): while fewer than this many keyframe
    slots are free, passes cull the most redundant candidate even below the
    redundancy threshold — the dispatch-only form of the capacity escape
    hatch, guaranteeing headroom for the next chunk's insertions so a full
    store can never starve the scan (a store at capacity accrues no new
    observations, so redundancy would otherwise freeze below threshold
    forever).

    Returns the compacted map plus the (new -> old) slot permutations so
    host-side side tables (e.g. the loop-closer's BoW database rows) can be
    remapped: ``db_new = db_old[kf_order]``.
    """
    K, N = m.kf_lm_idx.shape
    M = m.lm_pos.shape[0]
    kf_ids = jnp.arange(K, dtype=jnp.int32)

    lm_idx_flat = jnp.maximum(m.kf_lm_idx, 0).reshape(-1)
    protected = (kf_ids >= m.n_kf - keep_latest) | (kf_ids < 2)

    # --- 1. iterative redundancy culling: one keyframe per pass
    def one_pass(i, carry):
        kf_valid, lm_n_obs, n_culled = carry
        has = (m.kf_lm_idx >= 0) & m.kf_kp_valid & kf_valid[:, None]
        obs = lm_n_obs[jnp.maximum(m.kf_lm_idx, 0)]        # (K, N)
        red = has & (obs >= min_other_obs + 1)
        n_has = jnp.sum(has, axis=1)
        frac = jnp.sum(red, axis=1) / jnp.maximum(n_has, 1).astype(jnp.float32)
        cullable = kf_valid & ~protected & (n_has > 0)
        # capacity escape hatches: force_min_one (first pass only) and
        # force_free (until enough slots are free)
        n_free = K - jnp.sum(kf_valid.astype(jnp.int32))
        force = jnp.logical_or(
            jnp.logical_and(i == 0, force_min_one),
            n_free < force_free,
        )
        score = jnp.where(
            cullable & ((frac >= redundancy) | force), frac, -1.0
        )
        best = jnp.argmax(score)
        cull = (kf_ids == best) & (jnp.max(score) >= 0.0)
        dec_src = (has & cull[:, None]).astype(jnp.int32).reshape(-1)
        dec = jax.ops.segment_sum(dec_src, lm_idx_flat, num_segments=M)
        return (
            kf_valid & ~cull,
            lm_n_obs - dec,
            n_culled + jnp.sum(cull).astype(jnp.int32),
        )

    kf_valid, lm_n_obs, n_culled = jax.lax.fori_loop(
        0, max_cull, one_pass, (m.kf_valid, m.lm_n_obs, jnp.int32(0))
    )
    lm_valid = m.lm_valid & (lm_n_obs > 0)

    # --- 3. landmark compaction: stable partition valid-first + index remap
    lm_order = jnp.argsort(~lm_valid, stable=True)          # new -> old
    lm_new_of = jnp.where(
        lm_valid, jnp.cumsum(lm_valid.astype(jnp.int32)) - 1, -1
    )                                                       # old -> new
    lm_valid_c = lm_valid[lm_order]
    keep = lm_valid_c[:, None]
    lm_pos = jnp.where(keep, m.lm_pos[lm_order], 0.0)
    lm_desc = jnp.where(keep, m.lm_desc[lm_order], 0)
    lm_n_obs_c = jnp.where(lm_valid_c, lm_n_obs[lm_order], 0)
    lm_first_kf = m.lm_first_kf[lm_order]
    lm_n_visible = jnp.where(lm_valid_c, m.lm_n_visible[lm_order], 0)
    lm_n_found = jnp.where(lm_valid_c, m.lm_n_found[lm_order], 0)
    n_lm = jnp.sum(lm_valid).astype(jnp.int32)

    # --- 4. keyframe compaction
    kf_order = jnp.argsort(~kf_valid, stable=True)          # new -> old
    kf_new_of = jnp.where(
        kf_valid, jnp.cumsum(kf_valid.astype(jnp.int32)) - 1, -1
    )                                                       # old -> new
    kf_valid_c = kf_valid[kf_order]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=m.kf_R.dtype), (K, 3, 3))
    kf_R = jnp.where(kf_valid_c[:, None, None], m.kf_R[kf_order], eye)
    kf_t = jnp.where(kf_valid_c[:, None], m.kf_t[kf_order], 0.0)
    kf_frame_id = jnp.where(kf_valid_c, m.kf_frame_id[kf_order], -1)
    kf_uv = jnp.where(kf_valid_c[:, None, None], m.kf_uv[kf_order], 0.0)
    kf_desc = jnp.where(kf_valid_c[:, None, None], m.kf_desc[kf_order], 0)
    kf_kp_valid = m.kf_kp_valid[kf_order] & kf_valid_c[:, None]
    n_kf = jnp.sum(kf_valid).astype(jnp.int32)

    # remap keyframe->landmark associations through both permutations
    old_lm = m.kf_lm_idx[kf_order]
    assoc = (old_lm >= 0) & lm_valid[jnp.maximum(old_lm, 0)] & kf_valid_c[:, None]
    kf_lm_idx = jnp.where(assoc, lm_new_of[jnp.maximum(old_lm, 0)], -1)

    # re-anchor landmarks whose first keyframe was culled to the nearest
    # surviving earlier keyframe (falling back to the first surviving one) —
    # lm_first_kf drives loop-closure landmark re-anchoring
    last_valid_upto = jax.lax.associative_scan(
        jnp.maximum, jnp.where(kf_valid, kf_ids, -1)
    )
    first_valid = jnp.argmax(kf_valid).astype(jnp.int32)
    fk = jnp.clip(lm_first_kf, 0, K - 1)
    fk_alive = kf_valid[fk]
    fk2 = jnp.where(fk_alive, fk, jnp.maximum(last_valid_upto[fk], first_valid))
    lm_first_kf = jnp.where(lm_valid_c, kf_new_of[fk2], -1)

    out = m._replace(
        lm_pos=lm_pos,
        lm_desc=lm_desc,
        lm_valid=lm_valid_c,
        lm_n_obs=lm_n_obs_c,
        lm_first_kf=lm_first_kf,
        lm_n_visible=lm_n_visible,
        lm_n_found=lm_n_found,
        kf_R=kf_R,
        kf_t=kf_t,
        kf_valid=kf_valid_c,
        kf_frame_id=kf_frame_id,
        kf_uv=kf_uv,
        kf_desc=kf_desc,
        kf_kp_valid=kf_kp_valid,
        kf_lm_idx=kf_lm_idx,
        n_kf=n_kf,
        n_lm=n_lm,
    )
    return CompactResult(out, kf_order, lm_order, n_culled)
