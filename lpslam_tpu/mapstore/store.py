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

from typing import NamedTuple

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
