"""Monocular tracking frontend: the per-frame hot loop.

Maps the reference's tracking path (OpenVSLAMTracker::processImage →
feed_monocular_frame → [engine] ORB extract → match local map → pose-only BA →
keyframe decision, /root/reference/src/Trackers/OpenVSLAMTracker.cpp:31-166)
onto a TPU-native split:

- device (jitted, static shapes): ORB extraction, landmark projection +
  windowed matching, annealed pose-only GN, keyframe insertion with
  triangulation — each one fused XLA program over the fixed-capacity MapStore.
- host (this file's MonoTracker class): the tracker state machine
  (NotInitialized / Initializing / Tracking / Lost — same states the reference
  surfaces, OpenVSLAMTracker.cpp:129-140), constant-velocity prediction, and
  keyframe policy from device-returned scalars. Host↔device traffic per frame
  is one image up + a handful of scalars down.
"""
from __future__ import annotations

import functools
from enum import IntEnum
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3, se3_compose, se3_inverse
from ..geometry.camera import PinholeCamera, project_pinhole
from ..kernels.orb import OrbParams, OrbFeatures, extract_orb
from ..kernels.match import match_mutual_nn, match_projected, orientation_consistency
from ..mapstore.store import (
    MapStore,
    MapConfig,
    empty_map,
    insert_keyframe_slots,
    cull_and_compact,
)
from .pose_opt import pose_only_optimize
from .triangulate import triangulate_midpoint
from .init2v import two_view_init_homography


class TrackerStatus(IntEnum):
    NOT_INITIALIZED = 0
    INITIALIZING = 1
    TRACKING = 2
    LOST = 3


class TrackerConfig(NamedTuple):
    orb: OrbParams = OrbParams()
    map_cfg: MapConfig = MapConfig()
    match_radius: float = 25.0
    match_radius_lost: float = 50.0
    match_max_hamming: int = 80
    min_inliers: int = 25
    init_min_matches: int = 60
    init_min_flow_px: float = 20.0  # median match displacement before trying init
    kf_min_interval: int = 3
    kf_max_interval: int = 5
    kf_inlier_ratio: float = 0.85  # new KF when inliers < ratio * inliers@lastKF
    tri_max_reproj_px: float = 4.0
    tri_min_parallax_cos: float = 0.99998
    tri_min_depth: float = 0.05
    tri_max_depth: float = 1e4
    local_ba_window: int = 6
    local_ba_iters: int = 6
    # covisibility-window local BA: the two older keyframes most covisible
    # with the newest join (and anchor) the window; falls back to temporal
    # anchors when no older covisible keyframes exist yet
    local_ba_covisibility: bool = True
    # in-scan BA rate cap (frames): when keyframes arrive faster than this,
    # intermediate keyframes skip their window BA and the next due keyframe
    # optimizes them as part of its window — the device analog of the
    # engine's mapping thread ABORTING local BA when its keyframe queue
    # backs up (openvslam mapping_module abort_local_BA). 0 = BA on every
    # keyframe (the host path's cadence).
    scan_ba_min_interval: int = 8
    # per-mode cadence: depth modes (stereo/rgbd) insert keyframes denser
    # than mono, so the mono rate cap skips a larger fraction of their BAs
    # — measured ~17% ATE cost on short bursts (PERF.md r4). Depth-seeded
    # maps also make each window BA cheaper (no scale drift to absorb), so
    # the depth modes default to BA on EVERY keyframe, restoring host-path
    # accuracy parity in the chunk loop.
    scan_ba_min_interval_depth: int = 0
    # keyframe culling + compaction (engine mapping-module map maintenance):
    # after each keyframe insertion, keyframes whose landmarks are seen by
    # >= kf_cull_min_other_obs other keyframes at >= kf_cull_redundancy
    # fraction are dropped and the store is compacted, so long sessions
    # never hit the fixed-capacity walls
    kf_culling: bool = True
    kf_cull_redundancy: float = 0.9
    kf_cull_min_other_obs: int = 3
    kf_cull_keep_latest: int = 3
    # asynchronous mapping (the reference runs tracking ∥ mapping threads,
    # OpenVSLAMTrackerBase.cpp:238-255): the keyframe pipeline (insert +
    # triangulate + local BA + cull/compact) is DISPATCHED at the keyframe
    # frame but the result map is adopted at the NEXT frame, so the keyframe
    # frame never waits for mapping — tracking continues on the last
    # published map while the device works. Adoption at a frame boundary
    # keeps replay deterministic.
    async_mapping: bool = True
    # local-map size for per-frame matching (track_frame local_cap): the
    # tracking matcher sees the best `track_local_cap` landmarks (visible
    # first), not the whole store — matching cost scales with the local map
    # like the reference engine's local-map tracking. 0 = unlimited.
    track_local_cap: int = 4096
    # constant-velocity prediction gain. 1.0 = full velocity extrapolation;
    # 0.0 = constant-position. Values < 1 damp the pose-error feedback loop
    # (prediction error feeds match selection feeds the next pose): with gain
    # g the per-frame error recursion is err' ≈ bias + k·(1+g)·err, so g must
    # keep k(1+g) < 1. 0.5 is stable for ~30 fps sequences; fast platforms
    # can raise it together with match_radius.
    velocity_gain: float = 0.5


class TrackResult(NamedTuple):
    pose: SE3
    n_inliers: jnp.ndarray
    kp_lm_idx: jnp.ndarray     # (N,) landmark id per frame keypoint (-1 none)
    n_visible: jnp.ndarray
    map: MapStore              # with updated landmark visibility statistics
    sigma_pos: jnp.ndarray = None   # (3,) camera-center std-dev (world frame)
    sigma_rot: jnp.ndarray = None   # () rotation std-dev [rad]


# ---------------------------------------------------------------------------
# Device steps
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("local_cap",))
def track_frame(
    m: MapStore,
    pose_pred: SE3,
    cam: PinholeCamera,
    feats: OrbFeatures,
    radius: float,
    max_hamming: int,
    local_cap: Optional[int] = None,
) -> TrackResult:
    """Project the map into the predicted view, match in windows, optimize.

    local_cap: match against at most this many landmarks — the currently
    visible ones, ranked by found-ratio, selected with one top_k. This is
    the TPU shape of the engine's LOCAL map (the reference never matches the
    whole database either): matching cost scales with the local-map size,
    not the store capacity. None = use every landmark slot.
    """
    P = m.lm_pos.shape[0]
    p_c = jnp.einsum("ij,nj->ni", pose_pred.R, m.lm_pos) + pose_pred.t
    uv_pred_full = project_pinhole(cam, p_c)
    h_margin = 0.0
    visible_full = (
        m.lm_valid
        & (p_c[:, 2] > 1e-3)
        & (uv_pred_full[:, 0] >= -h_margin)
        & (uv_pred_full[:, 1] >= -h_margin)
    )
    if local_cap is not None and local_cap < P:
        found_ratio = m.lm_n_found.astype(jnp.float32) / (
            m.lm_n_visible.astype(jnp.float32) + 1.0
        )
        score = visible_full.astype(jnp.float32) * 2.0 + found_ratio
        _, sel = jax.lax.top_k(score, local_cap)
        sel = sel.astype(jnp.int32)
    else:
        sel = jnp.arange(P, dtype=jnp.int32)
    lm_pos = m.lm_pos[sel]
    lm_desc = m.lm_desc[sel]
    lm_valid = m.lm_valid[sel]
    visible = visible_full[sel]
    uv_pred = uv_pred_full[sel]

    idx, ok = match_projected(
        lm_desc,
        uv_pred,
        visible,
        feats.desc,
        feats.xy,
        feats.valid,
        radius=radius,
        max_distance=max_hamming,
    )
    uv_obs = feats.xy[idx]
    sigma2 = jnp.float32(1.2) ** (2.0 * feats.level[idx].astype(jnp.float32))
    # 6 annealed iterations converge identically to 10 on the e2e ATE
    # benchmarks; the pose solve is latency-bound (serial 6x6 solves)
    res = pose_only_optimize(
        pose_pred, cam, lm_pos, uv_obs, ok, sigma2=sigma2, iters=6
    )
    # second stage (the engine's track-local-map refine): re-project with the
    # optimized pose, re-match in a tight window, re-optimize
    p_c2 = jnp.einsum("ij,nj->ni", res.pose.R, lm_pos) + res.pose.t
    uv_pred2 = project_pinhole(cam, p_c2)
    visible2 = lm_valid & (p_c2[:, 2] > 1e-3)
    idx, ok = match_projected(
        lm_desc, uv_pred2, visible2, feats.desc, feats.xy, feats.valid,
        radius=6.0, max_distance=max_hamming,
    )
    uv_obs = feats.xy[idx]
    sigma2 = jnp.float32(1.2) ** (2.0 * feats.level[idx].astype(jnp.float32))
    res = pose_only_optimize(
        res.pose, cam, lm_pos, uv_obs, ok, sigma2=sigma2, iters=4
    )
    # invert association: frame keypoint -> FULL-store landmark id
    n_kp = feats.xy.shape[0]
    kp_lm = jnp.full((n_kp,), -1, jnp.int32)
    good_lm = ok & res.inlier
    kp_lm = kp_lm.at[jnp.where(good_lm, idx, n_kp)].set(
        jnp.where(good_lm, sel, -1), mode="drop"
    )
    # landmark visibility statistics (engine landmark-culling bookkeeping),
    # scattered back through the selection
    vis_upd = jnp.zeros((P,), jnp.int32).at[sel].add(visible2.astype(jnp.int32))
    found_upd = jnp.zeros((P,), jnp.int32).at[sel].add(good_lm.astype(jnp.int32))
    m = m._replace(
        lm_n_visible=m.lm_n_visible + vis_upd,
        lm_n_found=m.lm_n_found + found_upd,
    )
    return TrackResult(
        pose=res.pose,
        n_inliers=res.n_inliers,
        kp_lm_idx=kp_lm,
        n_visible=jnp.sum(visible2).astype(jnp.int32),
        map=m,
        sigma_pos=res.sigma_pos,
        sigma_rot=res.sigma_rot,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def insert_keyframe(
    m: MapStore,
    pose: SE3,
    cam: PinholeCamera,
    feats: OrbFeatures,
    kp_lm_idx,
    frame_id,
    cfg: TrackerConfig,
) -> MapStore:
    """Write the current frame as a keyframe and triangulate new landmarks
    against the previous keyframe (the mapping-thread capability of the
    reference engine, executed inline as one fused device program)."""
    # landmark culling (engine mapping-thread parity): drop landmarks that
    # kept failing to match where predicted visible
    poor = (m.lm_n_visible >= 8) & (
        m.lm_n_found.astype(jnp.float32)
        < 0.25 * m.lm_n_visible.astype(jnp.float32)
    )
    m = m._replace(lm_valid=m.lm_valid & ~poor)

    m = insert_keyframe_slots(
        m, pose.R, pose.t, feats.xy, feats.desc, feats.valid, kp_lm_idx, frame_id
    )
    return triangulate_new_landmarks(m, cam, cfg)


def triangulate_new_landmarks(m: MapStore, cam: PinholeCamera, cfg: TrackerConfig) -> MapStore:
    """Triangulate the newest keyframe's unassociated keypoints against the
    previous keyframe and append surviving points as landmarks. Used by the
    mono keyframe step and by the stereo path for beyond-depth-threshold
    ('far') points the direct depth pipeline rejects."""
    k_new = m.n_kf - 1
    ref = jnp.maximum(m.n_kf - 2, 0)
    feats_xy = m.kf_uv[k_new]
    feats_desc = m.kf_desc[k_new]
    pose = SE3(m.kf_R[k_new], m.kf_t[k_new])
    kp_lm_idx = m.kf_lm_idx[k_new]

    # --- match unassociated keypoints new <-> ref
    new_unassoc = m.kf_kp_valid[k_new] & (kp_lm_idx < 0)
    ref_unassoc = m.kf_kp_valid[ref] & (m.kf_lm_idx[ref] < 0)
    idx_ref, ok = match_mutual_nn(
        feats_desc,
        m.kf_desc[ref],
        new_unassoc,
        ref_unassoc,
        max_distance=cfg.match_max_hamming,
        ratio=0.9,
    )

    T_ref = SE3(m.kf_R[ref], m.kf_t[ref])
    uv_ref = m.kf_uv[ref][idx_ref]
    pts, info = triangulate_midpoint(T_ref, pose, cam, uv_ref, feats_xy)

    # quality gates
    uv1_hat = project_pinhole(
        cam, jnp.einsum("ij,nj->ni", T_ref.R, pts) + T_ref.t
    )
    uv2_hat = project_pinhole(cam, jnp.einsum("ij,nj->ni", pose.R, pts) + pose.t)
    e1 = jnp.sum((uv1_hat - uv_ref) ** 2, -1)
    e2 = jnp.sum((uv2_hat - feats_xy) ** 2, -1)
    good = (
        ok
        & (info["z1"] > cfg.tri_min_depth)
        & (info["z2"] > cfg.tri_min_depth)
        & (info["z1"] < cfg.tri_max_depth)
        & (info["z2"] < cfg.tri_max_depth)
        & (info["cos_parallax"] < cfg.tri_min_parallax_cos)
        & (e1 < cfg.tri_max_reproj_px**2)
        & (e2 < cfg.tri_max_reproj_px**2)
    )

    # allocate landmark slots: n_lm + rank among good
    M = m.lm_pos.shape[0]
    rank = jnp.cumsum(good.astype(jnp.int32)) - 1
    slot = jnp.where(good, m.n_lm + rank, M)
    slot = jnp.where(slot < M, slot, M)  # M = dropped by scatter mode="drop"
    n_new = jnp.sum((slot < M) & good).astype(jnp.int32)

    lm_pos = m.lm_pos.at[slot].set(pts, mode="drop")
    lm_desc = m.lm_desc.at[slot].set(feats_desc, mode="drop")
    lm_valid = m.lm_valid.at[slot].set(True, mode="drop")
    lm_n_obs = m.lm_n_obs.at[slot].set(2, mode="drop")
    lm_first_kf = m.lm_first_kf.at[slot].set(k_new, mode="drop")

    # associate both keyframes with the new landmarks
    n_kp = feats_xy.shape[0]
    slot_i32 = slot.astype(jnp.int32)
    new_lm_for_kp = jnp.where((slot < M) & good, slot_i32, -1)
    kf_lm_new = jnp.where(new_lm_for_kp >= 0, new_lm_for_kp, m.kf_lm_idx[k_new])
    # ref keyframe: scatter at idx_ref positions
    ref_rows = jnp.where((slot < M) & good, idx_ref, n_kp)
    kf_lm_ref = m.kf_lm_idx[ref].at[ref_rows].set(
        jnp.where((slot < M) & good, slot_i32, -1), mode="drop"
    )

    kf_lm_idx_all = m.kf_lm_idx.at[k_new].set(kf_lm_new)
    kf_lm_idx_all = kf_lm_idx_all.at[ref].set(kf_lm_ref)

    return m._replace(
        lm_pos=lm_pos,
        lm_desc=lm_desc,
        lm_valid=lm_valid,
        lm_n_obs=lm_n_obs,
        lm_first_kf=lm_first_kf,
        kf_lm_idx=kf_lm_idx_all,
        n_lm=jnp.minimum(m.n_lm + n_new, M),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _jit_triangulate(m: MapStore, cam: PinholeCamera, cfg: TrackerConfig) -> MapStore:
    return triangulate_new_landmarks(m, cam, cfg)


@functools.partial(jax.jit, static_argnames=("params",))
def _extract(img, params: OrbParams):
    return extract_orb(img, params)


@jax.jit
def _apply_mask(feats: OrbFeatures, mask) -> OrbFeatures:
    """Invalidate keypoints falling on masked-out pixels (tracker mask
    parity: radial / image masks, OpenVSLAMTrackerBase.cpp:331-380)."""
    h, w = mask.shape
    xi = jnp.clip(feats.xy[:, 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(feats.xy[:, 1].astype(jnp.int32), 0, h - 1)
    keep = mask[yi, xi]
    return feats._replace(valid=feats.valid & keep)


# ---------------------------------------------------------------------------
# Host state machine
# ---------------------------------------------------------------------------


class MonoTracker:
    """Host-side orchestration of the device tracking steps.

    Mirrors the reference tracker's lifecycle: feed frames, observe
    NotInitialized → Initializing → Tracking (→ Lost), read back poses.
    """

    def __init__(self, cam: PinholeCamera, cfg: TrackerConfig = TrackerConfig()):
        self.cam = cam
        self.cfg = cfg
        self.map = empty_map(cfg.map_cfg)
        self.status = TrackerStatus.NOT_INITIALIZED
        self.pose = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        self.velocity = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        self.frame_id = 0
        self.last_kf_frame = -(10**9)
        self.inliers_at_last_kf = 1
        self._init_feats: Optional[OrbFeatures] = None
        self._init_frame_id = -1
        # pose uncertainty of the last tracked frame (Space.h value+sigma
        # parity; from pose_only_optimize's inlier covariance)
        self.last_sigma_pos = np.zeros(3, np.float32)
        self.last_sigma_rot = 0.0
        self.last_n_inliers = 0
        self.trajectory: list = []  # (frame_id, SE3 Tcw, status)
        # compaction events since last drain: (kf_order np array, n_kf after).
        # Host-side side tables keyed by keyframe slot (loop-closer BoW rows)
        # consume these to stay aligned with the compacted store.
        self._compactions: list = []
        # async-mapping state: result of the in-flight keyframe pipeline
        # (map, CompactResult|None), adopted at the next frame boundary
        self._pending_map = None
        # CompactResults whose n_culled scalar hasn't been read back yet
        self._pending_compacts: list = []
        # host-side keyframe count (inserts minus drained culls) — lets the
        # keyframe policy run without blocking on in-flight device work
        self._kf_count = 0

    # -- internal helpers ---------------------------------------------------

    # Monocular init needs two frames with baseline; depth-capable trackers
    # (stereo / RGB-D subclasses) bootstrap from a single frame.
    _needs_two_frames = True
    # False = localization-only mode: track against the existing map, never
    # insert keyframes (reference disable_mapping_module / mappingSetMode)
    mapping_enabled = True
    # optional (H, W) bool device array — True where keypoints are allowed
    mask = None

    def set_mask(self, mask) -> None:
        """Install a keypoint mask (True/nonzero = keep)."""
        self.mask = None if mask is None else jnp.asarray(mask).astype(bool)

    def _extract(self, image) -> OrbFeatures:
        img = jnp.asarray(image, jnp.float32)
        feats = _extract(img, self.cfg.orb)
        if self.mask is not None:
            feats = _apply_mask(feats, self.mask)
        return feats

    def _try_initialize(self, feats: OrbFeatures, aux=None) -> bool:
        f0 = self._init_feats
        idx, ok = match_mutual_nn(
            f0.desc, feats.desc, f0.valid, feats.valid,
            max_distance=self.cfg.match_max_hamming, ratio=0.85,
        )
        # rotation-consistency histogram filter (engine check-orientation)
        ok = orientation_consistency(f0.angle, feats.angle, idx, ok)
        n_matches = int(jnp.sum(ok))
        if n_matches < self.cfg.init_min_matches:
            return False
        uv1 = f0.xy
        uv2 = feats.xy[idx]
        # require real baseline before attempting reconstruction: a near-zero
        # parallax homography decomposes into garbage (d1≈d2≈d3 degenerate)
        flow = jnp.linalg.norm(uv2 - uv1, axis=-1)
        okf = np.asarray(ok)
        med_flow = float(np.median(np.asarray(flow)[okf])) if okf.any() else 0.0
        if med_flow < self.cfg.init_min_flow_px:
            return False
        res = two_view_init_homography(self.cam, uv1, uv2, ok)
        if not bool(res.ok):
            return False

        R2 = res.T2cw[:9].reshape(3, 3)
        t2 = res.T2cw[9:]
        T2 = SE3(R2, t2)
        T1 = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))

        # build the map: two keyframes + triangulated landmarks
        m = empty_map(self.cfg.map_cfg)
        point_ok = res.point_ok
        Mcap = m.lm_pos.shape[0]
        rank = jnp.cumsum(point_ok.astype(jnp.int32)) - 1
        slot = jnp.where(point_ok, rank, Mcap)
        n_new = int(jnp.sum(point_ok))

        m = m._replace(
            lm_pos=m.lm_pos.at[slot].set(res.points, mode="drop"),
            lm_desc=m.lm_desc.at[slot].set(f0.desc, mode="drop"),
            lm_valid=m.lm_valid.at[slot].set(True, mode="drop"),
            lm_n_obs=m.lm_n_obs.at[slot].set(2, mode="drop"),
            lm_first_kf=m.lm_first_kf.at[slot].set(0, mode="drop"),
            n_lm=jnp.int32(n_new),
        )
        slot_i32 = slot.astype(jnp.int32)
        lm_idx_kf0 = jnp.where(point_ok, slot_i32, -1)
        # keyframe 0 (reference frame of the init pair)
        m = insert_keyframe_slots(
            m, T1.R, T1.t, f0.xy, f0.desc, f0.valid, lm_idx_kf0, self._init_frame_id
        )
        # keyframe 1 (current): landmark j observed at feats slot idx[j]
        n_kp = feats.xy.shape[0]
        rows = jnp.where(point_ok, idx, n_kp)
        lm_idx_kf1 = jnp.full((n_kp,), -1, jnp.int32).at[rows].set(
            jnp.where(point_ok, slot_i32, -1), mode="drop"
        )
        m = insert_keyframe_slots(
            m, T2.R, T2.t, feats.xy, feats.desc, feats.valid, lm_idx_kf1, self.frame_id
        )

        # polish the bootstrap geometry with a two-view BA (cam0 fixed,
        # cam1 + points free), then restore the |t|=1 scale gauge — the init
        # bias otherwise gets locked in as the BA gauge anchor forever
        from ..backend.ba import bundle_adjust, BAProblem

        prob = BAProblem(
            cam_R=m.kf_R[:2],
            cam_t=m.kf_t[:2],
            points=m.lm_pos,
            obs_lm=jnp.where(m.kf_kp_valid[:2], m.kf_lm_idx[:2], -1),
            obs_uv=m.kf_uv[:2],
            obs_sigma2=jnp.ones(m.kf_lm_idx[:2].shape, jnp.float32),
            cam_fixed=jnp.asarray([True, False]),
            point_valid=m.lm_valid,
        )
        bres = bundle_adjust(prob, self.cam, iters=12)
        scale = 1.0 / jnp.maximum(jnp.linalg.norm(bres.cam_t[1]), 1e-9)
        m = m._replace(
            kf_R=m.kf_R.at[1].set(bres.cam_R[1]),
            kf_t=m.kf_t.at[:2].set(bres.cam_t[:2] * scale),
            lm_pos=jnp.where(m.lm_valid[:, None], bres.points * scale, m.lm_pos),
        )
        T2 = SE3(m.kf_R[1], m.kf_t[1])

        self.map = m
        self.pose = T2
        self.velocity = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        self.last_kf_frame = self.frame_id
        self.inliers_at_last_kf = max(n_new, 1)
        self._kf_count = 2
        return True

    def _local_cap(self) -> Optional[int]:
        cap = self.cfg.track_local_cap
        return cap if cap and cap < self.cfg.map_cfg.max_landmarks else None

    def _keyframe_needed(self, n_inliers: int) -> bool:
        since = self.frame_id - self.last_kf_frame
        if since < self.cfg.kf_min_interval:
            return False
        if since >= self.cfg.kf_max_interval:
            return True
        return n_inliers < self.cfg.kf_inlier_ratio * self.inliers_at_last_kf

    # -- public API ---------------------------------------------------------

    def process(self, image, aux=None, nav_prior=None) -> tuple:
        """Feed one frame. Returns (status, pose Tcw as SE3|None).

        aux: sensor-specific extra input (right image for stereo, depth map
        for RGB-D) — unused by the monocular tracker.
        nav_prior: optional SE3 Tcw pose prediction from navigation data
        (odometry delta composed on the last pose, or a map-frame state) —
        replaces the constant-velocity prediction when present, matching the
        engine's per-feed navigation_state prior
        (/root/reference/src/Trackers/OpenVSLAMTracker.cpp:76-120).
        """
        # frame boundary: adopt the previous frame's mapping result (async
        # mapping double-buffer — see TrackerConfig.async_mapping)
        self._adopt_pending_map()
        feats = self._extract(image)
        self.last_feats = feats  # exposed for BoW relocalization / recording
        st = self.status

        if st == TrackerStatus.NOT_INITIALIZED:
            if self._needs_two_frames:
                self._init_feats = feats
                self._init_frame_id = self.frame_id
                self.status = TrackerStatus.INITIALIZING
                self._record(None)
            else:
                if self._try_initialize(feats, aux):
                    self.status = TrackerStatus.TRACKING
                    self._record(self.pose)
                else:
                    self._record(None)
        elif st == TrackerStatus.INITIALIZING:
            if self._try_initialize(feats, aux):
                self.status = TrackerStatus.TRACKING
                self._record(self.pose)
            else:
                # periodically re-anchor the reference frame like the engine's
                # initializer reset
                if self.frame_id - self._init_frame_id > 20:
                    self._init_feats = feats
                    self._init_frame_id = self.frame_id
                self._record(None)
        else:  # TRACKING or LOST
            lost = st == TrackerStatus.LOST
            if nav_prior is not None:
                pred = nav_prior
            elif lost:
                pred = self.pose
            else:
                pred = se3_compose(self.velocity, self.pose)
            radius = self.cfg.match_radius_lost if lost else self.cfg.match_radius
            tr = track_frame(
                self.map, pred, self.cam, feats, radius,
                self.cfg.match_max_hamming, local_cap=self._local_cap(),
            )
            self.map = tr.map  # adopt visibility statistics
            n_inl = int(tr.n_inliers)
            self.last_n_inliers = n_inl
            if tr.sigma_pos is not None:
                self.last_sigma_pos = np.asarray(tr.sigma_pos)
                self.last_sigma_rot = float(tr.sigma_rot)
            if n_inl >= self.cfg.min_inliers:
                prev_pose = self.pose
                self.pose = tr.pose
                from ..geometry.se3 import se3_exp, se3_log

                v_meas = se3_compose(tr.pose, se3_inverse(prev_pose))
                self.velocity = se3_exp(
                    self.cfg.velocity_gain * se3_log(v_meas)
                )
                self.status = TrackerStatus.TRACKING
                if self._keyframe_needed(n_inl) and self.mapping_enabled:
                    self._adopt_pending_map()
                    self._drain_compact_stats()  # exact count for capacity
                    if self._kf_count >= self.cfg.map_cfg.max_keyframes - 1:
                        # capacity pressure: force-drop the most redundant
                        # keyframe so insertion always has a free slot
                        self._compact(force_min_one=True)
                        self._drain_compact_stats()
                    if self._kf_count < self.cfg.map_cfg.max_keyframes:
                        self._spawn_keyframe_pipeline(feats, tr, aux)
                        self.last_kf_frame = self.frame_id
                        self.inliers_at_last_kf = max(n_inl, 1)
                self._record(self.pose)
            else:
                self.status = TrackerStatus.LOST
                self.velocity = SE3(
                    jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)
                )
                self._record(None)

        self.frame_id += 1
        return self.status, (
            self.pose if self.status == TrackerStatus.TRACKING else None
        )

    def _make_keyframe_map(self, m, pose, feats, kp_lm_idx, aux) -> MapStore:
        """Pure keyframe insertion: returns the map with the frame written as
        a keyframe and new landmarks created (mono: two-view triangulation)."""
        return insert_keyframe(
            m, pose, self.cam, feats, kp_lm_idx, self.frame_id, self.cfg
        )

    def _spawn_keyframe_pipeline(self, feats, tr, aux):
        """Run the mapping pipeline for the current frame: insert keyframe +
        triangulate + local BA + cull/compact. With async_mapping the chain
        is dispatched now and the result adopted at the next frame boundary
        (no host sync on this frame); otherwise applied immediately."""
        m2 = self._make_keyframe_map(self.map, self.pose, feats, tr.kp_lm_idx, aux)
        if self.cfg.local_ba_window > 0:
            from ..backend.ba import local_ba

            m2, _ = local_ba(
                m2, self.cam,
                window=self.cfg.local_ba_window,
                iters=self.cfg.local_ba_iters,
                covisibility=self.cfg.local_ba_covisibility,
            )
        res = None
        if self.cfg.kf_culling:
            res = cull_and_compact(
                m2,
                keep_latest=self.cfg.kf_cull_keep_latest,
                redundancy=self.cfg.kf_cull_redundancy,
                min_other_obs=self.cfg.kf_cull_min_other_obs,
            )
            m2 = res.map
        self._kf_count += 1
        if self.cfg.async_mapping:
            self._pending_map = (m2, res)
        else:
            self.map = m2
            if res is not None:
                self._pending_compacts.append(res)
            # adopt the BA-refined pose of the newest keyframe (sync mode:
            # the keyframe IS the current frame)
            if self.cfg.local_ba_window > 0:
                k = self.map.n_kf - 1
                self.pose = SE3(self.map.kf_R[k], self.map.kf_t[k])

    def _adopt_pending_map(self):
        """Swap in the finished (or finishing) mapping result. Called at each
        frame boundary — deterministic adoption point."""
        if self._pending_map is None:
            return
        m2, res = self._pending_map
        self._pending_map = None
        self.map = m2
        if res is not None:
            self._pending_compacts.append(res)

    def _compact(self, force_min_one: bool = False):
        """Cull redundant keyframes + compact the live map immediately."""
        res = cull_and_compact(
            self.map,
            keep_latest=self.cfg.kf_cull_keep_latest,
            redundancy=self.cfg.kf_cull_redundancy,
            min_other_obs=self.cfg.kf_cull_min_other_obs,
            force_min_one=force_min_one,
        )
        self.map = res.map
        self._pending_compacts.append(res)

    def _drain_compact_stats(self, only_ready: bool = False):
        """Read back n_culled from finished compactions, adjust the host
        keyframe count, and emit slot-permutation events for side tables.
        With only_ready, in-flight results are left queued (non-blocking)."""
        rest = []
        for res in self._pending_compacts:
            if only_ready and not res.n_kf_culled.is_ready():
                rest.append(res)
                continue
            n = int(res.n_kf_culled)
            if n > 0:
                self._kf_count -= n
                self._compactions.append(
                    (np.asarray(res.kf_order), int(res.map.n_kf))
                )
        self._pending_compacts = rest

    @property
    def mapping_in_flight(self) -> bool:
        """True while the async keyframe pipeline result is not yet adopted
        or its statistics not yet read back — loop-closure bookkeeping waits
        for a quiescent map so slot indices stay consistent."""
        if self._pending_map is not None:
            return True
        return any(not r.n_kf_culled.is_ready() for r in self._pending_compacts)

    def drain_compactions(self) -> list:
        """Return and clear compaction events since the last drain (forces
        readback of any outstanding compaction statistics)."""
        self._drain_compact_stats()
        ev, self._compactions = self._compactions, []
        return ev

    def relocalize_with_candidates(
        self, feats: OrbFeatures, candidate_kfs, min_inliers: int = 20
    ) -> bool:
        """Geometric relocalization against candidate keyframes (the engine's
        relocalizer: BoW candidates → PnP → pose-refine → inlier gate; here
        the caller supplies candidates, e.g. from the BoW database). On
        success adopts the verified pose; the next frame's wide-radius LOST
        matching confirms and flips the state machine back to TRACKING."""
        from .relocalize import relocalize_attempt

        best_inl, best_pose = 0, None
        for k in candidate_kfs:
            res = relocalize_attempt(
                self.map, self.cam, feats.desc, feats.xy, feats.valid,
                jnp.int32(k), min_inliers=min_inliers,
            )
            n = int(res.n_inliers)
            if bool(res.ok) and n > best_inl:
                best_inl, best_pose = n, res.pose
        if best_pose is None:
            return False
        self.pose = best_pose
        self.velocity = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        return True

    def _record(self, pose):
        self.trajectory.append(
            (
                self.frame_id,
                None
                if pose is None
                else SE3(np.asarray(pose.R), np.asarray(pose.t)),
                self.status,
            )
        )

    @property
    def n_landmarks(self) -> int:
        self._adopt_pending_map()
        return int(self.map.n_lm)

    @property
    def n_keyframes(self) -> int:
        """Exact keyframe count — adopts in-flight mapping first (may block
        on the device chain; the loop-closure path uses mapping_in_flight to
        avoid that on hot frames)."""
        self._adopt_pending_map()
        return int(self.map.n_kf)
