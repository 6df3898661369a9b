"""Stereo and RGB-D trackers: depth-initialized landmarks, metric scale.

Parity with the reference's stereo path (OpenVSLAMStereoTracker — rectified
L/R feed with focal_x_baseline, y_matching_margin 2.0, depth_threshold 40 —
/root/reference/src/Trackers/OpenVSLAMStereoTracker.cpp:25-331 and
OpenVSLAMTrackerBase.cpp:200-201) and the RGB-D capability of the engine
(depth-initialized map points, BASELINE config 3).

Both sensors share one mechanism: every keypoint may carry a depth; keyframe
insertion turns unassociated keypoints with valid depth into landmarks
directly (no two-view parallax needed), which removes the monocular
bootstrap entirely and fixes metric scale.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3, se3_inverse
from ..geometry.camera import PinholeCamera, unproject_pinhole
from ..kernels.orb import OrbFeatures, OrbParams, extract_orb
from ..kernels.stereo import match_stereo, depth_from_disparity, refine_disparity_subpixel
from ..mapstore.store import MapStore, empty_map, insert_keyframe_slots
from .tracker import MonoTracker, TrackerConfig, TrackerStatus, insert_keyframe, _extract


@functools.partial(jax.jit, static_argnames=("params",))
def _extract_two_eyes(imgs, params: OrbParams) -> OrbFeatures:
    """Batched L/R extraction: both eyes ride ONE compiled program with a
    leading batch dim of 2 — the TPU-shaped replacement for the reference's
    std::async eye pair (OpenVSLAMStereoTracker.cpp:199-213)."""
    return jax.vmap(lambda im: extract_orb(im, params))(imgs)


@functools.partial(jax.jit, static_argnames=())
def insert_keyframe_depth(
    m: MapStore,
    pose: SE3,
    cam: PinholeCamera,
    feats: OrbFeatures,
    kp_lm_idx,
    depth,
    depth_ok,
    frame_id,
) -> MapStore:
    """Write a keyframe whose unassociated keypoints with valid depth become
    landmarks immediately (stereo/RGB-D mapping step).

    Includes the engine mapping-thread's map-point FUSION responsibility:
    a candidate whose 3D position lands within ~2% of depth of an EXISTING
    valid landmark is a duplicate of it (descriptor matching already failed,
    e.g. under photometric drift) and is not created — without this, every
    keyframe re-creates slightly-offset copies of the same physical points,
    the landmark budget saturates within ~25 keyframes, and BA on the
    duplicated map diverges."""
    # landmark culling (engine mapping-thread parity, same rule as the mono
    # insert path): landmarks that keep failing to match where predicted
    # visible are invalidated so compaction can reclaim their slots —
    # without it a depth-seeded map only ever grows and the store saturates
    # (600-frame stereo room run: 24576/24576 slots, tracking lost)
    poor = (m.lm_n_visible >= 8) & (
        m.lm_n_found.astype(jnp.float32)
        < 0.25 * m.lm_n_visible.astype(jnp.float32)
    )
    m = m._replace(lm_valid=m.lm_valid & ~poor)

    m = insert_keyframe_slots(
        m, pose.R, pose.t, feats.xy, feats.desc, feats.valid, kp_lm_idx, frame_id
    )
    k_new = m.n_kf - 1

    good = feats.valid & depth_ok & (kp_lm_idx < 0)
    rays = unproject_pinhole(cam, feats.xy, depth=depth)  # camera frame
    T_wc = se3_inverse(pose)
    pts = jnp.einsum("ij,nj->ni", T_wc.R, rays) + T_wc.t

    # 3D duplicate suppression against the existing map (squared-distance
    # matrix via one MXU matmul: |a|^2 + |b|^2 - 2ab)
    lm = m.lm_pos
    d2 = (
        jnp.sum(pts * pts, -1)[:, None]
        + jnp.sum(lm * lm, -1)[None, :]
        - 2.0 * pts @ lm.T
    )
    dup_r = 0.02 * jnp.maximum(depth, 0.5)               # (N,)
    dup = jnp.any(
        (d2 < (dup_r ** 2)[:, None]) & m.lm_valid[None, :], axis=1
    )
    good = good & ~dup

    M = m.lm_pos.shape[0]
    rank = jnp.cumsum(good.astype(jnp.int32)) - 1
    slot = jnp.where(good, m.n_lm + rank, M)
    slot = jnp.where(slot < M, slot, M)
    n_new = jnp.sum((slot < M) & good).astype(jnp.int32)
    slot_i32 = slot.astype(jnp.int32)

    kf_lm_new = jnp.where((slot < M) & good, slot_i32, m.kf_lm_idx[k_new])

    return m._replace(
        lm_pos=m.lm_pos.at[slot].set(pts, mode="drop"),
        lm_desc=m.lm_desc.at[slot].set(feats.desc, mode="drop"),
        lm_valid=m.lm_valid.at[slot].set(True, mode="drop"),
        lm_n_obs=m.lm_n_obs.at[slot].set(1, mode="drop"),
        lm_first_kf=m.lm_first_kf.at[slot].set(k_new, mode="drop"),
        kf_lm_idx=m.kf_lm_idx.at[k_new].set(kf_lm_new),
        n_lm=jnp.minimum(m.n_lm + n_new, M),
    )


class StereoTracker(MonoTracker):
    """Rectified-stereo tracker. `process(left, aux=right)`."""

    _needs_two_frames = False

    def __init__(
        self,
        cam: PinholeCamera,
        focal_x_baseline: float,
        cfg: TrackerConfig = TrackerConfig(),
        y_margin: float = 2.0,
        depth_threshold: float = 40.0,
    ):
        super().__init__(cam, cfg)
        self.focal_x_baseline = float(focal_x_baseline)
        self.y_margin = float(y_margin)
        # reference convention: max usable depth = depth_threshold * baseline
        baseline = focal_x_baseline / float(np.asarray(cam.fx))
        self.max_depth = depth_threshold * baseline

    def _depths(self, feats: OrbFeatures, right_image):
        right = jnp.asarray(right_image, jnp.float32)
        if self._feats_lr is not None:
            rfeats = jax.tree.map(lambda a: a[1], self._feats_lr)
        else:
            rfeats = _extract(right, self.cfg.orb)
        disp, idx_r, ok = match_stereo(
            feats.desc, feats.xy, feats.valid,
            rfeats.desc, rfeats.xy, rfeats.valid,
            y_margin=self.y_margin,
        )
        # integer-keypoint disparity carries +-1px error — refine to sub-pixel
        # (the reference engine's stereo matcher does SAD parabola fitting too)
        disp = refine_disparity_subpixel(
            self._last_left, right, feats.xy, rfeats.xy[idx_r], ok
        )
        z = depth_from_disparity(disp, self.focal_x_baseline)
        ok = ok & (disp > 0.5) & (z > 0.0) & (z < self.max_depth)
        return z, ok

    _feats_lr = None  # (2, ...) batched L/R features of the current frame

    def process(self, image, aux=None, nav_prior=None):
        self._last_left = jnp.asarray(image, jnp.float32)
        if aux is not None:
            both = jnp.stack([self._last_left, jnp.asarray(aux, jnp.float32)])
            self._feats_lr = _extract_two_eyes(both, self.cfg.orb)
        else:
            self._feats_lr = None
        return super().process(image, aux=aux, nav_prior=nav_prior)

    def _extract(self, image) -> OrbFeatures:
        if self._feats_lr is not None:
            feats = jax.tree.map(lambda a: a[0], self._feats_lr)
            if self.mask is not None:
                from .tracker import _apply_mask

                feats = _apply_mask(feats, self.mask)
            return feats
        return super()._extract(image)

    def _try_initialize(self, feats: OrbFeatures, aux=None) -> bool:
        z, ok = self._depths(feats, aux)
        if int(jnp.sum(ok)) < self.cfg.init_min_matches:
            return False
        m = empty_map(self.cfg.map_cfg)
        pose = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        n_kp = feats.xy.shape[0]
        m = insert_keyframe_depth(
            m, pose, self.cam, feats,
            jnp.full((n_kp,), -1, jnp.int32), z, ok, self.frame_id,
        )
        self.map = m
        self.pose = pose
        self.velocity = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        self.last_kf_frame = self.frame_id
        self.inliers_at_last_kf = max(int(jnp.sum(ok)), 1)
        self._kf_count = 1
        return True

    def _make_keyframe_map(self, m, pose, feats, kp_lm_idx, aux):
        z, ok = self._depths(feats, aux)
        m2 = insert_keyframe_depth(
            m, pose, self.cam, feats, kp_lm_idx, z, ok, self.frame_id
        )
        # far points (beyond the depth threshold / without stereo match) get a
        # second chance via two-view triangulation against the previous
        # keyframe — the engine keeps 'far' stereo landmarks the same way.
        # (_kf_count >= 1 always holds here, so the previous-keyframe ref in
        # triangulate_new_landmarks is valid.)
        if self._kf_count >= 1:
            from .tracker import _jit_triangulate

            m2 = _jit_triangulate(m2, self.cam, self.cfg)
        return m2


class RGBDTracker(StereoTracker):
    """RGB-D tracker. `process(gray, aux=depth_map)` with metric depth."""

    def __init__(
        self,
        cam: PinholeCamera,
        cfg: TrackerConfig = TrackerConfig(),
        min_depth: float = 0.1,
        max_depth: float = 12.0,
    ):
        MonoTracker.__init__(self, cam, cfg)
        self.min_depth = float(min_depth)
        self.max_depth = float(max_depth)

    def process(self, image, aux=None, nav_prior=None):
        # aux is a depth map, not a second eye — mono-style extraction
        self._feats_lr = None
        return MonoTracker.process(self, image, aux=aux, nav_prior=nav_prior)

    def _depths(self, feats: OrbFeatures, depth_map):
        """Sub-pixel bilinear depth at each keypoint.

        Keypoints are sub-pixel; truncating to the nearest depth pixel puts
        cm-level errors on oblique surfaces into landmarks that BA then
        TRUSTS as fixed anchors (BAProblem.point_fixed) — on the room
        benchmark that alone costs ~0.5 m ATE. Bilinear sampling fixes the
        bias; the 4-neighbor relative-spread gate rejects samples straddling
        a depth discontinuity (where interpolation would invent phantom
        depths between surfaces), matching the sensor-edge handling the
        reference engine gets from its stereo matcher's consistency checks."""
        d = jnp.asarray(depth_map, jnp.float32)
        h, w = d.shape
        x = jnp.clip(feats.xy[:, 0], 0.0, w - 1.001)
        y = jnp.clip(feats.xy[:, 1], 0.0, h - 1.001)
        x0 = x.astype(jnp.int32)
        y0 = y.astype(jnp.int32)
        fx = x - x0
        fy = y - y0
        flat = d.reshape(-1)
        i00 = y0 * w + x0
        v00 = flat[i00]
        v01 = flat[i00 + 1]
        v10 = flat[i00 + w]
        v11 = flat[i00 + w + 1]
        z = (
            v00 * (1 - fx) * (1 - fy)
            + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy
            + v11 * fx * fy
        )
        vmin = jnp.minimum(jnp.minimum(v00, v01), jnp.minimum(v10, v11))
        vmax = jnp.maximum(jnp.maximum(v00, v01), jnp.maximum(v10, v11))
        flat_patch = (vmax - vmin) < 0.05 * jnp.maximum(z, 1e-6)
        ok = (
            feats.valid
            & flat_patch
            & (vmin > self.min_depth)
            & (z < self.max_depth)
        )
        return z, ok
