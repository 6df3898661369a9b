"""Device-resident chunked tracking loop: N frames per dispatch, zero
per-frame host syncs.

Why this exists: the reference runs tracking as a host thread that owns the
frame loop (/root/reference/src/Manager/SlamManager.cpp:54-239). A literal
translation — Python loop, one device round trip per frame — is bounded by
host<->device LATENCY, not by compute: on a remote-attached TPU every
transfer costs ~20-60 ms, so a per-frame-synced tracker cannot exceed
~15-40 fps no matter how fast the kernels are.

The TPU-native shape of the frame loop is a `lax.scan` over a CHUNK of
frames staged in device memory:

    upload B frames (one transfer)  ->  scan(step, carry, frames)  ->
    per-frame outputs stay on device; host fetches them lazily

One compiled program advances tracking B frames: per frame it runs the full
ORB extract -> project/match -> pose optimization, updates the
constant-velocity model, evaluates the keyframe policy, and — under
`lax.cond`, so non-keyframe frames pay nothing — inserts the keyframe and
triangulates new landmarks into the fixed-capacity MapStore carried through
the scan. Heavier mapping (windowed local BA, keyframe culling/compaction)
runs at CHUNK boundaries, dispatch-only, mirroring the async mapping-thread
split of the engine (OpenVSLAMTrackerBase.cpp:238-255): tracking inside the
next chunk continues on the last published map.

The state machine's rare transitions (initialization, relocalization) stay
host-side where flexibility matters; the steady TRACKING/LOST path — 99% of
frames — lives here.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3, se3_compose, se3_inverse, se3_exp, se3_log
from ..geometry.camera import PinholeCamera
from ..kernels.orb import extract_orb
from ..mapstore.store import MapStore
from .tracker import (
    MonoTracker,
    TrackerConfig,
    TrackerStatus,
    track_frame,
    insert_keyframe,
    _apply_mask,
)


class ChunkCarry(NamedTuple):
    m: MapStore
    pose_R: jnp.ndarray            # (3,3) Tcw
    pose_t: jnp.ndarray            # (3,)
    vel_R: jnp.ndarray
    vel_t: jnp.ndarray
    status: jnp.ndarray            # () int32: TRACKING / LOST
    frame_id: jnp.ndarray          # () int32
    last_kf_frame: jnp.ndarray     # () int32
    last_ba_frame: jnp.ndarray     # () int32 — scan BA rate-cap cursor
    inliers_at_last_kf: jnp.ndarray  # () int32


class FrameOut(NamedTuple):
    status: jnp.ndarray        # (B,) int32
    n_inliers: jnp.ndarray     # (B,) int32
    pose_R: jnp.ndarray        # (B, 3, 3)
    pose_t: jnp.ndarray        # (B, 3)
    kf_inserted: jnp.ndarray   # (B,) bool
    sigma_pos: jnp.ndarray     # (B, 3) camera-center std-dev (world frame)
    sigma_rot: jnp.ndarray     # (B,) rotation std-dev [rad]


def _where_se3(c, a: SE3, b: SE3) -> SE3:
    return SE3(jnp.where(c, a.R, b.R), jnp.where(c, a.t, b.t))


_EMPTY_OUT = (
    np.zeros(0, np.int32),
    np.zeros(0, np.int32),
    np.zeros((0, 3, 3), np.float32),
    np.zeros((0, 3), np.float32),
    np.zeros(0, bool),
    np.zeros((0, 3), np.float32),
    np.zeros(0, np.float32),
)


def _out_to_numpy(cat: FrameOut):
    return (
        np.asarray(cat.status),
        np.asarray(cat.n_inliers),
        np.asarray(cat.pose_R),
        np.asarray(cat.pose_t),
        np.asarray(cat.kf_inserted),
        np.asarray(cat.sigma_pos),
        np.asarray(cat.sigma_rot),
    )


def make_chunk_step(cam: PinholeCamera, cfg: TrackerConfig, mask=None,
                    mapping_enabled: bool = True, rectify_map=None,
                    mode: str = "mono", focal_x_baseline: float = 0.0,
                    y_margin: float = 2.0, max_depth: float = 12.0,
                    min_depth: float = 0.1, ba_in_scan: bool = True):
    """Build the jitted (carry, frames) -> (carry, FrameOut) program.

    frames per mode:
      mono   — (B, H, W)
      stereo — (B, 2, H, W) rectified eye pairs; keyframes seed landmarks
               from row-matched + subpixel-refined disparity, far points get
               the mono two-view triangulation pass (StereoTracker parity)
      rgbd   — ((B, H, W) gray, (B, H, W) depth); keyframes seed landmarks
               from bilinear subpixel depth (RGBDTracker parity)

    rectify_map: optional (H, W, 2) device remap coordinates (stereo: (2, H,
    W, 2), one per eye) — undistortion then runs on-device over the WHOLE
    chunk as one batched remap before the scan (the gather amortizes over
    the batch dim: 0.5 ms/frame batched vs 11 ms/frame single on a v5e), so
    the host uploads raw uint8 pixels (4x less transfer than rectified
    float32) and the in-path undistort rides the same dispatch
    (ImageProcessing.h:130-256 role).
    """

    K = cfg.map_cfg.max_keyframes
    M = cfg.map_cfg.max_landmarks
    N = cfg.map_cfg.num_keypoints
    rmap = None if rectify_map is None else jnp.asarray(rectify_map, jnp.float32)

    def _depth_for_keyframe(x, feats):
        """Per-keyframe depth per left keypoint: (z, ok)."""
        from ..kernels.stereo import (
            match_stereo, depth_from_disparity, refine_disparity_subpixel,
        )

        if mode == "stereo":
            left, right = x[0], x[1]
            rfeats = extract_orb(right, cfg.orb)
            disp, idx_r, ok = match_stereo(
                feats.desc, feats.xy, feats.valid,
                rfeats.desc, rfeats.xy, rfeats.valid, y_margin=y_margin,
            )
            disp = refine_disparity_subpixel(
                left, right, feats.xy, rfeats.xy[idx_r], ok
            )
            z = depth_from_disparity(disp, focal_x_baseline)
            ok = ok & (disp > 0.5) & (z > 0.0) & (z < max_depth)
            return z, ok
        # rgbd: bilinear subpixel depth with discontinuity gate
        # (StereoTracker parity — see frontend/stereo.py::RGBDTracker._depths)
        d = x[1]
        h, w = d.shape
        xq = jnp.clip(feats.xy[:, 0], 0.0, w - 1.001)
        yq = jnp.clip(feats.xy[:, 1], 0.0, h - 1.001)
        x0 = xq.astype(jnp.int32)
        y0 = yq.astype(jnp.int32)
        fx, fy = xq - x0, yq - y0
        flat = d.reshape(-1)
        i00 = y0 * w + x0
        v00, v01 = flat[i00], flat[i00 + 1]
        v10, v11 = flat[i00 + w], flat[i00 + w + 1]
        z = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
             + v10 * (1 - fx) * fy + v11 * fx * fy)
        vmin = jnp.minimum(jnp.minimum(v00, v01), jnp.minimum(v10, v11))
        vmax = jnp.maximum(jnp.maximum(v00, v01), jnp.maximum(v10, v11))
        ok = (
            feats.valid
            & ((vmax - vmin) < 0.05 * jnp.maximum(z, 1e-6))
            & (vmin > min_depth)
            & (z < max_depth)
        )
        return z, ok

    def step(carry: ChunkCarry, x):
        # x = (feats, raw): ORB extraction is hoisted OUT of the sequential
        # scan and vmapped over the whole chunk (scan_chunk below) — feature
        # extraction has no dependence on tracking state, so running it
        # per-frame inside the scan serialized ~half the chunk's compute at
        # batch-1 shapes. raw carries the frames only for the modes whose
        # keyframe branch needs pixels again (stereo right eye, rgbd depth).
        feats, raw = x

        pose = SE3(carry.pose_R, carry.pose_t)
        vel = SE3(carry.vel_R, carry.vel_t)
        lost = carry.status == TrackerStatus.LOST
        pred = _where_se3(lost, pose, se3_compose(vel, pose))
        radius = jnp.where(lost, cfg.match_radius_lost, cfg.match_radius)

        cap = cfg.track_local_cap
        tr = track_frame(
            carry.m, pred, cam, feats, radius, cfg.match_max_hamming,
            local_cap=cap if cap and cap < M else None,
        )
        ok = tr.n_inliers >= cfg.min_inliers

        new_pose = _where_se3(ok, tr.pose, pose)
        v_meas = se3_compose(tr.pose, se3_inverse(pose))
        v_new = se3_exp(cfg.velocity_gain * se3_log(v_meas))
        ident = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        new_vel = _where_se3(ok, v_new, ident)
        status = jnp.where(ok, TrackerStatus.TRACKING, TrackerStatus.LOST)

        # keyframe policy (MonoTracker._keyframe_needed) + capacity guards
        since = carry.frame_id - carry.last_kf_frame
        want = (since >= cfg.kf_min_interval) & (
            (since >= cfg.kf_max_interval)
            | (
                tr.n_inliers
                < cfg.kf_inlier_ratio * carry.inliers_at_last_kf.astype(jnp.float32)
            )
        )
        kf = (
            ok
            & want
            & jnp.asarray(mapping_enabled)
            & (tr.map.n_kf < K)
            & (tr.map.n_lm < M - N)
        )

        if mode == "mono":
            def _insert(m):
                return insert_keyframe(
                    m, new_pose, cam, feats, tr.kp_lm_idx, carry.frame_id, cfg
                )
        else:
            def _insert(m):
                from .stereo import insert_keyframe_depth
                from .tracker import triangulate_new_landmarks

                z, dok = _depth_for_keyframe(raw, feats)
                m2_ = insert_keyframe_depth(
                    m, new_pose, cam, feats, tr.kp_lm_idx, z, dok,
                    carry.frame_id,
                )
                # far points beyond the depth gate: two-view triangulation
                # against the previous keyframe (StereoTracker parity)
                return triangulate_new_landmarks(m2_, cam, cfg)

        m2 = jax.lax.cond(kf, _insert, lambda m: m, tr.map)

        # windowed local BA rides the keyframe cond INSIDE the scan, rate-
        # capped by scan_ba_min_interval: when keyframes arrive faster, the
        # intermediate ones skip their BA and the next due keyframe's window
        # covers them (the mapping thread's abort_local_BA behavior under
        # keyframe backlog). Non-keyframe frames pay nothing under lax.cond.
        ba_due = kf
        if mapping_enabled and ba_in_scan and cfg.local_ba_window > 0:
            from ..backend.ba import local_ba

            scan_interval = (
                cfg.scan_ba_min_interval
                if mode == "mono"
                else cfg.scan_ba_min_interval_depth
            )
            if scan_interval > 0:
                ba_due = kf & (
                    carry.frame_id - carry.last_ba_frame >= scan_interval
                )
            m2 = jax.lax.cond(
                ba_due,
                lambda mm: local_ba(
                    mm, cam, window=cfg.local_ba_window,
                    iters=cfg.local_ba_iters,
                    covisibility=cfg.local_ba_covisibility,
                )[0],
                lambda mm: mm,
                m2,
            )

        out = FrameOut(
            status=status.astype(jnp.int32),
            n_inliers=tr.n_inliers.astype(jnp.int32),
            pose_R=new_pose.R,
            pose_t=new_pose.t,
            kf_inserted=kf,
            sigma_pos=tr.sigma_pos,
            sigma_rot=tr.sigma_rot,
        )
        new_carry = ChunkCarry(
            m=m2,
            pose_R=new_pose.R,
            pose_t=new_pose.t,
            vel_R=new_vel.R,
            vel_t=new_vel.t,
            status=status.astype(jnp.int32),
            frame_id=carry.frame_id + 1,
            last_kf_frame=jnp.where(kf, carry.frame_id, carry.last_kf_frame),
            last_ba_frame=jnp.where(
                ba_due, carry.frame_id, carry.last_ba_frame
            ).astype(jnp.int32),
            inliers_at_last_kf=jnp.where(
                kf, jnp.maximum(tr.n_inliers, 1), carry.inliers_at_last_kf
            ).astype(jnp.int32),
        )
        return new_carry, out

    def _extract(img):
        feats = extract_orb(img, cfg.orb)
        if mask is not None:
            feats = _apply_mask(feats, mask)
        return feats

    @jax.jit
    def scan_chunk(carry: ChunkCarry, frames):
        from ..kernels.remap import remap_bilinear

        if mode == "mono":
            xs = frames.astype(jnp.float32)
            if rmap is not None:
                xs = remap_bilinear(xs, rmap)
            left = xs
        elif mode == "stereo":
            f = frames.astype(jnp.float32)      # (B, 2, H, W)
            left, right = f[:, 0], f[:, 1]
            if rmap is not None:
                left = remap_bilinear(left, rmap[0])
                right = remap_bilinear(right, rmap[1])
            xs = jnp.stack([left, right], axis=1)
        else:  # rgbd: (gray, depth) tuple
            gray = frames[0].astype(jnp.float32)
            depth = frames[1].astype(jnp.float32)
            if rmap is not None:
                gray = remap_bilinear(gray, rmap)
                depth = remap_bilinear(depth, rmap)
            xs = jnp.stack([gray, depth], axis=1)  # (B, 2, H, W)
            left = gray
        # batched extraction ahead of the sequential scan: per-frame ORB has
        # no dependence on tracking state, so it runs as ONE vmapped program
        # over the chunk (full-batch convs/matmuls on the MXU) instead of
        # B batch-1 instances serialized inside the scan
        feats_all = jax.vmap(_extract)(left)
        return jax.lax.scan(step, carry, (feats_all, xs))

    return scan_chunk


@functools.partial(jax.jit, static_argnames=(
    "window", "iters", "covisibility", "max_cull", "keep_latest",
    "redundancy", "min_other_obs",
))
def _chunk_boundary(m: MapStore, cam: PinholeCamera, any_kf, do_compact,
                    window: int, iters: int, covisibility: bool,
                    max_cull: int, keep_latest: int, redundancy: float,
                    min_other_obs: int):
    """Chunk-boundary mapping maintenance, one dispatch: windowed local BA
    then multi-pass keyframe cull + compaction (the engine's continuous
    mapping-thread duties, OpenVSLAMTrackerBase.cpp:238-255, executed at
    chunk boundaries). Both run under lax.cond so chunks that inserted no
    keyframe pay nothing; `do_compact` (device bool) additionally gates the
    cull so the host can hold the store quiescent (e.g. while an async loop
    closure snapshot is in flight). Returns a CompactResult — identity
    permutations when nothing ran."""
    from ..backend.ba import local_ba
    from ..mapstore.store import cull_and_compact, CompactResult

    K = m.kf_valid.shape[0]
    M = m.lm_valid.shape[0]

    def ident(mm: MapStore) -> CompactResult:
        return CompactResult(
            mm,
            jnp.arange(K, dtype=jnp.int32),
            jnp.arange(M, dtype=jnp.int32),
            jnp.int32(0),
        )

    def run(mm: MapStore) -> CompactResult:
        if window > 0:
            mm = local_ba(
                mm, cam, window=window, iters=iters, covisibility=covisibility
            )[0]
        if max_cull > 0:
            return jax.lax.cond(
                do_compact,
                lambda x: cull_and_compact(
                    x, keep_latest=keep_latest, redundancy=redundancy,
                    min_other_obs=min_other_obs, max_cull=max_cull,
                    # guarantee headroom for the next chunk's insertions —
                    # a full store accrues no new observations, so without
                    # forcing, redundancy freezes below threshold and
                    # insertion starves at the capacity wall
                    force_free=max_cull,
                ),
                ident,
                mm,
            )
        return ident(mm)

    return jax.lax.cond(any_kf, run, ident, m)


class ChunkedTracker:
    """Drives a MonoTracker-compatible engine through the device chunk loop.

    Usage:
        eng = MonoTracker(cam, cfg)            # host path handles init
        chunked = ChunkedTracker(eng)
        for batch in frame_batches:            # (B, H, W) uint8/float arrays
            chunked.process_chunk(batch)
        statuses, poses = chunked.collect()    # one deferred fetch

    Between chunks, if any keyframe was inserted, one windowed local BA is
    DISPATCHED on the updated map (not fetched) — the next chunk tracks
    against the optimized map, the reference's tracking∥mapping overlap.
    """

    def __init__(self, engine: MonoTracker, local_ba_every_chunk: bool = True,
                 rectify_map=None, boundary_compact: bool = True):
        from .stereo import StereoTracker, RGBDTracker

        self.engine = engine
        self.local_ba_every_chunk = local_ba_every_chunk
        # chunk-boundary keyframe culling + compaction (dispatch-only): keeps
        # 2000+ frame runs inside the fixed capacities without host syncs.
        # `compact_enabled` can be cleared temporarily (e.g. while an async
        # loop-closure snapshot must stay slot-stable) — it feeds the device
        # `do_compact` flag, not a recompile.
        self.boundary_compact = boundary_compact and engine.cfg.kf_culling
        self.compact_enabled = True
        # redundancy-quality culls run every Nth boundary; capacity-safety
        # culls fire whenever the device-side n_kf nears the wall
        self.compact_period = 8
        self._boundary_count = 0
        if isinstance(engine, RGBDTracker):
            mode, extra = "rgbd", dict(
                max_depth=engine.max_depth, min_depth=engine.min_depth
            )
        elif isinstance(engine, StereoTracker):
            mode, extra = "stereo", dict(
                focal_x_baseline=engine.focal_x_baseline,
                y_margin=engine.y_margin, max_depth=engine.max_depth,
            )
        else:
            mode, extra = "mono", {}
        self.mode = mode
        self._scan = make_chunk_step(
            engine.cam, engine.cfg, mask=engine.mask,
            mapping_enabled=engine.mapping_enabled, rectify_map=rectify_map,
            mode=mode, ba_in_scan=local_ba_every_chunk, **extra,
        )
        self._outs: list = []  # FrameOut per chunk (device-resident)
        self._chunk_kf_flags: list = []
        self._prefetched = None  # (id, device frames) from prefetch()
        self._pending_carry = None  # end-of-chunk carry; None before 1st chunk

    @property
    def ready(self) -> bool:
        return self.engine.status in (TrackerStatus.TRACKING, TrackerStatus.LOST)

    def _carry(self) -> ChunkCarry:
        e = self.engine
        if self._pending_carry is not None:
            # continue from the previous chunk's end state (device scalars:
            # status / keyframe-policy counters stay on device across
            # chunks — no host sync needed between chunks); only the map is
            # refreshed, since the boundary step (local BA / compaction)
            # updated it after the scan produced this carry.
            return self._pending_carry._replace(m=e.map)
        return ChunkCarry(
            m=e.map,
            pose_R=jnp.asarray(e.pose.R, jnp.float32),
            pose_t=jnp.asarray(e.pose.t, jnp.float32),
            vel_R=jnp.asarray(e.velocity.R, jnp.float32),
            vel_t=jnp.asarray(e.velocity.t, jnp.float32),
            status=jnp.int32(int(e.status)),
            frame_id=jnp.int32(e.frame_id),
            last_kf_frame=jnp.int32(e.last_kf_frame),
            # the host path BAs every keyframe, so the map is freshly
            # optimized as of the last keyframe
            last_ba_frame=jnp.int32(e.last_kf_frame),
            inliers_at_last_kf=jnp.int32(e.inliers_at_last_kf),
        )

    def prefetch(self, frames):
        """Stage a chunk on device ahead of time (e.g. from an IO thread,
        overlapping the upload with the previous chunk's compute). Returns a
        handle accepted by process_chunk. rgbd passes (gray, depth)."""
        if isinstance(frames, tuple):
            return tuple(jnp.asarray(f) for f in frames)
        return jnp.asarray(frames)

    def process_chunk(self, frames) -> None:
        """Advance tracking over one chunk in one device dispatch.

        frames: host uint8/float array (uploaded here) or a prefetch()
        handle already staged on device. Shapes: (B, H, W) mono,
        (B, 2, H, W) stereo eye pairs, ((B, H, W) gray, (B, H, W) depth)
        for rgbd.
        """
        assert self.ready, "initialize via the host path first"
        e = self.engine
        start_frame = e.frame_id
        carry = self._carry()
        frames = self.prefetch(frames)
        n_frames = (frames[0] if isinstance(frames, tuple) else frames).shape[0]
        carry, out = self._scan(carry, frames)

        # adopt final carry (all dispatch-only: no values fetched)
        e.map = carry.m
        e.pose = SE3(carry.pose_R, carry.pose_t)
        e.velocity = SE3(carry.vel_R, carry.vel_t)
        e.frame_id = int(n_frames) + start_frame
        self._outs.append(out)
        self._chunk_kf_flags.append(out.kf_inserted)
        # start the device->host copies now (non-blocking): by the time a
        # caller drains this chunk's outputs — typically one chunk later —
        # the bytes are already on the host and np.asarray doesn't stall
        for leaf in out:
            try:
                leaf.copy_to_host_async()
            except AttributeError:
                pass  # non-jax leaf (CPU test doubles)

        # chunk-boundary mapping: multi-pass keyframe cull/compaction if the
        # chunk inserted any keyframe (local BA already ran per keyframe
        # INSIDE the scan). `lax.cond` keeps the non-keyframe case free;
        # still dispatch-only — the CompactResult's permutations/counters
        # are queued on the engine and read back lazily (drain_compactions),
        # same as the host path.
        if self.boundary_compact:
            max_cull = int(n_frames) // max(e.cfg.kf_min_interval, 1) + 1
            # gate the cull/compaction dispatch on a DEVICE predicate:
            # capacity safety fires when the store is within one chunk's
            # worth of insertions of the wall (n_kf is a device scalar — no
            # host sync), and a periodic host-side counter keeps the
            # redundancy-quality cull running at a low duty cycle. Chunks
            # far from capacity then pay only the cond's identity branch
            # (~free) instead of ~19 ms of cull passes per chunk.
            self._boundary_count += 1
            periodic = (self._boundary_count % self.compact_period) == 0
            kf_cap = e.map.kf_valid.shape[0]
            near_cap = e.map.n_kf >= kf_cap - (2 * max_cull + 2)
            do_compact = jnp.asarray(self.compact_enabled) & (
                near_cap | jnp.asarray(periodic)
            )
            res = _chunk_boundary(
                e.map, e.cam, jnp.any(out.kf_inserted),
                do_compact,
                0, 0, False,
                max_cull, e.cfg.kf_cull_keep_latest,
                e.cfg.kf_cull_redundancy, e.cfg.kf_cull_min_other_obs,
            )
            e.map = res.map
            e._pending_compacts.append(res)

        # host bookkeeping reads scalars ONCE per chunk at the next boundary
        # via collect(); status/last_kf tracking for the engine object:
        self._pending_carry = carry

    def invalidate_carry(self) -> None:
        """Call after mutating the engine's host state (pose, status,
        keyframe counters) outside the chunk loop — e.g. relocalization or
        a loop-closure pose resync. Folds the pending device scalars back
        into the engine first, then forces the next chunk's carry to be
        rebuilt from the (now authoritative) host state."""
        self.sync()
        self._pending_carry = None

    def discard_carry(self) -> None:
        """Drop the pending device carry WITHOUT folding it into the engine
        — for the host→chunk transition after the host path already ran
        frames (its state is newer than the last chunk's carry)."""
        self._pending_carry = None

    def sync(self) -> None:
        """Fetch the minimal end-of-chunk scalars into the engine's host
        state (status, keyframe counters) — one small transfer. No-op
        before the first process_chunk."""
        c = self._pending_carry
        if c is None:
            return
        packed = np.asarray(
            jnp.stack([
                c.status.astype(jnp.int32),
                c.last_kf_frame,
                c.inliers_at_last_kf,
                c.m.n_kf,
                c.m.n_lm,
            ])
        )
        e = self.engine
        e.status = TrackerStatus(int(packed[0]))
        e.last_kf_frame = int(packed[1])
        e.inliers_at_last_kf = int(packed[2])
        e._kf_count = int(packed[3])

    def drain(self, keep_last: int = 0):
        """Fetch and CLEAR per-frame outputs accumulated since the last
        drain, keeping the newest `keep_last` chunks pending. Returns
        (statuses, n_inliers, poses_R, poses_t, kf_inserted, sigma_pos,
        sigma_rot) as numpy.

        The pipeline path calls drain(keep_last=1) at each chunk boundary:
        it then only materializes chunks whose device->host copies were
        started a boundary ago (copy_to_host_async in process_chunk), so
        the steady loop never blocks on the chunk still computing — results
        are delivered one chunk late, the TPU-native analog of the
        reference's asynchronous result queue."""
        take = len(self._outs) - keep_last
        if take <= 0:
            return _EMPTY_OUT
        outs, self._outs = self._outs[:take], self._outs[take:]
        self._chunk_kf_flags = self._chunk_kf_flags[take:]
        cat = jax.tree.map(lambda *xs: jnp.concatenate(xs), *outs) \
            if len(outs) > 1 else outs[0]
        return _out_to_numpy(cat)

    def collect(self):
        """Fetch all per-frame outputs accumulated so far (bulk transfer).

        Returns (statuses (T,), n_inliers (T,), poses_R (T,3,3), poses_t (T,3),
        kf_inserted (T,), sigma_pos (T,3), sigma_rot (T,)) as numpy arrays.
        """
        if not self._outs:
            return _EMPTY_OUT
        cat = jax.tree.map(lambda *xs: jnp.concatenate(xs), *self._outs)
        return _out_to_numpy(cat)
