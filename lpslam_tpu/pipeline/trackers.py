"""Tracker pipeline stage — wraps the SLAM engine behind the reference's
TrackerBase contract (/root/reference/src/Trackers/TrackerBase.h:57-150):
processImage(entry, nav_odom, nav_map, sensor_values) -> results, laser-scan
ingestion, occupancy-map export, status reporting.

The engine underneath is the lpslam_tpu frontend (Mono/Stereo/RGBD trackers +
loop closing) instead of an external OpenVSLAM process — the fork extensions
the reference drives (navigation-state priors, laser2d ingest with staleness
window, occupancy grid export, landmark export, tracker state surface —
OpenVSLAMTrackerBase.cpp / OpenVSLAMStereoTracker.cpp call sites) are provided
natively here.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .config import ConfigOptions
from .queues import CameraQueueEntry
from ..geometry.camera import PinholeCamera
from ..geometry.frames import optical_to_lpslam
from ..frontend.tracker import MonoTracker, TrackerConfig, TrackerStatus
from ..frontend.stereo import StereoTracker, RGBDTracker
from ..kernels.orb import OrbParams
from ..mapstore.store import MapConfig


@dataclass
class TrackerResult:
    timestamp: float
    position: np.ndarray        # lpslam frame
    orientation_wxyz: np.ndarray
    valid: bool
    # pose uncertainty (Space.h:33-163 value+sigma parity): position sigmas
    # in the lpslam frame, scalar orientation sigma [rad]; derived from the
    # pose optimizer's inlier covariance (frontend/pose_opt.py)
    position_sigma: np.ndarray = None
    orientation_sigma: float = 0.0

    def __post_init__(self):
        if self.position_sigma is None:
            self.position_sigma = np.zeros(3)


@dataclass
class LaserScan:
    timestamp: float
    ranges: np.ndarray          # (N,)
    angle_min: float
    angle_increment: float
    range_max: float
    # laser -> camera extrinsics (from the host app's nav-transformation
    # callback, OpenVSLAMStereoTracker.cpp:235-287 parity); None = identity
    extrinsic_R: np.ndarray = None
    extrinsic_t: np.ndarray = None


def _sigma_to_lpslam(sigma_xyz) -> np.ndarray:
    """Axis-permute world-frame position sigmas into the lpslam frame: the
    position map is (x,y,z) -> (-y,x,z), so std-devs permute to (sy,sx,sz)."""
    s = np.asarray(sigma_xyz, np.float64)
    return np.array([s[1], s[0], s[2]])


def create_tracker_result_pose(R: np.ndarray, t: np.ndarray):
    """Tcw (optical frame) -> (position, orientation_wxyz) in the lpslam
    frame, matching the reference's createTrackerResult exactly
    (/root/reference/src/Trackers/OpenVSLAMTrackerBase.cpp:307-329):
    position = optical->lpslam swap of the camera center −RᵀT t;
    orientation = quaternion of rot_cw with components (w, −y, x, z)."""
    from ..geometry.so3 import rot_to_quat

    center_opt = -R.T @ t
    center_lp = np.asarray(optical_to_lpslam(center_opt))
    q_cw = np.asarray(rot_to_quat(R))
    q = np.array([q_cw[0], -q_cw[2], q_cw[1], q_cw[3]])
    return center_lp, q


class TrackerBase:
    schema = ConfigOptions()

    def __init__(self, config: Optional[dict] = None):
        self.cfg = self.schema.parse(config)

    def start(self, sensor_queue=None):
        pass

    def stop(self):
        pass

    def process_image(self, entry: CameraQueueEntry, nav_odom=None, nav_map=None,
                      sensor_values=()) -> list:
        """Returns a list of TrackerResults for this frame — or None when the
        frame's result is DEFERRED (chunked trackers emit buffered frames'
        results at chunk boundaries; the manager must not emit an invalid
        reconstruction for a deferred frame)."""
        raise NotImplementedError

    def flush(self) -> list:
        """Emit any deferred results (end of stream / pipeline stop)."""
        return []

    def add_laser_scan(self, scan: LaserScan):
        pass

    def get_occupancy_map(self):
        return None

    def status(self) -> dict:
        return {}


class VSLAMTracker(TrackerBase):
    """The visual-SLAM tracker stage (mono / stereo / rgbd modes)."""

    schema = (
        ConfigOptions()
        .optional("mode", str, "mono")
        .optional("keypoints", int, 512)          # reference slamKeypoints
        .optional("levels", int, 3)
        .optional("scale_factor", float, 1.2)
        .optional("fast_threshold", float, 20.0)
        .optional("fast_min_threshold", float, 7.0)
        # descriptor path (kernels/orb.py OrbParams.brief_mode): "polar"
        # (default), "binned", "gather", "exact" — the engine-level feature
        # switch analog of the reference's use_opencl/use_cuda flags
        # (OpenVSLAMTrackerBase.cpp:208-209); exposed so descriptor ablations
        # run the REAL product path end-to-end
        .optional("brief_mode", str, "polar")
        .optional("max_keyframes", int, 128)
        .optional("max_landmarks", int, 16384)
        .optional("focal_x_baseline", float, 0.0)
        .optional("depth_threshold", float, 40.0)
        .optional("y_matching_margin", float, 2.0)
        .optional("max_depth", float, 12.0)       # rgbd
        .optional("wait_for_navigation_data", bool, False)
        .optional("relocalize_with_nav_data", bool, False)
        .optional("time_to_relocalize", float, 3.0)
        .optional("loop_closure", bool, False)
        # > 0: run full-map bundle adjustment after an accepted loop's
        # pose-graph correction (BASELINE config 4: loop + global BA)
        .optional("loop_global_ba_iters", int, 0)
        # run loop detection + geometric verification on a background
        # worker (the engine's loop-closing thread equivalent,
        # OpenVSLAMTrackerBase.cpp:238-255); an accepted verdict is applied
        # later as ONE compiled dispatch (pose graph + re-anchor [+ global
        # BA]) so the frame path never blocks on closure work. False =
        # verify+apply inline on the keyframe's own frame.
        .optional("loop_async", bool, True)
        .optional("mapping", bool, True)
        .optional("map_file", str, "")
        .optional("vocab_file", str, "")  # pre-trained vocabulary (orb_vocab parity)
        .optional("occupancy_cell_size", float, 0.1)
        .optional("max_laser_age", float, 0.5)
        # keypoint masks (OpenVSLAMTrackerBase::configureMasks parity):
        # radial keeps a centered disc of the given pixel radius; image loads
        # a grayscale mask file (nonzero = keep)
        .optional("mask_radius", float, 0.0)
        .optional("mask_image", str, "")
        # push the landmark map onto the sensor queue every N seconds
        # (reference emitMap, OpenVSLAMTracker.cpp:146-153; 0 = off)
        .optional("emit_map_seconds", float, 0.0)
        # last-resort relocalization: when PnP verification FAILS, jump the
        # pose prior to the best-scoring BoW keyframe anyway and let the
        # wide-radius LOST matching try to re-acquire. Off by default — an
        # unverified jump can latch onto the wrong place in self-similar
        # scenes; the verified PnP path is the supported relocalizer.
        .optional("unverified_bow_teleport", bool, False)
        # device chunked frame loop (frontend/device_loop.py): process
        # frames in chunks of this size through one compiled lax.scan —
        # the TPU-native frame loop (bench/eval throughput path). 0/1 =
        # per-frame host loop. Initialization and relocalization always run
        # on the host path; results for buffered frames are emitted at
        # chunk boundaries.
        .optional("chunk_size", int, 0)
        # LM iterations for windowed local BA (host path AND in-scan
        # chunk-boundary BA). 0 = engine default (TrackerConfig). The
        # convergence profile (tools/profile_ba_convergence.py) measures
        # where extra iterations stop reducing cost on real map windows.
        .optional("local_ba_iters", int, 0)
    )

    def __init__(self, cam: PinholeCamera, config: Optional[dict] = None):
        super().__init__(config)
        orb = OrbParams(
            num_keypoints=self.cfg["keypoints"],
            num_levels=self.cfg["levels"],
            scale_factor=self.cfg["scale_factor"],
            fast_threshold=self.cfg["fast_threshold"],
            fast_min_threshold=self.cfg["fast_min_threshold"],
            brief_mode=self.cfg["brief_mode"],
        )
        tcfg = TrackerConfig(
            orb=orb,
            map_cfg=MapConfig(
                max_keyframes=self.cfg["max_keyframes"],
                max_landmarks=self.cfg["max_landmarks"],
                num_keypoints=self.cfg["keypoints"],
            ),
        )
        if self.cfg["local_ba_iters"] > 0:
            tcfg = tcfg._replace(local_ba_iters=self.cfg["local_ba_iters"])
        mode = self.cfg["mode"]
        if mode == "stereo":
            self.engine = StereoTracker(
                cam,
                focal_x_baseline=self.cfg["focal_x_baseline"],
                cfg=tcfg,
                y_margin=self.cfg["y_matching_margin"],
                depth_threshold=self.cfg["depth_threshold"],
            )
        elif mode == "rgbd":
            self.engine = RGBDTracker(cam, cfg=tcfg, max_depth=self.cfg["max_depth"])
        elif mode == "mono":
            self.engine = MonoTracker(cam, tcfg)
        else:
            raise ValueError(f"unknown tracker mode '{mode}'")

        self.engine.mapping_enabled = self.cfg["mapping"]
        # chunked device frame loop (chunk_size >= 2): steady TRACKING
        # frames ride the lax.scan device loop; init / relocalization / nav
        # fusion frames take the per-frame host path. Results for buffered
        # frames are emitted at chunk boundaries, one chunk late (the
        # drained chunk's device->host copy finished while the next one
        # computed), so the steady loop never blocks on the device.
        self._chunk_size = int(self.cfg["chunk_size"] or 0)
        self._chunked = None              # lazily-built ChunkedTracker
        self._chunk_buf: list = []        # entries awaiting dispatch
        self._chunk_inflight: list = []   # (frame_id, entry) dispatched, undrained
        self._host_dirty = False          # host path ran since last chunk
        self._device_rectify = None       # (H,W,2) remap for on-device undistort
        self.loop_closer = None
        self._vocab = None
        self._loop_pending_kfs = 0
        # asynchronous loop closing: a single worker thread serializes every
        # loop-closer operation (add_keyframe / remap / verify) so the BoW
        # database never races; the main thread only polls verdict futures
        self._loop_exec = None            # lazily-created 1-thread executor
        self._loop_verdicts = None        # deque[(future, perm_epoch)]
        self._loop_perm_log: list = []    # compactions since oldest in-flight
        self._last_result_time = 0.0
        self._lost_since: Optional[float] = None
        self._laser_buffer: list = []
        self._frame_times: list = []
        self._mask_pending = bool(self.cfg["mask_radius"] or self.cfg["mask_image"])
        self._sensor_queue = None
        self._last_map_emit = 0.0
        # nav-state fusion (OpenVSLAMTracker.cpp:76-120 per-feed prior):
        # last odometry state, used to form a frame-to-frame delta
        self._last_nav_odom = None
        # last reference (ground-truth) pose seen on the sensor stream
        # (OpenVSLAMStereoTracker.cpp:70-104 set_current_ref_pose parity)
        self.ref_pose = None

        # map persistence parity: load map.db-equivalent if configured
        if self.cfg["map_file"]:
            from ..mapstore.checkpoint import load_map

            m = load_map(self.cfg["map_file"])
            if m is not None:
                self.engine.map = m
                self.engine.status = TrackerStatus.LOST  # relocalize into it

    # -- pipeline API -------------------------------------------------------

    def start(self, sensor_queue=None):
        self._sensor_queue = sensor_queue

    def _configure_mask(self, shape):
        """Build the keypoint mask on first frame (needs the image size),
        matching configureMasks: radial disc or grayscale mask file."""
        self._mask_pending = False
        h, w = shape
        if self.cfg["mask_image"]:
            import cv2

            m = cv2.imread(self.cfg["mask_image"], cv2.IMREAD_GRAYSCALE)
            if m is None:
                return
            if m.shape != (h, w):
                m = cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
            self.engine.set_mask(m > 0)
        elif self.cfg["mask_radius"] > 0:
            yy, xx = np.mgrid[0:h, 0:w]
            r2 = (xx - w / 2.0) ** 2 + (yy - h / 2.0) ** 2
            self.engine.set_mask(r2 <= self.cfg["mask_radius"] ** 2)

    def _maybe_emit_map(self, now: float):
        """Periodic landmark-map push onto the sensor queue (emitMap parity:
        the recorder persists these FeatureList entries)."""
        interval = self.cfg["emit_map_seconds"]
        if not interval or self._sensor_queue is None:
            return
        if now - self._last_map_emit < interval:
            return
        self._last_map_emit = now
        from .queues import SensorQueueEntry

        self._sensor_queue.push(
            SensorQueueEntry(
                timestamp=now, kind="features", features=self.get_features(2048)
            )
        )

    def process_image(self, entry: CameraQueueEntry, nav_odom=None, nav_map=None,
                      sensor_values=()) -> list:
        if self.cfg["wait_for_navigation_data"] and nav_odom is None:
            return []
        if self._mask_pending:
            self._configure_mask(entry.image.shape[:2])

        # reference-pose injection: ground-truth states on the sensor stream
        # are latched and surfaced (set_current_ref_pose parity)
        for sv in sensor_values:
            if getattr(sv, "kind", None) == "global_state" and sv.reference \
                    and sv.state is not None:
                self.ref_pose = sv.state

        # per-frame navigation prior: a map-frame state is an absolute Tcw
        # prediction; odometry contributes its frame-to-frame DELTA composed
        # onto the last tracked pose (frame offset between the odometry world
        # and the map world cancels in the delta)
        nav_prior = None
        from ..geometry.se3 import SE3 as _SE3, se3_compose as _compose, \
            se3_inverse as _inv
        import jax.numpy as _jnp

        def _tcw(state):
            pos, R_wc = state
            Rn = np.asarray(R_wc, np.float32)
            tn = -Rn.T @ np.asarray(pos, np.float32)
            return _SE3(_jnp.asarray(Rn.T), _jnp.asarray(tn))

        if nav_map is not None:
            nav_prior = _tcw(nav_map)
        elif (
            nav_odom is not None
            and self._last_nav_odom is not None
            and self.engine.status == TrackerStatus.TRACKING
        ):
            delta = _compose(_tcw(nav_odom), _inv(_tcw(self._last_nav_odom)))
            nav_prior = _compose(delta, self.engine.pose)
        if nav_odom is not None:
            self._last_nav_odom = nav_odom

        # chunked device loop: steady TRACKING frames with no per-frame nav
        # prior ride the scan (the reference's hot loop IS its pipeline —
        # SlamManager.cpp:54-239; here the pipeline's hot loop IS the
        # compiled chunk scan). Everything else (init, lost/relocalize, nav
        # fusion) stays on the host path.
        if self._chunk_size >= 2:
            chunkable = (
                self.engine.status == TrackerStatus.TRACKING
                and nav_prior is None
            )
            if chunkable:
                return self._chunk_process(entry)
            flushed = self._chunk_drain_all()
            res = self._process_host(entry, nav_odom, nav_prior)
            return flushed + res if flushed else res

        return self._process_host(entry, nav_odom, nav_prior)

    def _process_host(self, entry: CameraQueueEntry, nav_odom=None,
                      nav_prior=None) -> list:
        """Per-frame host path: one engine.process round trip per frame."""
        self._host_dirty = True
        t0 = time.monotonic()
        aux = entry.image_second if self.cfg["mode"] == "stereo" else entry.aux
        st, pose = self.engine.process(entry.image, aux=aux, nav_prior=nav_prior)
        self._frame_times.append(time.monotonic() - t0)
        if len(self._frame_times) > 30:
            self._frame_times.pop(0)
        self._maybe_emit_map(entry.timestamp)

        if self.cfg["loop_closure"]:
            self._ensure_loop_closer()
            self._maybe_close_loop()
        elif not self.engine.mapping_in_flight:
            # no slot-keyed side tables to fix — discard events (non-blocking)
            self.engine._drain_compact_stats(only_ready=True)
            self.engine._compactions.clear()

        if st == TrackerStatus.LOST:
            if self._lost_since is None:
                self._lost_since = entry.timestamp
            if (
                self.cfg["relocalize_with_nav_data"]
                and nav_odom is not None
                and entry.timestamp - self._lost_since > self.cfg["time_to_relocalize"]
            ):
                self._reseed_from_nav(nav_odom)
            elif self.loop_closer is not None:
                self._bow_relocalize()
        else:
            self._lost_since = None

        if pose is None:
            return []
        # optical -> lpslam frame conversion at the boundary, matching
        # createTrackerResult (OpenVSLAMTrackerBase.cpp:307-329)
        center_lp, q = create_tracker_result_pose(
            np.asarray(pose.R), np.asarray(pose.t)
        )
        return [
            TrackerResult(
                timestamp=entry.timestamp,
                position=center_lp,
                orientation_wxyz=q,
                valid=True,
                position_sigma=_sigma_to_lpslam(
                    getattr(self.engine, "last_sigma_pos", np.zeros(3))
                ),
                orientation_sigma=float(
                    getattr(self.engine, "last_sigma_rot", 0.0)
                ),
            )
        ]

    # -- chunked device loop (pipeline fast path) ----------------------------

    def attach_device_rectify(self, rectify_map) -> None:
        """Move undistortion onto the device for the chunk loop: frames are
        uploaded raw (uint8 when possible — 4x less transfer than rectified
        float32) and remapped on-device batched over the chunk. The host
        RectifyProcessor should then be bypassed for this tracker's frames.
        rectify_map: (H, W, 2) source coordinates; stereo: (2, H, W, 2)."""
        self._device_rectify = np.asarray(rectify_map, np.float32)
        self._chunked = None  # rebuild with the maps

    def _chunk_tracker(self):
        if self._chunked is None:
            from ..frontend.device_loop import ChunkedTracker

            self._chunked = ChunkedTracker(
                self.engine, rectify_map=self._device_rectify
            )
            self._host_dirty = False
        return self._chunked

    def _stack_chunk(self, entries) -> object:
        """Stack buffered entries into the scan's input layout. uint8 when
        the data is integral 0..255 (the wire-efficient form)."""
        def stack(imgs):
            a = np.stack(imgs)
            if a.dtype != np.uint8 and a.size and float(a.max(initial=0.0)) <= 255.0:
                if np.allclose(a, np.round(a)):
                    a = a.astype(np.uint8)
            return a

        mode = self.cfg["mode"]
        if mode == "stereo":
            return stack([np.stack([e.image, e.image_second]) for e in entries])
        if mode == "rgbd":
            # depth stays float (metric units)
            return (stack([e.image for e in entries]),
                    np.stack([e.aux for e in entries]).astype(np.float32))
        return stack([e.image for e in entries])

    def _chunk_process(self, entry: CameraQueueEntry):
        """Buffer the frame; dispatch a chunk when full. Returns None while
        buffering (deferred — the manager must not emit an invalid result),
        or the drained per-frame results of previously-dispatched chunks."""
        self._chunk_buf.append(entry)
        if len(self._chunk_buf) < self._chunk_size:
            return None
        ct = self._chunk_tracker()
        if self._host_dirty:
            # host path ran since the last chunk: its pose/status are newer
            # than the pending device carry
            ct.discard_carry()
            self._host_dirty = False
        buf, self._chunk_buf = self._chunk_buf, []
        start_fid = self.engine.frame_id
        t0 = time.monotonic()
        ct.process_chunk(self._stack_chunk(buf))
        dt = (time.monotonic() - t0) / len(buf)
        self._frame_times.append(dt)
        if len(self._frame_times) > 30:
            self._frame_times.pop(0)
        self._chunk_inflight.extend(
            (start_fid + i, e) for i, e in enumerate(buf)
        )
        results = self._emit_chunk_results(ct.drain(keep_last=1))
        self._maybe_emit_map(entry.timestamp)
        if self.cfg["loop_closure"]:
            self._chunk_loop_boundary(ct)
        return results

    def _chunk_drain_all(self) -> list:
        """Flush the chunk path completely: run still-buffered frames through
        the host path and drain every dispatched chunk's outputs. Called
        when a frame needs the host path (nav prior, lost recovery) and on
        stop — per-frame result order is preserved."""
        if self._chunked is None and not self._chunk_buf:
            return []
        results = []
        if self._chunked is not None:
            self._chunked.sync()
            results += self._emit_chunk_results(self._chunked.drain())
        buf, self._chunk_buf = self._chunk_buf, []
        for e in buf:
            results += self._process_host(e)
        return results

    def flush(self) -> list:
        """Drain deferred chunk results (pipeline stop / end of dataset),
        then land any in-flight loop verdicts so the final map is
        corrected."""
        out = self._chunk_drain_all()
        self._loop_drain()
        return out

    def _emit_chunk_results(self, drained) -> list:
        """Per-frame TrackerResults + trajectory records from drained chunk
        outputs; detects in-chunk tracking loss (one chunk late) and hands
        recovery to the host path."""
        sts, n_inl, pR, pt, kf_ins, sig_p, sig_r = drained
        out = []
        from ..geometry.se3 import SE3 as _SE3

        for i in range(len(sts)):
            fid, entry = self._chunk_inflight.pop(0)
            tracking = sts[i] == int(TrackerStatus.TRACKING)
            pose = _SE3(pR[i], pt[i]) if tracking else None
            self.engine.trajectory.append(
                (fid, pose, TrackerStatus(int(sts[i])))
            )
            if tracking:
                center_lp, q = create_tracker_result_pose(pR[i], pt[i])
                out.append(TrackerResult(
                    entry.timestamp, center_lp, q, True,
                    position_sigma=_sigma_to_lpslam(sig_p[i]),
                    orientation_sigma=float(sig_r[i]),
                ))
            else:
                out.append(TrackerResult(
                    entry.timestamp, np.zeros(3),
                    np.array([1.0, 0, 0, 0]), False,
                ))
        if len(sts) and sts[-1] == int(TrackerStatus.LOST):
            # fold authoritative device state into the host engine; the
            # host path (relocalization) takes over on the next frame
            self._chunked.invalidate_carry()
            if self.engine.status == TrackerStatus.LOST \
                    and self._lost_since is None and out:
                self._lost_since = out[-1].timestamp
        return out

    def _chunk_loop_boundary(self, ct) -> None:
        """Loop-closure bookkeeping at a chunk boundary: sync the keyframe
        counters, realign the BoW database through any boundary compactions,
        add new keyframes, and attempt closure (the engine's loop thread
        cadence, amortized over the chunk)."""
        ct.sync()
        self._ensure_loop_closer()
        closed = self._maybe_close_loop()
        if closed:
            # pose was resynced to the corrected keyframe: rebuild the carry
            ct.discard_carry()

    def _sync_compactions(self):
        """Consume MapStore compaction events: remap the loop-closer BoW
        database rows and the pending-keyframe cursor through the keyframe
        slot permutation. In async mode the remap is enqueued on the loop
        worker (ordered with add/verify jobs) and logged so in-flight
        verdicts can be index-corrected at apply time."""
        for kf_order, n_kf_after in self.engine.drain_compactions():
            if self.loop_closer is not None:
                if self._loop_exec is not None:
                    lc, order = self.loop_closer, np.asarray(kf_order).copy()
                    self._loop_exec.submit(lc.remap, order, n_kf_after)
                else:
                    self.loop_closer.remap(kf_order, n_kf_after)
            if self._loop_verdicts:
                self._loop_perm_log.append(
                    (np.asarray(kf_order)[:n_kf_after].copy(), n_kf_after)
                )
            # surviving old slots (in order) are kf_order[:n_kf_after]; the
            # new pending cursor counts how many of them were already added
            self._loop_pending_kfs = int(
                np.sum(kf_order[:n_kf_after] < self._loop_pending_kfs)
            )

    def _loop_cfg(self):
        """LoopConfig for this tracker mode: metric maps (stereo / RGB-D) run
        with fixed Sim3 scale, matching the engine's fixed-scale pose graph
        for depth-bearing sensors."""
        from ..loop.detector import LoopConfig

        return LoopConfig(
            fix_scale=self.cfg["mode"] != "mono",
            global_ba_iters=int(self.cfg["loop_global_ba_iters"]),
        )

    def _ensure_loop_closer(self):
        if self.loop_closer is not None:
            return
        import os

        # shipped pre-trained vocabulary (orb_vocab.dbow2 parity asset) is
        # the default; an explicit vocab_file overrides; lazy self-training
        # remains the last-resort fallback
        path = self.cfg["vocab_file"] or os.path.join(
            os.path.dirname(os.path.dirname(__file__)),
            "assets", "orb_vocab.npz",
        )
        if os.path.exists(path) or os.path.exists(path + ".npz"):
            from ..loop import load_vocabulary, LoopCloser

            vocab = load_vocabulary(path)
            self.loop_closer = LoopCloser(
                vocab, self.cfg["max_keyframes"], cfg=self._loop_cfg()
            )

    def _maybe_close_loop(self) -> bool:
        """Returns True when a loop closure was accepted and applied (the
        tracker pose was resynced)."""
        import jax.numpy as jnp

        # wait for a quiescent map: loop bookkeeping indexes keyframe slots,
        # which must not shift under it (async mapping / pending compaction);
        # mapping settles within a frame or two, far before the next keyframe
        if self.engine.mapping_in_flight:
            return False
        self._sync_compactions()
        nk = self.engine.n_keyframes
        if nk <= self._loop_pending_kfs:
            # no new keyframe — but a background verdict may have landed
            return self._loop_poll()
        if self.loop_closer is None:
            # train the vocabulary lazily on the map's own descriptors (the
            # reference ships a pre-trained orb_vocab.dbow2; self-training on
            # session data is the dataset-free equivalent)
            if nk < 4:
                self._loop_pending_kfs = nk
                return False
            from ..loop import train_vocabulary, LoopCloser

            m = self.engine.map
            desc = np.asarray(m.kf_desc[:nk]).reshape(-1, 8)
            valid = np.asarray(m.kf_kp_valid[:nk]).reshape(-1)
            train = desc[valid][:4096]
            vocab = train_vocabulary(train, n_words=min(512, max(64, len(train) // 8)))
            self.loop_closer = LoopCloser(
                vocab, self.cfg["max_keyframes"], cfg=self._loop_cfg()
            )
            for k in range(nk):
                self.loop_closer.add_keyframe(m, k)
            self._loop_pending_kfs = nk
            return False
        closed = self._loop_poll()
        for k in range(self._loop_pending_kfs, nk):
            if self.cfg["loop_async"]:
                self._loop_submit(k)
            else:
                self.loop_closer.add_keyframe(self.engine.map, k)
                self.engine.map, res = self.loop_closer.try_close(
                    self.engine.map, k, cam=self.engine.cam
                )
                if res.detected:
                    self._loop_resync_pose()
                    closed = True
        self._loop_pending_kfs = nk
        return closed

    # -- asynchronous loop closing (engine loop-thread equivalent) -----------

    def _loop_submit(self, k: int) -> None:
        """Enqueue BoW insert + detect/verify for keyframe k on the loop
        worker, against an immutable snapshot of the current map pytree."""
        if self._loop_exec is None:
            from concurrent.futures import ThreadPoolExecutor
            from collections import deque

            self._loop_exec = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="loop-closer"
            )
            self._loop_verdicts = deque()
        lc, m = self.loop_closer, self.engine.map

        def job():
            lc.add_keyframe(m, k)
            return lc.verify(m, k)

        self._loop_verdicts.append(
            (self._loop_exec.submit(job), len(self._loop_perm_log))
        )

    def _loop_poll(self, block: bool = False) -> bool:
        """Apply any finished loop verdicts (oldest first, preserving the
        detector's ordering). Non-blocking unless `block`."""
        closed = False
        while self._loop_verdicts:
            fut, epoch = self._loop_verdicts[0]
            if not (block or fut.done()):
                break
            self._loop_verdicts.popleft()
            closed |= self._loop_apply(fut.result(), epoch)
        if self._loop_verdicts is not None and not self._loop_verdicts:
            self._loop_perm_log.clear()  # nothing in flight references it
        return closed

    def _loop_apply(self, verdict, epoch: int) -> bool:
        """Apply a verified closure to the CURRENT map: remap the verdict's
        keyframe indices through any compactions that landed since it was
        submitted, then dispatch the compiled correction (+ optional global
        BA) — one dispatch, no host blocking."""
        if not verdict.result.detected:
            return False
        k_new, cand = verdict.k_new, verdict.result.candidate
        for surv, _n_after in self._loop_perm_log[epoch:]:
            surv = list(surv)
            if k_new not in surv or cand not in surv:
                return False  # a party to the loop was culled — drop verdict
            k_new, cand = surv.index(k_new), surv.index(cand)
        verdict = verdict._replace(
            k_new=k_new, result=verdict.result._replace(candidate=cand)
        )
        self.engine.map, res = self.loop_closer.apply(
            self.engine.map, verdict, cam=self.engine.cam
        )
        if res.detected:
            self._loop_resync_pose()
        return res.detected

    def _loop_resync_pose(self) -> None:
        """The correction moved every keyframe: resync the tracker pose to
        the (corrected) newest keyframe so tracking continues in the
        corrected frame."""
        from ..geometry.se3 import SE3

        kk = self.engine.map.n_kf - 1
        self.engine.pose = SE3(self.engine.map.kf_R[kk], self.engine.map.kf_t[kk])

    def _loop_drain(self) -> bool:
        """Block until every in-flight verification lands and apply the
        verdicts (end of stream / before host-side BoW reads)."""
        if self._loop_exec is None:
            return False
        return self._loop_poll(block=True)

    def _bow_relocalize(self):
        """Relocalization after tracking loss: BoW candidates from the
        keyframe database → PnP + pose-refine with inlier gate in the engine
        (matching the engine relocalizer's candidate→solve→verify chain,
        OpenVSLAMTrackerBase.cpp:205-211). Optionally (config
        `unverified_bow_teleport`) jumps the pose prior to the best-scoring
        keyframe when geometry can't verify."""
        feats = getattr(self.engine, "last_feats", None)
        if feats is None:
            return
        # quiesce the loop worker: the BoW database must not grow under the
        # host-side scoring read below
        self._loop_drain()
        from ..loop.vocab import bow_vector, bow_similarity

        v = bow_vector(self.loop_closer.vocab, feats.desc, feats.valid)
        scores = np.array(bow_similarity(v, self.loop_closer.db))
        scores[self.loop_closer.n:] = -1.0
        order = np.argsort(-scores)
        cands = [int(k) for k in order[:3] if scores[k] >= 0.1]
        if not cands:
            return
        # inlier gate scales with the keypoint budget (20 verified inliers
        # out of 1200 keypoints is too weak a consensus to trust)
        min_inl = max(30, self.cfg["keypoints"] // 20)
        if self.engine.relocalize_with_candidates(feats, cands, min_inliers=min_inl):
            self._lost_since = None
            return
        if self.cfg["unverified_bow_teleport"]:
            from ..geometry.se3 import SE3

            m = self.engine.map
            best = cands[0]
            self.engine.pose = SE3(m.kf_R[best], m.kf_t[best])

    def _reseed_from_nav(self, nav_odom):
        """Relocalization prior from navigation data (fork extension parity)."""
        from ..geometry.se3 import SE3
        import jax.numpy as jnp

        pos, R_wc = nav_odom
        R = np.asarray(R_wc)
        t = -R.T @ np.asarray(pos)
        self.engine.pose = SE3(jnp.asarray(R.T, jnp.float32), jnp.asarray(t, jnp.float32))
        self.engine.status = TrackerStatus.LOST  # next frame tries wide-radius match
        self._lost_since = None

    # -- laser / occupancy (fork extension parity) --------------------------

    def add_laser_scan(self, scan: LaserScan):
        self._laser_buffer.append(scan)
        cutoff = scan.timestamp - self.cfg["max_laser_age"]
        self._laser_buffer = [s for s in self._laser_buffer if s.timestamp >= cutoff]

    def get_occupancy_map(self):
        """Project landmarks (+ buffered laser endpoints) into a 2D grid.

        Returns dict(grid int8 (H,W): -1 unknown / 0 free / 100 occupied,
        origin (2,), cell_size) — LpMapInfo-equivalent
        (/root/reference/src/Trackers/OpenVSLAMStereoTracker.cpp:382-402).
        """
        m = self.engine.map
        nk = int(m.n_kf)
        if nk == 0:
            return None
        lmv = np.asarray(m.lm_valid)
        pts = np.asarray(m.lm_pos)[lmv]
        if len(pts) == 0:
            return None
        cs = self.cfg["occupancy_cell_size"]
        # optical frame: x right, z forward — the ground plane is (x, z)
        kf_R = np.asarray(m.kf_R[:nk])
        kf_t = np.asarray(m.kf_t[:nk])
        centers = -np.einsum("kij,kj->ki", kf_R.transpose(0, 2, 1), kf_t)
        all_xy = np.concatenate([pts[:, [0, 2]], centers[:, [0, 2]]], 0)
        lo = all_xy.min(0) - 3 * cs
        hi = all_xy.max(0) + 3 * cs
        shape = np.maximum(((hi - lo) / cs).astype(int) + 1, 1)
        grid = np.full((shape[1], shape[0]), -1, np.int8)

        def to_cell(xy):
            c = ((xy - lo) / cs).astype(int)
            return np.clip(c, 0, shape - 1)

        # fully-vectorized free-space carving: every (keyframe, observed
        # landmark) pair is one ray; all rays are sampled at S points in one
        # broadcasted op (no per-cell Python stepping). Rays are uniformly
        # subsampled only if the total exceeds a budget — never silently by
        # a fixed stride.
        kf_lm = np.asarray(m.kf_lm_idx[:nk])
        kk, nn = np.nonzero(kf_lm >= 0)
        lm_idx = kf_lm[kk, nn]
        keep = lmv[lm_idx]
        kk, lm_idx = kk[keep], lm_idx[keep]
        # one ray per unique (keyframe, landmark)
        uniq = np.unique(np.stack([kk, lm_idx], 1), axis=0)
        MAX_RAYS = 200_000
        if len(uniq) > MAX_RAYS:
            sel = np.random.default_rng(0).permutation(len(uniq))[:MAX_RAYS]
            uniq = uniq[sel]
        if len(uniq):
            lm_world = np.asarray(m.lm_pos)
            src = centers[uniq[:, 0]][:, [0, 2]]              # (R, 2)
            dst = lm_world[uniq[:, 1]][:, [0, 2]]             # (R, 2)
            max_len_cells = np.max(np.abs(dst - src)) / cs + 1
            S = int(np.clip(max_len_cells, 2, 96))
            ts = np.linspace(0.0, 1.0 - 1.0 / S, S)[None, :, None]
            rays = src[:, None, :] + (dst - src)[:, None, :] * ts  # (R,S,2)
            cells = to_cell(rays.reshape(-1, 2))
            grid[cells[:, 1], cells[:, 0]] = 0
        cam_cells = to_cell(centers[:, [0, 2]])
        grid[cam_cells[:, 1], cam_cells[:, 0]] = 0
        lm_cells = to_cell(pts[:, [0, 2]])
        grid[lm_cells[:, 1], lm_cells[:, 0]] = 100
        for scan in self._laser_buffer:
            angles = scan.angle_min + np.arange(len(scan.ranges)) * scan.angle_increment
            ok = (scan.ranges > 0) & (scan.ranges < scan.range_max)
            ex = scan.ranges[ok] * np.cos(angles[ok])
            ez = scan.ranges[ok] * np.sin(angles[ok])
            pts_cam = np.stack([ex, np.zeros_like(ex), ez], 1)
            if scan.extrinsic_R is not None:
                pts_cam = pts_cam @ np.asarray(scan.extrinsic_R).T
                if scan.extrinsic_t is not None:
                    pts_cam = pts_cam + np.asarray(scan.extrinsic_t)
            R = np.asarray(m.kf_R[nk - 1])
            t = np.asarray(m.kf_t[nk - 1])
            ctr = -R.T @ t
            pts_l = pts_cam @ R + ctr
            for c in to_cell(pts_l[:, [0, 2]]):
                grid[c[1], c[0]] = 100
        return {"grid": grid, "origin": lo, "cell_size": cs}

    # -- status / export ----------------------------------------------------

    def status(self) -> dict:
        ft = float(np.mean(self._frame_times)) if self._frame_times else 0.0
        return {
            "state": self.engine.status.name,
            "keyframes": self.engine.n_keyframes,
            "landmarks": self.engine.n_landmarks,
            "frame_time": ft,
        }

    def get_features(self, max_count: int = 0, boundary=None, transform=None):
        """Landmark export (mappingGetFeatures parity,
        OpenVSLAMTrackerBase.cpp:394-427 + LpSlamManager.h:106-109).

        boundary: optional ((y_min, z_min), (y_max, z_max)) rectangle in the
        lpslam map plane (LpSlamMapBoundary: top_left/bottom_right with
        +y right, +z forward) — only landmarks whose lpslam-frame (y, z)
        fall inside are exported (the reference declares the parameter but
        marks it "not supported at this time"; here it filters).
        transform: optional 3x3 (or flat 9-element, LpSlamMatrix9x9)
        matrix applied to each lpslam-frame position before export, exactly
        like the reference's `trans * p_lpslam`.
        """
        from ..geometry.frames import optical_to_lpslam

        m = self.engine.map
        lmv = np.asarray(m.lm_valid)
        pts = np.asarray(m.lm_pos)[lmv]
        obs = np.asarray(m.lm_n_obs)[lmv]
        # engine-optical -> lpslam frame (-y, x, z), reference line 409
        pts = np.asarray(optical_to_lpslam(pts)) if len(pts) else pts
        if boundary is not None:
            (y0, z0), (y1, z1) = boundary
            ylo, yhi = min(y0, y1), max(y0, y1)
            zlo, zhi = min(z0, z1), max(z0, z1)
            keep = (
                (pts[:, 1] >= ylo) & (pts[:, 1] <= yhi)
                & (pts[:, 2] >= zlo) & (pts[:, 2] <= zhi)
            )
            pts, obs = pts[keep], obs[keep]
        if transform is not None:
            T = np.asarray(transform, np.float32).reshape(3, 3)
            pts = pts @ T.T
        if max_count and len(pts) > max_count:
            pts, obs = pts[:max_count], obs[:max_count]
        return [{"position": p, "observations": int(o)} for p, o in zip(pts, obs)]

    def get_features_count(self, boundary=None) -> int:
        """mappingGetFeaturesCount parity, honoring the boundary filter."""
        return len(self.get_features(0, boundary=boundary))

    def export_csv(self, path: str):
        """Landmark CSV in the engine/world frame (mappingExportCSV parity —
        the reference delegates to openvslam's map_publisher::export_to_csv,
        which writes raw world positions, NOT the lpslam-frame conversion
        that mappingGetFeatures applies)."""
        m = self.engine.map
        lmv = np.asarray(m.lm_valid)
        pts = np.asarray(m.lm_pos)[lmv]
        obs = np.asarray(m.lm_n_obs)[lmv]
        with open(path, "w") as f:
            f.write("x,y,z,n_obs\n")
            for p, o in zip(pts, obs):
                f.write(f"{p[0]},{p[1]},{p[2]},{int(o)}\n")

    def set_mapping_mode(self, enabled: bool):
        """Freeze/unfreeze mapping (reference mappingSetMode parity)."""
        self.engine.mapping_enabled = bool(enabled)

    def save_map(self, path: str):
        from ..mapstore.checkpoint import save_map

        save_map(self.engine.map, path)

    def stop(self):
        self._loop_drain()
        if self._loop_exec is not None:
            self._loop_exec.shutdown(wait=True)
            self._loop_exec = None
        if self.cfg["map_file"]:
            self.save_map(self.cfg["map_file"])
