"""SlamManager — pipeline orchestration (reference Manager/SlamManager parity).

Owns the camera/sensor/result queues and the worker threads:
- worker: pops camera frames, drains the sensor queue up to the frame
  timestamp, requests nav data from the host app, runs processors then
  trackers, pushes results (reference worker lambda SlamManager.cpp:54-239);
- notify worker: pops results and invokes the reconstruction callback
  (SlamManager.cpp:240-257);
- image-callback worker: JPEG-compresses frames for remote viewing
  (SlamManager.cpp:258-314);
- RecordEngine / ReplayEngine integration (SlamManager.cpp:565-573);
- addImageFromBuffer-style external ingestion for embedding hosts
  (SlamManager.cpp:1038-1297): mono/stereo buffers, compressed JPEG input,
  pixel-format conversion.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from .config import FullConfig, CameraConfig, load_config_file, ConfigError
from .queues import (
    BoundedQueue,
    CameraQueueEntry,
    SensorQueueEntry,
    ResultQueueEntry,
    ManagedThread,
    FramerateCompute,
)
from .record import RecordEngine, ReplayEngine, _encode_jpeg
from .sources import (ImageSourceBase, FileImageSource, SyntheticSource,
                      OpenCVCameraSource, ReplaySource, ZedOpenCaptureSource,
                      ZedSdkSource)
from .processors import (
    ProcessorBase,
    BlackoutImageProcessor,
    AdjustIntensityProcessor,
    CameraCalibrationProcessor,
)
from .rectify import RectifyProcessor
from .trackers import TrackerBase, VSLAMTracker, LaserScan
from ..geometry.camera import PinholeCamera


@dataclass
class SlamStatus:
    """LpSlamStatus parity (/root/reference/src/Interface/LpSlamTypes.h:78-87)."""

    localization: str = "Off"
    landmarks: int = 0
    keyframes: int = 0
    frame_time: float = 0.0
    fps: float = 0.0
    frames_processed: int = 0
    # last worker-thread exception (repr) — "" when healthy; the reference
    # logs worker failures, here they are surfaced in the polled status too
    error: str = ""


SOURCE_REGISTRY = {
    "File": FileImageSource,
    "FileSource": FileImageSource,        # reference datasource name
    "OpenCV": OpenCVCameraSource,
    "Synthetic": SyntheticSource,
    "Webots": SyntheticSource,            # simulation alias
    "Zed": ZedOpenCaptureSource,          # reference datasource name
    "ZedSdk": ZedSdkSource,               # StereoLabs SDK path (pyzed-gated;
                                          # raises pointing at "Zed" without it)
    "Replay": ReplaySource,
}

PROCESSOR_REGISTRY = {
    "BlackoutImage": BlackoutImageProcessor,
    "AdjustIntensity": AdjustIntensityProcessor,
    "CameraCalibration": CameraCalibrationProcessor,
    "Rectify": RectifyProcessor,
}


class SlamManager:
    """Pipeline owner. Register stages by name (like the reference's string
    registry SlamManager.cpp:393-501) or pass instances, then start()."""

    def __init__(self, config: Optional[FullConfig] = None):
        self.camera_queue = BoundedQueue(maxsize=64)
        self.sensor_queue = BoundedQueue(maxsize=256)
        self.result_queue = BoundedQueue(maxsize=64)
        self.image_cb_queue = BoundedQueue(maxsize=8)

        self.sources: list = []
        self.processors: list = []
        self.trackers: list = []
        self.cameras: dict = {}
        self.markers: dict = {}  # id -> MarkerConfig (known fiducials)

        self.recorder = RecordEngine()
        self.replay: Optional[ReplayEngine] = None
        self._record_enabled = False

        self._worker: Optional[ManagedThread] = None
        self._notify_worker: Optional[ManagedThread] = None
        self._image_cb_worker: Optional[ManagedThread] = None

        self.on_reconstruction: Optional[Callable] = None
        self.on_image: Optional[Callable] = None
        self.request_nav_data: Optional[Callable] = None
        self.request_nav_transformation: Optional[Callable] = None

        self._fps = FramerateCompute()
        self._frames = 0
        self._running = False
        self.store_images_dir: Optional[str] = None
        # live OpenCV preview every 10th frame (SlamManager.cpp:118-131);
        # auto-disables when no display is available
        self.show_live = False

        if config is not None:
            self.apply_config(config)

    # -- configuration ------------------------------------------------------

    def read_configuration_file(self, path: str) -> None:
        self.apply_config(load_config_file(path))

    def apply_config(self, cfg: FullConfig) -> None:
        self.cameras = dict(cfg.cameras)
        for mk in getattr(cfg, "markers", []):
            self.markers[mk.marker_id] = mk
        self._record_enabled = cfg.manager.record
        self.recorder.record_images = cfg.manager.record_images
        self.show_live = cfg.manager.show_live
        for type_name, conf in cfg.datasources:
            self.add_source_by_name(type_name, conf)
        for type_name, conf in cfg.processors:
            self.add_processor_by_name(type_name, conf)
        for type_name, conf in cfg.trackers:
            self.add_tracker_by_name(type_name, conf)

    def set_recording(self, enabled: bool) -> None:
        """Enable/disable session recording before start()."""
        self._record_enabled = bool(enabled)

    def set_camera_configuration(self, cam: CameraConfig):
        self.cameras[cam.number] = cam

    def get_camera_configuration(self, number: int) -> Optional[CameraConfig]:
        return self.cameras.get(number)

    def _camera_model(self, number: int = 0) -> PinholeCamera:
        cc = self.cameras.get(number)
        if cc is None or cc.fx == 0:
            raise ConfigError(f"no camera configuration for camera {number}")
        return PinholeCamera.make(cc.fx, cc.fy, cc.cx, cc.cy)

    # -- registry -----------------------------------------------------------

    def add_source_by_name(self, type_name: str, config: Optional[dict] = None):
        cls = SOURCE_REGISTRY.get(type_name)
        if cls is None:
            raise ConfigError(f"unknown datasource type '{type_name}'")
        src = cls(config)
        self.sources.append(src)
        return src

    def add_processor_by_name(self, type_name: str, config: Optional[dict] = None):
        cls = PROCESSOR_REGISTRY.get(type_name)
        if cls is None:
            raise ConfigError(f"unknown processor type '{type_name}'")
        proc = cls(config)
        if isinstance(proc, RectifyProcessor):
            n = proc.cfg["camera_number"]
            cam = self.cameras.get(n)
            if cam is not None:
                proc.configure(cam, self.cameras.get(n + 1))
        self.processors.append(proc)
        return proc

    def add_tracker_by_name(self, type_name: str, config: Optional[dict] = None):
        if type_name not in ("VSLAM", "OpenVSLAM", "OpenVSLAMStereo"):
            raise ConfigError(f"unknown tracker type '{type_name}'")
        config = dict(config or {})
        if type_name == "OpenVSLAMStereo":
            config.setdefault("mode", "stereo")
        cam_number = config.pop("camera_number", 0)
        cc = self.cameras.get(cam_number)
        if cc is not None and cc.focal_x_baseline and "focal_x_baseline" not in config:
            config["focal_x_baseline"] = cc.focal_x_baseline
        # camera-registry mask settings flow into the tracker (configureMasks
        # parity: the reference builds masks from the camera configuration)
        if cc is not None and cc.mask_radius and "mask_radius" not in config:
            config["mask_radius"] = float(cc.mask_radius)
        if cc is not None and cc.mask_image and "mask_image" not in config:
            config["mask_image"] = cc.mask_image
        tracker = VSLAMTracker(self._camera_model(cam_number), config)
        self.trackers.append(tracker)
        return tracker

    def add_source(self, src: ImageSourceBase):
        self.sources.append(src)

    def add_processor(self, proc: ProcessorBase):
        self.processors.append(proc)

    def add_tracker(self, tracker: TrackerBase):
        self.trackers.append(tracker)

    # -- lifecycle ----------------------------------------------------------

    def start(self):
        if self._running:
            return
        for tracker in self.trackers:
            tracker.start(self.sensor_queue)
        for src in self.sources:
            src.start_sensor(self.sensor_queue)
            src.start(self.camera_queue)
        self._worker = ManagedThread(self._work, name="slam-worker")
        self._worker.start()
        self._notify_worker = ManagedThread(self._notify, name="notify")
        self._notify_worker.start()
        self._image_cb_worker = ManagedThread(self._image_cb, name="image-cb")
        self._image_cb_worker.start()
        if self._record_enabled:
            fname = time.strftime("slam_%Y-%m-%d_%H-%M-%S.pb")
            self.recorder.set_output_file(fname)
            self.recorder.start()
        self._running = True

    def stop(self):
        if not self._running:
            return
        for src in self.sources:
            src.stop()
        self._worker.stop()
        # flush deferred chunk results while the notify worker still runs,
        # so clients receive every frame's result before shutdown
        for tracker in self.trackers:
            self._push_results(tracker.flush())
        deadline = time.monotonic() + 2.0
        while not self.result_queue.empty() and time.monotonic() < deadline:
            time.sleep(0.01)
        self._notify_worker.stop()
        self._image_cb_worker.stop()
        for tracker in self.trackers:
            tracker.stop()
        if self._record_enabled:
            self.recorder.stop()
        self._running = False

    # -- external-buffer ingestion (embedding API) --------------------------

    def add_image_from_buffer(
        self,
        timestamp: float,
        buffer: np.ndarray,
        camera_number: int = 0,
        compressed: Optional[bytes] = None,
        ros_timestamp: Optional[int] = None,
        pixel_format: str = "gray",
        stereo_layout: str = "none",
        width: int = 0,
        height: int = 0,
    ):
        """Mono/HMD ingestion (addImageFromBuffer parity, SlamManager.cpp:1113-1297).

        pixel_format: "gray" (8UC1/8UC3/8UC4 arrays), "nv12" (flat Y + UV
        planes, e.g. Vive Pro), "yuyv" (packed YUV 4:2:2 / 'YUV16', e.g.
        Valve Index). For planar/packed formats pass the flat byte buffer
        plus width/height of the full (possibly stacked) frame.
        stereo_layout: "none" | "top_bottom" | "side_by_side" — HMD frames
        carrying both eyes are split and pushed as a stereo entry.
        compressed: JPEG bytes (OneImage_Compressed parity).
        """
        if compressed is not None:
            import cv2

            arr = np.frombuffer(compressed, np.uint8)
            img = cv2.imdecode(arr, cv2.IMREAD_GRAYSCALE)
            if img is None:
                return False
            buffer = img
            pixel_format = "gray"

        if pixel_format == "nv12":
            flat = np.frombuffer(np.ascontiguousarray(buffer), np.uint8)
            if width * height > flat.size:
                return False
            img = flat[: width * height].reshape(height, width).astype(np.float32)
        elif pixel_format in ("yuyv", "yuv16"):
            flat = np.frombuffer(np.ascontiguousarray(buffer), np.uint8)
            if width * height * 2 > flat.size:
                return False
            # packed Y0 U Y1 V: luma is every second byte starting at 0
            img = (
                flat[: width * height * 2]
                .reshape(height, width, 2)[:, :, 0]
                .astype(np.float32)
            )
        else:
            img = self._to_gray_f32(buffer)

        second = None
        if stereo_layout == "top_bottom":
            half = img.shape[0] // 2
            img, second = img[:half], img[half:]
        elif stereo_layout == "side_by_side":
            half = img.shape[1] // 2
            img, second = img[:, :half], img[:, half:]

        self.camera_queue.push(
            CameraQueueEntry(
                timestamp=timestamp, image=img, image_second=second,
                camera_number=camera_number, ros_timestamp=ros_timestamp,
            )
        )
        return True

    def add_stereo_image_from_buffer(
        self,
        timestamp: float,
        left: np.ndarray,
        right: np.ndarray,
        camera_number: int = 0,
        ros_timestamp: Optional[int] = None,
    ):
        self.camera_queue.push(
            CameraQueueEntry(
                timestamp=timestamp,
                image=self._to_gray_f32(left),
                image_second=self._to_gray_f32(right),
                camera_number=camera_number,
                ros_timestamp=ros_timestamp,
            )
        )
        return True

    @staticmethod
    def _to_gray_f32(buf: np.ndarray) -> np.ndarray:
        """8UC1 passthrough; 8UC3/8UC4 -> grayscale (pixel-format parity with
        addImageFromBuffer, SlamManager.cpp:1113-1297)."""
        buf = np.asarray(buf)
        if buf.ndim == 3 and buf.shape[2] in (3, 4):
            import cv2

            code = cv2.COLOR_BGR2GRAY if buf.shape[2] == 3 else cv2.COLOR_BGRA2GRAY
            buf = cv2.cvtColor(buf, code)
        return buf.astype(np.float32)

    def add_imu(self, timestamp: float, acc, gyro):
        self.sensor_queue.push(
            SensorQueueEntry(
                timestamp=timestamp, kind="imu",
                acc=np.asarray(acc, np.float64), gyro=np.asarray(gyro, np.float64),
            )
        )

    def add_global_state(self, timestamp: float, position, rotation, reference=False):
        self.sensor_queue.push(
            SensorQueueEntry(
                timestamp=timestamp, kind="global_state",
                state=(np.asarray(position), np.asarray(rotation)),
                reference=reference,
            )
        )

    def add_marker(self, marker_id: int, position, orientation_wxyz):
        """Register a known marker pose (reference addMarker parity). A
        marker measurement later yields the vehicle pose via
        utils.transformations.vehicle_pose_from_marker_measurement."""
        from .config import MarkerConfig

        self.markers[marker_id] = MarkerConfig(
            marker_id=marker_id,
            position=np.asarray(position, np.float64),
            orientation_wxyz=np.asarray(orientation_wxyz, np.float64),
        )

    def vehicle_pose_from_marker(self, marker_id: int, measured_pos,
                                 measured_q_wxyz):
        """Host-app helper: global vehicle pose from a marker measurement."""
        mk = self.markers.get(marker_id)
        if mk is None:
            return None
        from ..utils.transformations import vehicle_pose_from_marker_measurement

        return vehicle_pose_from_marker_measurement(
            mk.position, mk.orientation_wxyz, measured_pos, measured_q_wxyz
        )

    def add_laser_scan(self, timestamp: float, ranges, angle_min, angle_increment,
                       range_max):
        ex_R = ex_t = None
        if self.request_nav_transformation is not None:
            # host-app TF lookup: laser frame -> camera frame
            # (OpenVSLAMStereoTracker laser extrinsics parity)
            tf = self.request_nav_transformation(timestamp, "laser", "camera")
            if tf is not None:
                ex_t, ex_R = tf
        scan = LaserScan(
            timestamp=timestamp, ranges=np.asarray(ranges, np.float64),
            angle_min=angle_min, angle_increment=angle_increment, range_max=range_max,
            extrinsic_R=ex_R, extrinsic_t=ex_t,
        )
        for tracker in self.trackers:
            tracker.add_laser_scan(scan)

    # -- mapping API --------------------------------------------------------

    def mapping_get_map_raw(self):
        for tracker in self.trackers:
            occ = tracker.get_occupancy_map()
            if occ is not None:
                return occ
        return None

    def mapping_get_features(self, max_count: int = 0, boundary=None,
                             transform=None):
        for tracker in self.trackers:
            if hasattr(tracker, "get_features"):
                return tracker.get_features(
                    max_count, boundary=boundary, transform=transform
                )
        return []

    def mapping_get_features_count(self, boundary=None) -> int:
        for tracker in self.trackers:
            if hasattr(tracker, "get_features_count"):
                return tracker.get_features_count(boundary=boundary)
        return 0

    def mapping_export_csv(self, path: str):
        for tracker in self.trackers:
            if hasattr(tracker, "export_csv"):
                tracker.export_csv(path)
                return True
        return False

    # -- status -------------------------------------------------------------

    def get_status(self) -> SlamStatus:
        st = SlamStatus(fps=self._fps.fps, frames_processed=self._frames)
        for w in (self._worker, self._notify_worker, self._image_cb_worker):
            if w is not None and w.error is not None:
                st.error = repr(w.error)
                break
        for tracker in self.trackers:
            s = tracker.status()
            if s:
                st.localization = s.get("state", "Off")
                st.landmarks = s.get("landmarks", 0)
                st.keyframes = s.get("keyframes", 0)
                st.frame_time = s.get("frame_time", 0.0)
                break
        return st

    # -- workers ------------------------------------------------------------

    def _work(self, thread: ManagedThread):
        if self.replay is not None:
            self.replay.stream_more()
        entry = self.camera_queue.pop(timeout=0.1)
        if entry is None or not entry.valid:
            return
        self._fps.tick()
        self._frames += 1

        if self.on_image is not None:
            self.image_cb_queue.push(entry)

        # drain sensor values up to the frame timestamp
        sensor_values = []
        nav_odom = None
        while True:
            try:
                sv = self.sensor_queue.get_nowait()
            except Exception:
                break
            sensor_values.append(sv)
            if sv.kind == "global_state" and not sv.reference:
                nav_odom = sv.state
            if sv.timestamp > entry.timestamp:
                break

        # host-app nav request (ROS TF lookup parity, SlamManager.cpp:148-185)
        nav_map = None
        if self.request_nav_data is not None:
            nav = self.request_nav_data(entry.timestamp)
            if nav is not None:
                # host app may return odom only, or (odom, map) states
                if isinstance(nav, tuple) and len(nav) == 2 and not isinstance(
                    nav[0], np.ndarray
                ):
                    nav_odom, nav_map = nav
                else:
                    nav_odom = nav

        # attach per-frame nav context to the entry (the reference stores
        # state_odom/state_map on the CameraQueueEntry before recording and
        # tracking — SlamManager.cpp:148-187)
        if entry.state_odom is None and nav_odom is not None:
            entry.state_odom = nav_odom
        if entry.state_map is None and nav_map is not None:
            entry.state_map = nav_map
        if nav_map is None:
            nav_map = entry.state_map

        if self._record_enabled:
            self.recorder.store_camera_image(entry)
            for sv in sensor_values:
                if sv.kind == "imu":
                    self.recorder.store_imu(sv.timestamp, sv.acc, sv.gyro)
                elif sv.kind == "global_state" and sv.state is not None:
                    pos, R = sv.state
                    from ..geometry.so3 import rot_to_quat
                    import jax.numpy as _jnp

                    q = np.asarray(rot_to_quat(_jnp.asarray(R, _jnp.float32)))
                    self.recorder.store_global_state(
                        sv.timestamp, pos, q, reference=sv.reference
                    )

        # live view every 10th frame (SlamManager.cpp:118-131); disabled on
        # the first failure (headless container)
        if self.show_live and self._frames % 10 == 0:
            try:
                import cv2

                cv2.imshow("lpslam", np.clip(entry.image, 0, 255).astype(np.uint8))
                cv2.waitKey(1)
            except Exception:
                self.show_live = False

        # raw-frame dump every 10th frame (reference store-images debugging
        # path, SlamManager.cpp:73-84)
        if self.store_images_dir and self._frames % 10 == 0:
            import cv2
            import os

            os.makedirs(self.store_images_dir, exist_ok=True)
            cv2.imwrite(
                os.path.join(self.store_images_dir, f"frame_{self._frames:06d}.png"),
                np.clip(entry.image, 0, 255).astype(np.uint8),
            )

        for proc in self.processors:
            entry = proc.process_image(entry)

        sent = False
        deferred = False
        all_results = []
        for tracker in self.trackers:
            results = tracker.process_image(entry, nav_odom, nav_map, sensor_values)
            if results is None:
                # chunked tracker buffered the frame: its result arrives at
                # the chunk boundary — emitting an invalid entry now would
                # misreport a gap that doesn't exist
                deferred = True
                continue
            all_results.append(results)
        # result-path processor hook: every processor observes (and may
        # react to) this frame's sensor values and tracker results before
        # they are published (processSensorValuesAndResults parity,
        # SlamManager.cpp:207-227)
        flat_results = [r for rs in all_results for r in rs]
        for proc in self.processors:
            proc.process_results(sensor_values, flat_results)
        for results in all_results:
            if self._push_results(results):
                sent = True
        if not sent and not deferred:
            # invalid reconstruction so clients observe the gap
            # (SlamManager.cpp:230-236)
            self.result_queue.push(
                ResultQueueEntry(
                    timestamp=entry.timestamp,
                    position=np.zeros(3),
                    orientation_wxyz=np.asarray([1.0, 0, 0, 0]),
                    valid=False,
                )
            )

    def _push_results(self, results) -> bool:
        sent = False
        for res in results:
            rq = ResultQueueEntry(
                timestamp=res.timestamp,
                position=res.position,
                orientation_wxyz=res.orientation_wxyz,
                valid=res.valid,
                position_sigma=getattr(res, "position_sigma", None),
                orientation_sigma=getattr(res, "orientation_sigma", 0.0),
            )
            if self._record_enabled and res.valid:
                self.recorder.store_result(
                    res.timestamp, res.position, res.orientation_wxyz,
                    position_sigma=rq.position_sigma,
                    orientation_sigma=rq.orientation_sigma,
                )
            self.result_queue.push(rq)
            sent = True
        return sent

    def _notify(self, thread: ManagedThread):
        res = self.result_queue.pop(timeout=0.1)
        if res is None:
            return
        if self.on_reconstruction is not None:
            self.on_reconstruction(res)

    def _image_cb(self, thread: ManagedThread):
        entry = self.image_cb_queue.pop(timeout=0.1)
        if entry is None:
            return
        if self.on_image is not None:
            jpeg = _encode_jpeg(entry.image, quality=70)
            second = (
                _encode_jpeg(entry.image_second, quality=70)
                if entry.image_second is not None
                else None
            )
            self.on_image(entry.timestamp, jpeg, second)
