"""Frame sources — producers that feed the camera queue.

Reference parity (SURVEY.md §2 Sources family):
- ImageSourceBase lifecycle: start(camera_queue) / startSensor(sensor_queue) /
  stop(), camera pose config (/root/reference/src/Sources/ImageSourceBase.h:10-60);
- FileImageSource: image files at ~10 fps with optional looping
  (/root/reference/src/Sources/FileImageSource.cpp:14-65);
- OpenCVCameraSource: cv::VideoCapture, retries, grayscale, side-by-side /
  top-bottom stereo split, fps throttle (OpenCVCameraSource.cpp:11-227);
- WebotsSource (simulation with ground truth + IMU) → SyntheticSource here;
- ReplaySource covers the replay path (see record.py for the engine itself).

Live USB capture (ZED driver) is hardware-dependent; the dataset/synthetic
sources carry the benchmark configs. An OpenCV device source is provided for
generic UVC cameras when hardware exists.
"""
from __future__ import annotations

import glob
import os
import time
import threading
from typing import Optional

import numpy as np

from .queues import BoundedQueue, CameraQueueEntry, SensorQueueEntry, ManagedThread
from .config import ConfigOptions


class ImageSourceBase:
    """Producer base: override `_produce` or the worker loop."""

    schema = ConfigOptions()

    def __init__(self, config: Optional[dict] = None):
        self.cfg = self.schema.parse(config)
        self._worker: Optional[ManagedThread] = None
        self.camera_queue: Optional[BoundedQueue] = None
        self.sensor_queue: Optional[BoundedQueue] = None

    def start(self, camera_queue: BoundedQueue):
        self.camera_queue = camera_queue
        self._worker = ManagedThread(self._loop, name=type(self).__name__)
        self._worker.start()

    def start_sensor(self, sensor_queue: BoundedQueue):
        self.sensor_queue = sensor_queue

    def stop(self):
        if self._worker is not None:
            self._worker.stop()
            self._worker = None

    def _loop(self, thread: ManagedThread):
        raise NotImplementedError


class FileImageSource(ImageSourceBase):
    """Reads mono or stereo image files from disk at a fixed rate."""

    schema = (
        ConfigOptions()
        .optional("directory", str, "")
        .optional("pattern", str, "*.png")
        .optional("fps", float, 10.0)
        .optional("loop", bool, False)
        .optional("stereo_right_directory", str, "")
    )

    def __init__(self, config: Optional[dict] = None):
        super().__init__(config)
        self._files: list = []
        self._right: list = []
        self._idx = 0
        if self.cfg["directory"]:
            self._files = sorted(
                glob.glob(os.path.join(self.cfg["directory"], self.cfg["pattern"]))
            )
        if self.cfg["stereo_right_directory"]:
            self._right = sorted(
                glob.glob(
                    os.path.join(self.cfg["stereo_right_directory"], self.cfg["pattern"])
                )
            )

    def add_image(self, path: str):
        self._files.append(path)

    def add_stereo_image(self, left: str, right: str):
        self._files.append(left)
        self._right.append(right)

    def _loop(self, thread: ManagedThread):
        import cv2

        if self._idx >= len(self._files):
            if self.cfg["loop"] and self._files:
                self._idx = 0
            else:
                time.sleep(0.02)
                return
        path = self._files[self._idx]
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        second = None
        if self._idx < len(self._right):
            second = cv2.imread(self._right[self._idx], cv2.IMREAD_GRAYSCALE)
            second = None if second is None else second.astype(np.float32)
        self._idx += 1
        if img is None:
            return
        self.camera_queue.push(
            CameraQueueEntry(
                timestamp=time.time(),
                image=img.astype(np.float32),
                image_second=second,
            )
        )
        time.sleep(1.0 / max(self.cfg["fps"], 1e-3))


class SyntheticSource(ImageSourceBase):
    """Simulation source with ground truth — the WebotsSource stand-in.

    Publishes camera frames to the camera queue and ground-truth GlobalState
    (+ optional noise) to the sensor queue, like the reference's Webots source
    (/root/reference/src/Sources/WebotsSource.cpp:81-376).
    """

    schema = (
        ConfigOptions()
        .optional("num_frames", int, 60)
        .optional("width", int, 320)
        .optional("height", int, 240)
        .optional("fps", float, 20.0)
        .optional("seed", int, 0)
        .optional("motion", str, "orbit")
        .optional("gt_noise_sigma", float, 0.0)
        .optional("stereo_baseline", float, 0.0)
        .optional("with_depth", bool, False)
        .optional("realtime", bool, False)
        # IMU publishing (WebotsSource publishes accel/gyro to the sensor
        # queue alongside frames)
        .optional("publish_imu", bool, False)
        # waypoint navigation: [(x, y), ...] targets driven by PID control
        # (WebotsSource.cpp:318-369 waypoint parity); overrides `motion`
        .optional("waypoints", list, None)
    )

    def __init__(self, config: Optional[dict] = None):
        super().__init__(config)
        from ..io.synthetic import make_sequence, waypoint_trajectory

        poses = None
        if self.cfg["waypoints"]:
            poses = waypoint_trajectory(
                self.cfg["waypoints"], self.cfg["num_frames"], fps=self.cfg["fps"]
            )
        self.seq = make_sequence(
            num_frames=self.cfg["num_frames"],
            h=self.cfg["height"],
            w=self.cfg["width"],
            seed=self.cfg["seed"],
            motion=self.cfg["motion"],
            stereo_baseline=self.cfg["stereo_baseline"],
            with_depth=self.cfg["with_depth"],
            poses=poses,
        )
        self._imu = None
        if self.cfg["publish_imu"]:
            from ..io.synthetic import imu_from_poses

            self._imu = imu_from_poses(self.seq.poses_wc, self.cfg["fps"])
        self._idx = 0
        self._rng = np.random.default_rng(self.cfg["seed"] + 99)

    @property
    def K(self):
        return self.seq.K

    def _loop(self, thread: ManagedThread):
        if self._idx >= len(self.seq.images):
            time.sleep(0.02)
            return
        t = self._idx
        self._idx += 1
        ts = t / max(self.cfg["fps"], 1e-3)
        entry = CameraQueueEntry(
            timestamp=ts,
            image=self.seq.images[t],
            image_second=None if self.seq.images_r is None else self.seq.images_r[t],
            aux=None if self.seq.depths is None else self.seq.depths[t],
        )
        if self.sensor_queue is not None:
            pose = self.seq.poses_wc[t]
            pos = np.asarray(pose.t, np.float64).copy()
            if self.cfg["gt_noise_sigma"] > 0:
                pos += self._rng.normal(0, self.cfg["gt_noise_sigma"], 3)
            self.sensor_queue.push(
                SensorQueueEntry(timestamp=ts, kind="global_state", state=(pos, pose.R))
            )
            if self._imu is not None:
                gyro, accel = self._imu
                self.sensor_queue.push(
                    SensorQueueEntry(
                        timestamp=ts, kind="imu", acc=accel[t], gyro=gyro[t]
                    )
                )
        self.camera_queue.push(entry)
        if self.cfg["realtime"]:
            time.sleep(1.0 / max(self.cfg["fps"], 1e-3))

    @property
    def done(self) -> bool:
        return self._idx >= len(self.seq.images)


class OpenCVCameraSource(ImageSourceBase):
    """Generic UVC camera via cv2.VideoCapture with retry-on-open and stereo
    split (reference OpenCVCameraSource parity). Requires camera hardware."""

    schema = (
        ConfigOptions()
        .optional("device", int, 0)
        .optional("width", int, 0)
        .optional("height", int, 0)
        .optional("fps", float, 0.0)
        .optional("stereo_split", str, "none")  # none | side_by_side | top_bottom
        .optional("open_retries", int, 5)
    )

    def __init__(self, config: Optional[dict] = None):
        super().__init__(config)
        self._cap = None

    def start(self, camera_queue: BoundedQueue):
        import cv2

        for attempt in range(self.cfg["open_retries"]):
            self._cap = cv2.VideoCapture(self.cfg["device"])
            if self._cap.isOpened():
                break
            time.sleep(0.5)
        if self._cap is None or not self._cap.isOpened():
            raise RuntimeError(f"cannot open camera device {self.cfg['device']}")
        if self.cfg["width"]:
            self._cap.set(cv2.CAP_PROP_FRAME_WIDTH, self.cfg["width"])
        if self.cfg["height"]:
            self._cap.set(cv2.CAP_PROP_FRAME_HEIGHT, self.cfg["height"])
        if self.cfg["fps"]:
            self._cap.set(cv2.CAP_PROP_FPS, self.cfg["fps"])
        super().start(camera_queue)

    def _loop(self, thread: ManagedThread):
        import cv2

        ok, frame = self._cap.read()
        if not ok:
            time.sleep(0.01)
            return
        if frame.ndim == 3:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        frame = frame.astype(np.float32)
        second = None
        split = self.cfg["stereo_split"]
        if split == "side_by_side":
            half = frame.shape[1] // 2
            frame, second = frame[:, :half], frame[:, half:]
        elif split == "top_bottom":
            half = frame.shape[0] // 2
            frame, second = frame[:half], frame[half:]
        self.camera_queue.push(
            CameraQueueEntry(timestamp=time.time(), image=frame, image_second=second)
        )

    def stop(self):
        super().stop()
        if self._cap is not None:
            self._cap.release()
            self._cap = None


class ZedOpenCaptureSource(ImageSourceBase):
    """ZED-family stereo USB camera (ZED / ZED mini / ZED 2).

    The ZED presents as a standard UVC device emitting one double-width
    YUYV side-by-side stereo frame, which is exactly what the reference's
    vendored libusb driver reads (/root/reference/external/zed-open-capture,
    used by src/Sources/ZedOpenCaptureCameraSource.cpp). Here the capture
    rides cv2.VideoCapture/V4L2 on the same UVC endpoint — capture is
    host-side I/O, not TPU work (SURVEY.md §2.2) — and reproduces the
    reference source's behavior:

    - mode table keyed by per-eye height (ZedOpenCaptureCameraSource.cpp:
      133-162): 376 = VGA, 720 = HD720, 1080 = HD1080, 1242 = HD2K; fps in
      {15, 30, 60, 100} set at driver level, or 0 = leave the default
    - fps_scaling: open at the camera's native rate and software-throttle
      to `fps` by frame timestamp (reference worker :27-35)
    - YUYV -> grayscale (or BGR) before anything else (:42-50)
    - side-by-side eye split with the ZED's 12 cm baseline stamped on the
      per-eye coordinate bases (:76-84)
    - exposure > 0 sets manual exposure on both sensors, else auto (:190-196)
    - auto_gain: the ZedSdkSource's intensity-servo law, gain =
      30 + (1 - mean/255) * 60 every 5th frame (ZedSdkSource.cpp:56-64)
    """

    # per-eye (width, height) -> full side-by-side capture width
    MODES = {376: (672, 1344), 720: (1280, 2560), 1080: (1920, 3840),
             1242: (2208, 4416)}
    VALID_FPS = (0, 15, 30, 60, 100)

    schema = (
        ConfigOptions()
        .optional("camera_number", int, -1)   # -1 = first available
        .optional("grayscale", bool, True)
        .optional("width", int, 0)
        .optional("height", int, 0)
        .optional("fps", int, 0)
        .optional("exposure", int, 0)
        .optional("fps_scaling", bool, False)
        .optional("auto_gain", bool, False)
        .optional("open_retries", int, 5)
        .optional("baseline", float, 0.12)
        # read the camera MCU's 400 Hz HID sensor stream (IMU/mag/baro) and
        # publish IMU samples on the sensor queue — the vendored driver's
        # SensorCapture module (zed-open-capture/src/sensorcapture.cpp);
        # needs a ZED 2-class camera and hidraw access
        .optional("sensors", bool, False)
        .optional("sensors_hid_path", str, "")   # override /dev/hidrawN
    )

    def __init__(self, config: Optional[dict] = None):
        super().__init__(config)
        self._cap = None
        self._last_ts = 0.0
        self._frame_number = 0
        self._sensors = None

    def start(self, camera_queue: BoundedQueue):
        import cv2

        h = self.cfg["height"]
        if h and h not in self.MODES:
            raise RuntimeError(f"resolution height {h} not supported by ZED camera")
        fps = self.cfg["fps"]
        if not self.cfg["fps_scaling"] and fps not in self.VALID_FPS:
            raise RuntimeError(f"FPS {fps} not supported by ZED camera")

        dev = max(self.cfg["camera_number"], 0)
        for _ in range(self.cfg["open_retries"]):
            self._cap = cv2.VideoCapture(dev)
            if self._cap.isOpened():
                break
            time.sleep(0.5)
        if self._cap is None or not self._cap.isOpened():
            raise RuntimeError(f"cannot open ZED camera {dev}")
        # raw YUYV off the UVC endpoint; disable cv2's own conversion
        self._cap.set(cv2.CAP_PROP_FOURCC, cv2.VideoWriter_fourcc(*"YUYV"))
        self._cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        if h:
            self._cap.set(cv2.CAP_PROP_FRAME_WIDTH, self.MODES[h][1])
            self._cap.set(cv2.CAP_PROP_FRAME_HEIGHT, h)
        if fps and not self.cfg["fps_scaling"]:
            self._cap.set(cv2.CAP_PROP_FPS, fps)
        if self.cfg["exposure"] > 0:
            self._cap.set(cv2.CAP_PROP_AUTO_EXPOSURE, 1)  # manual (V4L2)
            self._cap.set(cv2.CAP_PROP_EXPOSURE, self.cfg["exposure"])
        super().start(camera_queue)

    def _loop(self, thread: ManagedThread):
        import cv2

        ok, raw = self._cap.read()
        if not ok or raw is None:
            # invalid frame: sleep-and-continue, matching the reference
            # worker (ZedOpenCaptureCameraSource.cpp:18-23)
            time.sleep(0.05)
            return
        now = time.time()
        if self.cfg["fps_scaling"] and self.cfg["fps"] > 0:
            if now - self._last_ts < 1.0 / self.cfg["fps"]:
                return  # no new frame wanted yet
            self._last_ts = now
        self._frame_number += 1

        if raw.ndim == 2 and raw.shape[1] % 2 == 0 and raw.dtype == np.uint8:
            # packed YUYV: reinterpret as (H, W, 2)
            raw = raw.reshape(raw.shape[0], raw.shape[1] // 2, 2)
        if raw.ndim == 3 and raw.shape[2] == 2:
            code = cv2.COLOR_YUV2GRAY_YUYV if self.cfg["grayscale"] \
                else cv2.COLOR_YUV2BGR_YUYV
            frame = cv2.cvtColor(raw, code)
        elif raw.ndim == 3:
            frame = cv2.cvtColor(raw, cv2.COLOR_BGR2GRAY) if self.cfg["grayscale"] else raw
        else:
            frame = raw

        if self.cfg["auto_gain"] and self._frame_number % 5 == 0:
            mean = float(frame.mean())
            gain = 30.0 + (1.0 - mean / 255.0) * 60.0
            self._cap.set(cv2.CAP_PROP_GAIN, round(gain))

        gray = frame.astype(np.float32)
        half = gray.shape[1] // 2
        left, right = gray[:, :half], gray[:, half:]
        self.camera_queue.push(
            CameraQueueEntry(timestamp=now, image=left, image_second=right)
        )

    def start_sensor(self, sensor_queue: BoundedQueue):
        super().start_sensor(sensor_queue)
        if self.cfg["sensors"]:
            from .zed_hid import ZedSensorCapture

            self._sensors = ZedSensorCapture(
                path=self.cfg["sensors_hid_path"] or None
            )
            self._sensors.attach(sensor_queue)
            self._sensors.start()

    def stop(self):
        super().stop()
        if self._sensors is not None:
            self._sensors.stop()
            self._sensors = None
        if self._cap is not None:
            self._cap.release()
            self._cap = None


class ZedSdkSource(ImageSourceBase):
    """ZED stereo camera via the StereoLabs SDK (`pyzed.sl`), when installed.

    The reference's ZedSdkSource (/root/reference/src/Sources/ZedSdkSource.cpp)
    is the proprietary-SDK capture path next to the UVC one; this class
    reproduces its observable behavior on the SDK's Python bindings:

    - open HD720 @ 15 fps by default, depth disabled, non-verbose
      (ZedSdkSource.cpp:100-110); initial manual EXPOSURE 15 / GAIN 50
      (:117-118)
    - grab() then retrieve LEFT/RIGHT **unrectified gray** views; any
      failure sleeps 50 ms and keeps the worker alive (:12-31)
    - every 5th frame, servo the gain from the left-eye mean intensity:
      gain = 30 + (1 - mean/255) * 60 (:56-64)
    - the camera's own IMAGE-time hardware timestamp (nanoseconds) is
      attached as the ROS timestamp on each entry (:86-91)
    - the 12 cm eye baseline (:66-73) is NOT stamped on the queue entry;
      stereo geometry must be supplied via the camera configuration's
      focal_x_baseline (as examples/zed_live_record.json does), which the
      tracker registry reads when building the stereo engine

    The SDK needs CUDA-class hardware; in this TPU framework the class is
    import-gated — constructing it without `pyzed` raises with a pointer at
    the UVC path (ZedOpenCaptureSource), which needs no SDK. Tests inject a
    fake `pyzed.sl` module (no camera hardware, same technique as the
    reference's tests which build real objects without start()).
    """

    schema = (
        ConfigOptions()
        .optional("fps", int, 15)
        .optional("resolution", str, "HD720")  # VGA|HD720|HD1080|HD2K
        .optional("exposure", int, 15)
        .optional("gain", int, 50)
        .optional("auto_gain", bool, True)
        .optional("verbose", bool, False)
    )

    def __init__(self, config: Optional[dict] = None):
        super().__init__(config)
        try:
            from pyzed import sl  # type: ignore
        except ImportError as e:
            raise RuntimeError(
                "ZedSdkSource needs the StereoLabs SDK python bindings "
                "(pyzed); without the SDK use the 'Zed' datasource "
                "(ZedOpenCaptureSource), which reads the same camera over "
                "plain UVC/V4L2"
            ) from e
        self._sl = sl
        self._cam = None
        self._frame_number = 0

    VALID_RESOLUTIONS = ("VGA", "HD720", "HD1080", "HD2K")

    def start(self, camera_queue: BoundedQueue):
        sl = self._sl
        res_name = self.cfg["resolution"].upper()
        if res_name not in self.VALID_RESOLUTIONS:
            raise RuntimeError(
                f"unknown ZED resolution '{self.cfg['resolution']}'; "
                f"valid: {'|'.join(self.VALID_RESOLUTIONS)}"
            )
        resolution = getattr(sl.RESOLUTION, res_name)
        self._cam = sl.Camera()
        init = sl.InitParameters()
        init.camera_resolution = resolution
        init.depth_mode = sl.DEPTH_MODE.NONE
        init.sdk_verbose = self.cfg["verbose"]
        init.camera_fps = self.cfg["fps"]
        status = self._cam.open(init)
        if status != sl.ERROR_CODE.SUCCESS:
            self._cam = None
            raise RuntimeError(f"cannot open ZED camera via SDK: {status}")
        self._cam.set_camera_settings(
            sl.VIDEO_SETTINGS.EXPOSURE, self.cfg["exposure"]
        )
        self._cam.set_camera_settings(sl.VIDEO_SETTINGS.GAIN, self.cfg["gain"])
        super().start(camera_queue)

    def _loop(self, thread: ManagedThread):
        sl = self._sl
        if self._cam.grab() != sl.ERROR_CODE.SUCCESS:
            time.sleep(0.05)  # maybe just one failed frame; keep receiving
            return
        left, right = sl.Mat(), sl.Mat()
        if (
            self._cam.retrieve_image(left, sl.VIEW.LEFT_UNRECTIFIED_GRAY)
            != sl.ERROR_CODE.SUCCESS
            or self._cam.retrieve_image(right, sl.VIEW.RIGHT_UNRECTIFIED_GRAY)
            != sl.ERROR_CODE.SUCCESS
        ):
            time.sleep(0.05)
            return
        img_l = np.asarray(left.get_data(), np.float32)
        img_r = np.asarray(right.get_data(), np.float32)
        self._frame_number += 1

        if self.cfg["auto_gain"] and self._frame_number % 5 == 0:
            vf = float(img_l.mean()) / 255.0
            gain = 30.0 + (1.0 - vf) * 60.0
            self._cam.set_camera_settings(sl.VIDEO_SETTINGS.GAIN, round(gain))

        ts_ns = int(
            self._cam.get_timestamp(sl.TIME_REFERENCE.IMAGE).get_nanoseconds()
        )
        self.camera_queue.push(
            CameraQueueEntry(
                timestamp=time.time(),
                image=img_l,
                image_second=img_r,
                ros_timestamp=ts_ns,
            )
        )

    def stop(self):
        super().stop()
        if self._cam is not None:
            self._cam.close()
            self._cam = None


class ReplaySource(ImageSourceBase):
    """Wrapper source that streams a recorded .pb file (see record.ReplayEngine)."""

    schema = ConfigOptions().required("file", str).optional("fps", float, 0.0)

    def __init__(self, config: Optional[dict] = None):
        super().__init__(config)
        from .record import ReplayEngine

        self._engine = ReplayEngine(self.cfg["file"])

    def start(self, camera_queue: BoundedQueue):
        self.camera_queue = camera_queue
        self._engine.attach(camera_queue, self.sensor_queue)
        self._worker = ManagedThread(self._loop, name="ReplaySource")
        self._worker.start()

    def _loop(self, thread: ManagedThread):
        n = self._engine.stream_more()
        if n == 0:
            time.sleep(0.02)
        if self.cfg["fps"] > 0:
            time.sleep(1.0 / self.cfg["fps"])

    @property
    def done(self) -> bool:
        return self._engine.done
