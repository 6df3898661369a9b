"""ZedOpenCaptureSource behavior parity (reference
ZedOpenCaptureCameraSource.cpp + ZedSdkSource.cpp gain servo) with a faked
UVC capture — no camera hardware, same technique as the reference's tests
which build real objects without start() (SlamManagerTest.cpp)."""
import time

import numpy as np
import pytest

import cv2

from lpslam_tpu.pipeline.queues import BoundedQueue
from lpslam_tpu.pipeline.sources import ZedOpenCaptureSource


class FakeCap:
    """Emits packed-YUYV side-by-side frames like a ZED on V4L2."""

    def __init__(self, device):
        self.props = {}
        self.released = False
        # per-eye 32x24 -> full width 64, YUYV = 2 bytes/px
        h, w = 24, 64
        y = np.zeros((h, w), np.uint8)
        y[:, : w // 2] = 60   # left eye darker
        y[:, w // 2:] = 200   # right eye brighter
        u = np.full((h, w), 128, np.uint8)
        self.frame = np.dstack([y, u])  # (H, W, 2) YUYV-ish

    def isOpened(self):
        return True

    def set(self, prop, val):
        self.props[prop] = val
        return True

    def read(self):
        return True, self.frame

    def release(self):
        self.released = True


@pytest.fixture
def zed(monkeypatch):
    monkeypatch.setattr(cv2, "VideoCapture", FakeCap)
    return None


def _drain(q):
    out = []
    while True:
        e = q.pop(timeout=0.01)
        if e is None:
            break
        out.append(e)
    return out


class FakeThread:
    pass


def test_split_and_grayscale(zed):
    src = ZedOpenCaptureSource({"height": 376, "fps": 30})
    q = BoundedQueue(8)
    src.camera_queue = q
    import cv2 as _cv2

    src._cap = _cv2.VideoCapture(0)
    src._loop(FakeThread())
    entries = _drain(q)
    assert len(entries) == 1
    e = entries[0]
    assert e.image.shape == (24, 32)
    assert e.image_second.shape == (24, 32)
    # left eye dark, right eye bright (YUYV luma passes through)
    assert e.image.mean() < 100 < e.image_second.mean()


def test_mode_table_and_fps_validation(zed):
    with pytest.raises(RuntimeError):
        ZedOpenCaptureSource({"height": 999}).start(BoundedQueue(2))
    with pytest.raises(RuntimeError):
        ZedOpenCaptureSource({"fps": 45}).start(BoundedQueue(2))
    # fps_scaling allows arbitrary fps targets (software throttle)
    src = ZedOpenCaptureSource({"fps": 45, "fps_scaling": True, "height": 720})
    src.start(BoundedQueue(2))
    cap = src._cap
    assert cap.props[cv2.CAP_PROP_FRAME_WIDTH] == 2560
    assert cap.props[cv2.CAP_PROP_FRAME_HEIGHT] == 720
    src.stop()
    assert cap.released


def test_fps_scaling_throttles(zed):
    src = ZedOpenCaptureSource({"fps": 10, "fps_scaling": True})
    q = BoundedQueue(16)
    src.camera_queue = q
    import cv2 as _cv2

    src._cap = _cv2.VideoCapture(0)
    for _ in range(5):  # 5 immediate reads, only the first passes the gate
        src._loop(FakeThread())
    assert len(_drain(q)) == 1


def test_auto_gain_servo(zed):
    src = ZedOpenCaptureSource({"auto_gain": True})
    q = BoundedQueue(16)
    src.camera_queue = q
    import cv2 as _cv2

    src._cap = _cv2.VideoCapture(0)
    for _ in range(5):
        src._loop(FakeThread())
    gain = src._cap.props.get(cv2.CAP_PROP_GAIN)
    assert gain is not None
    # mean luma ~130 -> gain = 30 + (1 - 130/255)*60 ~ 59
    assert 50 <= gain <= 70


def test_registry_names():
    from lpslam_tpu.pipeline.manager import SOURCE_REGISTRY
    from lpslam_tpu.pipeline.sources import ZedSdkSource

    assert SOURCE_REGISTRY["Zed"] is ZedOpenCaptureSource
    assert SOURCE_REGISTRY["ZedSdk"] is ZedSdkSource
    assert SOURCE_REGISTRY["FileSource"] is SOURCE_REGISTRY["File"]


# --- ZedSdkSource (pyzed-gated SDK path, ZedSdkSource.cpp parity) ----------


class _FakeSl:
    """Minimal pyzed.sl stand-in: enough surface for open/grab/retrieve."""

    class ERROR_CODE:
        SUCCESS = 0
        FAILURE = 1

    class RESOLUTION:
        VGA, HD720, HD1080, HD2K = range(4)

    class DEPTH_MODE:
        NONE = 0

    class VIEW:
        LEFT_UNRECTIFIED_GRAY = 0
        RIGHT_UNRECTIFIED_GRAY = 1

    class VIDEO_SETTINGS:
        EXPOSURE = 0
        GAIN = 1

    class TIME_REFERENCE:
        IMAGE = 0

    class InitParameters:
        pass

    class Mat:
        def __init__(self):
            self._data = None

        def get_data(self):
            return self._data

    class _Ts:
        def get_nanoseconds(self):
            return 123456789

    class Camera:
        def __init__(self):
            self.settings = {}
            self.opened = False
            self.closed = False
            self.grabs = 0
            self.fail_first_grab = False

        def open(self, init):
            self.init = init
            self.opened = True
            return _FakeSl.ERROR_CODE.SUCCESS

        def set_camera_settings(self, key, val):
            self.settings[key] = val

        def grab(self):
            self.grabs += 1
            if self.fail_first_grab and self.grabs == 1:
                return _FakeSl.ERROR_CODE.FAILURE
            return _FakeSl.ERROR_CODE.SUCCESS

        def retrieve_image(self, mat, view):
            # left eye dark (drives the gain servo), right bright
            lum = 60 if view == _FakeSl.VIEW.LEFT_UNRECTIFIED_GRAY else 200
            mat._data = np.full((24, 32), lum, np.uint8)
            return _FakeSl.ERROR_CODE.SUCCESS

        def get_timestamp(self, ref):
            return _FakeSl._Ts()

        def close(self):
            self.closed = True


@pytest.fixture
def fake_pyzed(monkeypatch):
    import sys
    import types

    pkg = types.ModuleType("pyzed")
    pkg.sl = _FakeSl
    monkeypatch.setitem(sys.modules, "pyzed", pkg)
    monkeypatch.setitem(sys.modules, "pyzed.sl", _FakeSl)
    return _FakeSl


def test_sdk_source_gated_without_pyzed():
    from lpslam_tpu.pipeline.sources import ZedSdkSource

    import sys
    if "pyzed" in sys.modules:
        pytest.skip("real pyzed present")
    with pytest.raises(RuntimeError, match="ZedOpenCaptureSource"):
        ZedSdkSource()


def test_sdk_source_frames_gain_and_hw_timestamp(fake_pyzed):
    from lpslam_tpu.pipeline.sources import ZedSdkSource

    src = ZedSdkSource({"fps": 30, "exposure": 15, "gain": 50})
    q = BoundedQueue(16)
    src.camera_queue = q
    sl = fake_pyzed
    src._cam = sl.Camera()
    src._cam.open(sl.InitParameters())
    # reference sets manual exposure 15 / gain 50 on open
    # (ZedSdkSource.cpp:117-118) — here start() does it; emulate:
    src._cam.set_camera_settings(sl.VIDEO_SETTINGS.EXPOSURE, 15)
    src._cam.set_camera_settings(sl.VIDEO_SETTINGS.GAIN, 50)

    for _ in range(5):
        src._loop(FakeThread())
    entries = _drain(q)
    assert len(entries) == 5
    e = entries[0]
    assert e.image.shape == (24, 32) and e.image_second.shape == (24, 32)
    assert e.image.mean() < 100 < e.image_second.mean()
    # hardware IMAGE timestamp carried as ros_timestamp (ns)
    assert e.ros_timestamp == 123456789
    # 5th frame servoed the gain: mean 60 -> 30 + (1 - 60/255)*60 ~ 76
    gain = src._cam.settings[sl.VIDEO_SETTINGS.GAIN]
    assert 70 <= gain <= 80

    src.stop()
    assert src._cam is None


def test_sdk_source_survives_failed_grab(fake_pyzed):
    from lpslam_tpu.pipeline.sources import ZedSdkSource

    src = ZedSdkSource({})
    q = BoundedQueue(4)
    src.camera_queue = q
    src._cam = fake_pyzed.Camera()
    src._cam.fail_first_grab = True
    src._loop(FakeThread())   # failed grab: sleep-and-continue, no entry
    src._loop(FakeThread())   # next one succeeds
    assert len(_drain(q)) == 1
