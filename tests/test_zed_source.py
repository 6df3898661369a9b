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

    assert SOURCE_REGISTRY["Zed"] is ZedOpenCaptureSource
    assert SOURCE_REGISTRY["ZedSdk"] is ZedOpenCaptureSource
    assert SOURCE_REGISTRY["FileSource"] is SOURCE_REGISTRY["File"]
