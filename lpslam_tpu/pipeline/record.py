"""Record / replay engines over the wire-compatible .pb stream.

Parity with the reference's RecordEngine (async thread serializing camera
frames as JPEG + sensor values + results,
/root/reference/src/Manager/RecordEngine.cpp:56-238) and ReplayEngine
(chunked streaming back onto the queues with half-empty refill backpressure,
/root/reference/src/Manager/ReplayEngine.cpp:57-244, chunk default 500).
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np

from .queues import BoundedQueue, CameraQueueEntry, SensorQueueEntry, ManagedThread
from ..io import lpslam_pb as pb


def _encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    import cv2

    ok, buf = cv2.imencode(
        ".jpg", np.clip(img, 0, 255).astype(np.uint8),
        [cv2.IMWRITE_JPEG_QUALITY, quality],
    )
    return buf.tobytes() if ok else b""


def _decode_image(data: bytes) -> Optional[np.ndarray]:
    import cv2

    arr = np.frombuffer(data, np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_GRAYSCALE)
    return None if img is None else img.astype(np.float32)


def _ts_to_int(ts: float) -> int:
    return int(ts * 1e9)


def _int_to_ts(t: int) -> float:
    return t / 1e9


class RecordEngine:
    """Async recorder: entries are queued and serialized on a worker thread."""

    def __init__(self, jpeg_quality: int = 90, record_images: bool = True):
        self._queue = BoundedQueue(maxsize=256)
        self._writer: Optional[pb.ProtoStreamWriter] = None
        self._worker: Optional[ManagedThread] = None
        self.jpeg_quality = jpeg_quality
        self.record_images = record_images

    def set_output_file(self, path: str):
        self._writer = pb.ProtoStreamWriter(path)

    def start(self):
        if self._writer is None:
            raise RuntimeError("set_output_file first")
        self._worker = ManagedThread(self._loop, name="record")
        self._worker.start()

    def stop(self):
        if self._worker is not None:
            # drain before stopping
            while not self._queue.empty():
                time.sleep(0.01)
            self._worker.stop()
            self._worker = None
        if self._writer is not None:
            self._writer.close()
            self._writer = None

    def _loop(self, thread: ManagedThread):
        item = self._queue.pop(timeout=0.1)
        if item is None:
            return
        msg_type, msg = item
        self._writer.write(msg_type, msg)

    # -- store API (called from the pipeline worker thread) -----------------

    def store_camera_image(self, entry: CameraQueueEntry):
        msg = pb.CameraImage(
            timestamp=_ts_to_int(entry.timestamp),
            camera_number=entry.camera_number,
        )
        if self.record_images:
            msg.image_data = _encode_jpeg(entry.image, self.jpeg_quality)
            if entry.image_second is not None:
                msg.image_data_second = _encode_jpeg(entry.image_second, self.jpeg_quality)
        self._queue.push((pb.MSG_CAMERA_IMAGE, msg))

    def store_imu(self, ts: float, acc: np.ndarray, gyro: np.ndarray):
        msg = pb.SensorImu(
            timestamp=_ts_to_int(ts),
            acc=pb.Vec3Sigma(x=float(acc[0]), y=float(acc[1]), z=float(acc[2])),
            gyro=pb.Vec3Sigma(x=float(gyro[0]), y=float(gyro[1]), z=float(gyro[2])),
        )
        self._queue.push((pb.MSG_SENSOR_IMU, msg))

    def store_global_state(self, ts: float, position, orientation_wxyz, reference=False):
        gs = pb.GlobalState(
            position=pb.Vec3Sigma(
                x=float(position[0]), y=float(position[1]), z=float(position[2])
            ),
            orientation=pb.Orientation(
                w=float(orientation_wxyz[0]), x=float(orientation_wxyz[1]),
                y=float(orientation_wxyz[2]), z=float(orientation_wxyz[3]),
            ),
        )
        msg = pb.SensorGlobalState(timestamp=_ts_to_int(ts), state=gs, reference=reference)
        self._queue.push((pb.MSG_SENSOR_GLOBAL_STATE, msg))

    def store_result(self, ts: float, position, orientation_wxyz):
        gs = pb.GlobalState(
            position=pb.Vec3Sigma(
                x=float(position[0]), y=float(position[1]), z=float(position[2])
            ),
            orientation=pb.Orientation(
                w=float(orientation_wxyz[0]), x=float(orientation_wxyz[1]),
                y=float(orientation_wxyz[2]), z=float(orientation_wxyz[3]),
            ),
        )
        msg = pb.GlobalStateInTime(timestamp=_ts_to_int(ts), state=gs)
        self._queue.push((pb.MSG_RESULT, msg))

    def store_features(self, ts: float, features: list):
        for f in features:
            p = f["position"]
            msg = pb.SensorFeature(
                timestamp=_ts_to_int(ts),
                position=pb.Vec3Sigma(x=float(p[0]), y=float(p[1]), z=float(p[2])),
                observation_count=int(f.get("observations", 0)),
            )
            self._queue.push((pb.MSG_SENSOR_FEATURE, msg))


class ReplayEngine:
    """Chunked replay of a recorded stream onto the queues.

    Backpressure identical to the reference: load `chunk` items, refill when
    the camera queue drops below chunk/2.
    """

    def __init__(self, path: str, chunk: int = 500):
        self._reader = pb.ProtoStreamReader(path)
        self.chunk = chunk
        self.done = False
        self._camera_queue: Optional[BoundedQueue] = None
        self._sensor_queue: Optional[BoundedQueue] = None

    def attach(self, camera_queue: BoundedQueue, sensor_queue: Optional[BoundedQueue]):
        self._camera_queue = camera_queue
        self._sensor_queue = sensor_queue

    def stream_more(self) -> int:
        """Refill if below half-chunk; returns number of items loaded."""
        if self.done or self._camera_queue is None:
            return 0
        if self._camera_queue.qsize() >= max(self.chunk // 2, 1):
            return 0
        loaded = 0
        while loaded < self.chunk:
            try:
                msg_type, msg = next(self._reader)
            except StopIteration:
                self.done = True
                break
            if msg_type == pb.MSG_CAMERA_IMAGE:
                img = _decode_image(msg.image_data)
                if img is None:
                    continue
                second = (
                    _decode_image(msg.image_data_second)
                    if msg.image_data_second
                    else None
                )
                self._camera_queue.push(
                    CameraQueueEntry(
                        timestamp=_int_to_ts(msg.timestamp),
                        image=img,
                        image_second=second,
                        camera_number=msg.camera_number,
                    ),
                    drop_oldest=False,
                )
                loaded += 1
            elif msg_type == pb.MSG_SENSOR_IMU and self._sensor_queue is not None:
                self._sensor_queue.push(
                    SensorQueueEntry(
                        timestamp=_int_to_ts(msg.timestamp),
                        kind="imu",
                        acc=np.asarray([msg.acc.x, msg.acc.y, msg.acc.z]),
                        gyro=np.asarray([msg.gyro.x, msg.gyro.y, msg.gyro.z]),
                    )
                )
            elif msg_type == pb.MSG_SENSOR_GLOBAL_STATE and self._sensor_queue is not None:
                self._sensor_queue.push(
                    SensorQueueEntry(
                        timestamp=_int_to_ts(msg.timestamp),
                        kind="global_state",
                        state=msg.state,
                        reference=msg.reference,
                    )
                )
            # MSG_RESULT / MSG_SENSOR_FEATURE are outputs; skipped on replay
        return loaded
