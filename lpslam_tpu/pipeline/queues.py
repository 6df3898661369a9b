"""Bounded queues + managed worker threads — the pipeline plumbing.

The reference moves all cross-thread data through tbb::concurrent_bounded_
queue typedefs with sentinel shutdown entries (/root/reference/src/DataTypes/
CameraQueue.h:63, SensorQueue.h:85, ResultQueue.h:24;
/root/reference/src/Utils/ManagedThread.h:18-94). Python equivalents: stdlib
queue.Queue (already thread-safe/bounded) + a ManagedThread with the same
stop/stopAsync semantics.
"""
from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np

_log = logging.getLogger("lpslam_tpu")


@dataclass
class CameraQueueEntry:
    """Mono or stereo frame + optional nav states (reference CameraQueue.h:13-61)."""

    timestamp: float
    image: np.ndarray
    image_second: Optional[np.ndarray] = None
    camera_number: int = 0
    state_odom: Optional[object] = None
    state_map: Optional[object] = None
    ros_timestamp: Optional[int] = None
    aux: Any = None      # depth map for RGB-D sources
    valid: bool = True   # False = shutdown sentinel


@dataclass
class SensorQueueEntry:
    """Tagged union: imu | global_state | feature_list (SensorQueue.h:14-83)."""

    timestamp: float
    kind: str                      # "imu" | "global_state" | "features"
    acc: Optional[np.ndarray] = None
    gyro: Optional[np.ndarray] = None
    state: Optional[object] = None
    reference: bool = False
    features: Optional[list] = None


@dataclass
class ResultQueueEntry:
    timestamp: float
    position: np.ndarray
    orientation_wxyz: np.ndarray
    valid: bool
    raw: Any = None
    # pose uncertainty (LpSlamPosition x/y/z_sigma + orientation sigma,
    # LpSlamTypes.h:6-9 / Space.h:33-163): lpslam-frame position std-devs
    # and scalar rotation std-dev [rad]
    position_sigma: np.ndarray = None
    orientation_sigma: float = 0.0

    def __post_init__(self):
        if self.position_sigma is None:
            self.position_sigma = np.zeros(3)


class PyBoundedQueue(queue.Queue):
    """Bounded queue with non-blocking push-drop-oldest semantics option."""

    def __init__(self, maxsize: int = 32):
        super().__init__(maxsize=maxsize)

    def push(self, item, drop_oldest: bool = True):
        try:
            self.put_nowait(item)
        except queue.Full:
            if drop_oldest:
                try:
                    self.get_nowait()
                except queue.Empty:
                    pass
                try:
                    self.put_nowait(item)
                except queue.Full:
                    pass
            else:
                self.put(item)

    def pop(self, timeout: Optional[float] = None):
        try:
            return self.get(timeout=timeout)
        except queue.Empty:
            return None


class NativeBoundedQueue:
    """Adapter over the C++ GIL-releasing queue (native/src/module.cpp) with
    the same surface as PyBoundedQueue — the TBB concurrent_bounded_queue
    role of the reference runs native here too."""

    def __init__(self, native_mod, maxsize: int = 32):
        self._q = native_mod.BoundedQueue(maxsize=maxsize)

    def push(self, item, drop_oldest: bool = True):
        if drop_oldest:
            self._q.push(item, timeout=0.0, drop_oldest=True)
        else:
            self._q.push(item)  # blocks until space

    def pop(self, timeout: Optional[float] = None):
        return self._q.pop(timeout=-1.0 if timeout is None else float(timeout))

    def get_nowait(self):
        item = self._q.pop(timeout=0.0)
        if item is None:
            raise queue.Empty
        return item

    def get(self, timeout: Optional[float] = None):
        item = self._q.pop(timeout=-1.0 if timeout is None else float(timeout))
        if item is None:
            raise queue.Empty
        return item

    def put_nowait(self, item):
        if not self._q.push(item, timeout=0.0):
            raise queue.Full
        return None

    def qsize(self) -> int:
        return self._q.qsize()

    def empty(self) -> bool:
        return self._q.qsize() == 0


def BoundedQueue(maxsize: int = 32):
    """Queue factory: the native GIL-releasing C++ queue when the toolchain
    is available, else the stdlib-backed equivalent (identical surface)."""
    from ..native import get_native

    mod = get_native()
    if mod is not None:
        return NativeBoundedQueue(mod, maxsize=maxsize)
    return PyBoundedQueue(maxsize=maxsize)


class ManagedThread:
    """Loop-thread wrapper: run `fn(ctx)` until stopped (ManagedThread.h parity)."""

    def __init__(self, fn: Callable[["ManagedThread"], None], name: str = "worker"):
        self._fn = fn
        self._name = name
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        # last exception raised by an iteration (surfaced via .error /
        # SlamManager.get_status) — the reference's worker lambda logs and
        # keeps the thread alive; an unhandled exception must never silently
        # kill the pipeline (it has no other failure signal).
        self.error: Optional[BaseException] = None
        self.error_count: int = 0

    @property
    def stopped(self) -> bool:
        return self._stop.is_set()

    def start(self):
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.is_set():
                try:
                    self._fn(self)
                except Exception as exc:  # noqa: BLE001 — worker must survive
                    self.error = exc
                    self.error_count += 1
                    if self.error_count <= 3:
                        _log.exception("worker '%s' iteration failed", self._name)
                    elif self.error_count % 100 == 0:
                        _log.error(
                            "worker '%s' still failing (%d errors): %r",
                            self._name, self.error_count, exc,
                        )
                    time.sleep(0.01)  # don't spin hot on a persistent failure

        self._thread = threading.Thread(target=loop, name=self._name, daemon=True)
        self._thread.start()

    def stop(self, join_timeout: float = 5.0) -> bool:
        """Signal the loop and join. Returns True when the worker actually
        exited within the timeout — callers owning resources the worker may
        still be touching (e.g. the record stream's FILE*) must not free
        them on a False return."""
        self._stop.set()
        if self._thread is not None:
            t = self._thread
            t.join(timeout=join_timeout)
            if t.is_alive():
                return False
            self._thread = None
        return True

    def stop_async(self):
        self._stop.set()


class FramerateCompute:
    """10-sample sliding framerate estimator (TimeMeasurement.h:105-141)."""

    def __init__(self, window: int = 10):
        self._times: list = []
        self._window = window

    def tick(self):
        now = time.monotonic()
        self._times.append(now)
        if len(self._times) > self._window:
            self._times.pop(0)

    @property
    def fps(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else 0.0
