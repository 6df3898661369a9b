"""Public facade mirroring the reference's LpSlamManager surface
(/root/reference/src/Interface/LpSlamManager.h:17-121): add sources/trackers/
processors by name, push images/sensor data, register callbacks, mapping API,
start/stop. Method names follow the reference (snake_cased) so a user of the
C++ API finds the same capabilities 1:1.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..pipeline.manager import SlamManager, SlamStatus
from ..pipeline.config import CameraConfig


LpSlamStatus = SlamStatus


class LpSlamManager:
    """Facade over the pipeline (pimpl-style forwarding like the reference's
    InterfaceImpl)."""

    def __init__(self):
        self._m = SlamManager()

    # configuration ---------------------------------------------------------

    def read_configuration_file(self, path: str) -> bool:
        try:
            self._m.read_configuration_file(path)
            return True
        except Exception:
            return False

    def set_camera_configuration(self, cam: CameraConfig) -> None:
        self._m.set_camera_configuration(cam)

    # stage registry --------------------------------------------------------

    def add_image_data_source(self, type_name: str, config: Optional[dict] = None) -> bool:
        try:
            self._m.add_source_by_name(type_name, config)
            return True
        except Exception:
            return False

    def add_image_processor(self, type_name: str, config: Optional[dict] = None) -> bool:
        try:
            self._m.add_processor_by_name(type_name, config)
            return True
        except Exception:
            return False

    def add_tracker(self, type_name: str, config: Optional[dict] = None) -> bool:
        try:
            self._m.add_tracker_by_name(type_name, config)
            return True
        except Exception:
            return False

    # lifecycle -------------------------------------------------------------

    def start(self) -> None:
        self._m.start()

    def stop(self) -> None:
        self._m.stop()

    # data ingestion --------------------------------------------------------

    def add_image_from_buffer(self, timestamp: float, buffer: np.ndarray,
                              camera_number: int = 0, **kw) -> bool:
        return self._m.add_image_from_buffer(timestamp, buffer, camera_number, **kw)

    def add_stereo_image_from_buffer(self, timestamp: float, left: np.ndarray,
                                     right: np.ndarray, camera_number: int = 0,
                                     **kw) -> bool:
        return self._m.add_stereo_image_from_buffer(
            timestamp, left, right, camera_number, **kw
        )

    def add_imu_data(self, timestamp: float, acc, gyro) -> None:
        self._m.add_imu(timestamp, acc, gyro)

    def add_global_state(self, timestamp: float, position, rotation,
                         reference: bool = False) -> None:
        self._m.add_global_state(timestamp, position, rotation, reference)

    # callbacks -------------------------------------------------------------

    def set_reconstruction_callback(self, cb: Callable) -> None:
        self._m.on_reconstruction = cb

    def set_image_callback(self, cb: Callable) -> None:
        self._m.on_image = cb

    def set_request_nav_data_callback(self, cb: Callable) -> None:
        self._m.request_nav_data = cb

    def set_request_nav_transformation_callback(self, cb: Callable) -> None:
        self._m.request_nav_transformation = cb

    def add_marker(self, marker_id: int, position, orientation_wxyz) -> None:
        self._m.add_marker(marker_id, position, orientation_wxyz)

    # mapping ---------------------------------------------------------------

    def mapping_add_laser_scan(self, timestamp: float, ranges, angle_min: float,
                               angle_increment: float, range_max: float) -> None:
        self._m.add_laser_scan(timestamp, ranges, angle_min, angle_increment, range_max)

    def mapping_get_map_raw(self):
        return self._m.mapping_get_map_raw()

    def mapping_get_features(self, max_count: int = 0):
        return self._m.mapping_get_features(max_count)

    def mapping_export_csv(self, path: str) -> bool:
        return self._m.mapping_export_csv(path)

    @staticmethod
    def compress_image(image, quality: int = 70) -> bytes:
        """JPEG-compress a frame (reference LpSlamManager::compressImage)."""
        from ..pipeline.record import _encode_jpeg

        return _encode_jpeg(np.asarray(image), quality)

    # status ----------------------------------------------------------------

    def get_slam_status(self) -> SlamStatus:
        return self._m.get_status()
