"""Stereo rectification / mono undistortion processor.

Reference parity: OpenVSLAMStereoTracker undistorts+rectifies both eyes per
frame with cached cv::remap maps (parallel std::async pair,
/root/reference/src/Trackers/OpenVSLAMStereoTracker.cpp:192-215; maps cached
because building them is ~95% of the cost,
/root/reference/src/Utils/ImageProcessing.h:126-129).

TPU-native: maps are precomputed once (host, geometry.camera.rectify_maps_*)
and live on device; per frame both eyes ride ONE batched bilinear-gather
kernel (kernels.remap) — the batch dim replaces the thread pair.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .config import ConfigOptions, CameraConfig, ConfigError
from .processors import ProcessorBase
from .queues import CameraQueueEntry


class RectifyProcessor(ProcessorBase):
    """Rectifies stereo pairs (or undistorts mono) using camera registry data."""

    schema = ConfigOptions().optional("camera_number", int, 0)

    def __init__(self, config: Optional[dict] = None, camera: Optional[CameraConfig] = None,
                 camera_right: Optional[CameraConfig] = None):
        super().__init__(config)
        self._maps = None
        self.K_new = None
        self.focal_x_baseline = 0.0
        if camera is not None:
            self.configure(camera, camera_right)

    def configure(self, cam: CameraConfig, cam_right: Optional[CameraConfig] = None):
        import jax.numpy as jnp

        from ..geometry.camera import rectify_maps_stereo

        if cam.model == "omni":
            # Mei unified model (reference's `omni`; its own rectify path is
            # stubbed out pending contrib OpenCV — ImageProcessing.h:209-240)
            from ..geometry.camera import omni_undistort_maps

            K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
            m_l, K_new = omni_undistort_maps(
                K, np.asarray(cam.distortion, np.float64),
                (cam.height, cam.width),
                R=cam.rotation if cam.rotation is not None else None,
            )
            m_r = None
            if cam_right is not None:
                K_r = np.array(
                    [[cam_right.fx, 0, cam_right.cx],
                     [0, cam_right.fy, cam_right.cy], [0, 0, 1]]
                )
                m_r, _ = omni_undistort_maps(
                    K_r, np.asarray(cam_right.distortion, np.float64),
                    (cam.height, cam.width),
                    R=cam_right.rotation if cam_right.rotation is not None else None,
                    K_new=K_new,
                )
            self._maps = (
                jnp.asarray(m_l),
                None if m_r is None else jnp.asarray(m_r),
            )
            self.K_new = K_new
            return

        if cam_right is None or cam.rotation is None:
            # mono undistort: identity R, same K
            import cv2

            K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
            size = (cam.width, cam.height)
            if cam.model == "fisheye":
                m = cv2.fisheye.initUndistortRectifyMap(
                    K, cam.distortion.reshape(-1, 1).astype(np.float64),
                    np.eye(3), K, size, cv2.CV_32FC2,
                )[0]
            else:
                m = cv2.initUndistortRectifyMap(
                    K, cam.distortion.astype(np.float64), np.eye(3), K, size,
                    cv2.CV_32FC2,
                )[0]
            self._maps = (jnp.asarray(m), None)
            self.K_new = K.astype(np.float32)
            return

        K_l = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
        K_r = np.array(
            [[cam_right.fx, 0, cam_right.cx], [0, cam_right.fy, cam_right.cy], [0, 0, 1]]
        )
        res = rectify_maps_stereo(
            K_l, cam.distortion.astype(np.float64),
            K_r, cam_right.distortion.astype(np.float64),
            cam.rotation, cam.translation,
            (cam.height, cam.width),
            model=cam.model if cam.model in ("perspective", "fisheye") else "perspective",
        )
        self._maps = (jnp.asarray(res["map_l"]), jnp.asarray(res["map_r"]))
        self.K_new = res["K_new"]
        self.focal_x_baseline = res["focal_x_baseline"]

    def process_image(self, entry: CameraQueueEntry) -> CameraQueueEntry:
        if self._maps is None:
            return entry
        import jax.numpy as jnp

        from ..kernels.remap import remap_bilinear

        map_l, map_r = self._maps
        if map_r is not None and entry.image_second is not None:
            both = jnp.stack(
                [jnp.asarray(entry.image), jnp.asarray(entry.image_second)]
            )
            # one batched gather for both eyes
            left = remap_bilinear(both[0], map_l)
            right = remap_bilinear(both[1], map_r)
            entry.image = np.asarray(left)
            entry.image_second = np.asarray(right)
        else:
            entry.image = np.asarray(remap_bilinear(jnp.asarray(entry.image), map_l))
        if entry.aux is not None and np.ndim(entry.aux) == 2:
            # RGB-D depth maps ride the same (mono) undistortion map so depth
            # stays registered with the undistorted image
            entry.aux = np.asarray(remap_bilinear(jnp.asarray(entry.aux), map_l))
        return entry
