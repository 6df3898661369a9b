"""Camera models: pinhole (perspective), radial-tangential and fisheye
(equidistant/Kannala-Brandt) distortion, and stereo rectification maps.

Parity targets in the reference:
- camera model registry with perspective | fisheye | omni | no_distortion
  (/root/reference/src/Manager/SlamManager.cpp:613-1003 config parsing,
  /root/reference/src/Utils/ImageProcessing.h:130-256 cached rectify maps).
- The reference notes that building the remap grids is ~95% of undistort cost
  (/root/reference/src/Utils/ImageProcessing.h:126-129) and caches them; we do
  the same — maps are precomputed once on host and applied per-frame by the
  ``kernels.remap`` gather kernel on device.

All functions are batched over leading dims and float32.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Intrinsics: fx, fy, cx, cy as a (...,4) array plus image size."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @classmethod
    def make(cls, fx, fy, cx, cy, dtype=jnp.float32):
        return cls(
            jnp.asarray(fx, dtype),
            jnp.asarray(fy, dtype),
            jnp.asarray(cx, dtype),
            jnp.asarray(cy, dtype),
        )

    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], axis=-1),
                jnp.stack([z, self.fy, self.cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )


def project_pinhole(cam: PinholeCamera, p_cam):
    """Camera-frame 3D points (...,3) -> pixels (...,2). No distortion.

    Callers mask points with z <= 0 themselves (functional, no branching).
    """
    z = p_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * p_cam[..., 0] / zs + cam.cx
    v = cam.fy * p_cam[..., 1] / zs + cam.cy
    return jnp.stack([u, v], axis=-1)


def unproject_pinhole(cam: PinholeCamera, uv, depth=None):
    """Pixels (...,2) -> unit-depth rays (...,3) (or scaled by depth)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    ray = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    if depth is not None:
        ray = ray * depth[..., None]
    return ray


def distort_radtan(xy, dist):
    """Apply radial-tangential (plumb-bob) distortion to normalized coords.

    dist = (k1, k2, p1, p2, k3) — OpenCV ordering, matching the reference's
    perspective camera distortion vector (SlamManager.cpp camera parsing).
    """
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points_radtan(xy_d, dist, iters: int = 8):
    """Invert radial-tangential distortion by fixed-point iteration.

    A fixed iteration count keeps the loop unrollable under jit.
    """
    xy = xy_d
    for _ in range(iters):
        d = distort_radtan(xy, dist) - xy
        xy = xy_d - d
    return xy


def distort_fisheye(xy, dist):
    """Equidistant (Kannala-Brandt) fisheye distortion, OpenCV fisheye model.

    dist = (k1, k2, k3, k4). Matches the reference's `fisheye` camera model
    (cv::fisheye in /root/reference/src/Utils/ImageProcessing.h:188-210).
    """
    k1, k2, k3, k4 = (dist[..., i] for i in range(4))
    x, y = xy[..., 0], xy[..., 1]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-18))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = theta_d / r
    return jnp.stack([x * scale, y * scale], axis=-1)


def undistort_points_fisheye(xy_d, dist, iters: int = 10):
    """Invert fisheye distortion: solve theta from theta_d by Newton, fixed iters."""
    k1, k2, k3, k4 = (dist[..., i] for i in range(4))
    x, y = xy_d[..., 0], xy_d[..., 1]
    theta_d = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-18))
    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - theta_d
        df = 1.0 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))
        theta = theta - f / jnp.where(jnp.abs(df) < 1e-9, 1e-9, df)
    scale = jnp.tan(theta) / theta_d
    return jnp.stack([x * scale, y * scale], axis=-1)


def project_omni(p, xi, dist4):
    """Mei unified omnidirectional model: camera-frame points (...,3) ->
    normalized distorted coordinates (...,2).

    The reference's `omni` camera model (distortion vector = [xi, k1, k2,
    p1, p2], /root/reference/src/Utils/ImageProcessing.h:209-240 — NOTE the
    reference left its omni rectification commented out pending a
    contrib-OpenCV build; this is a from-scratch implementation of the same
    cv::omnidir (Mei) model)."""
    n = jnp.linalg.norm(p, axis=-1, keepdims=True)
    s = p / jnp.maximum(n, 1e-12)
    denom = jnp.maximum(s[..., 2:3] + xi, 1e-6)
    m = s[..., :2] / denom
    k1, k2, p1, p2 = (dist4[..., i] for i in range(4))
    x, y = m[..., 0], m[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * k2)
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def omni_undistort_maps(
    K: np.ndarray,
    dist5: np.ndarray,
    image_size: tuple[int, int],
    R: np.ndarray | None = None,
    K_new: np.ndarray | None = None,
):
    """Remap grid that turns an omni (Mei-model) image into an ideal pinhole
    view: for each target pixel, cast the K_new/R ray and project it through
    the omni forward model to find the source sample position.

    dist5 = [xi, k1, k2, p1, p2] (reference layout). Returns (map (H,W,2)
    float32 source coordinates, K_new (3,3))."""
    H, W = image_size
    if K_new is None:
        # by the reference's convention the projection preserves more of the
        # field: shrink focal by ~1.7 (ImageProcessing.h:224-228 comment)
        K_new = np.array(
            [[W / 1.7, 0, W / 2.0], [0, H / 1.7, H / 2.0], [0, 0, 1.0]]
        )
    if R is None:
        R = np.eye(3)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    rays = np.stack(
        [
            (xs - K_new[0, 2]) / K_new[0, 0],
            (ys - K_new[1, 2]) / K_new[1, 1],
            np.ones_like(xs),
        ],
        axis=-1,
    )
    rays = rays @ R  # R^T applied to each ray (target view -> camera frame)
    xi = float(dist5[0])
    d4 = jnp.asarray(np.asarray(dist5[1:5], np.float64))
    md = np.asarray(project_omni(jnp.asarray(rays), xi, d4))
    u = K[0, 0] * md[..., 0] + K[0, 2]
    v = K[1, 1] * md[..., 1] + K[1, 2]
    return (
        np.stack([u, v], axis=-1).astype(np.float32),
        np.asarray(K_new, np.float32),
    )


# ---------------------------------------------------------------------------
# Stereo rectification (host-side precompute, numpy — runs once at startup,
# mirroring the reference's cached Undistort maps ImageProcessing.h:130-256).
# ---------------------------------------------------------------------------


def rectify_maps_stereo(
    K_l: np.ndarray,
    dist_l: np.ndarray,
    K_r: np.ndarray,
    dist_r: np.ndarray,
    R_rl: np.ndarray,
    t_rl: np.ndarray,
    image_size: tuple[int, int],
    model: str = "perspective",
):
    """Compute rectification remap grids for a stereo pair.

    Args:
      K_l, K_r: 3x3 intrinsics. dist_l/r: distortion vectors.
      R_rl, t_rl: rotation/translation of right camera w.r.t. left.
      image_size: (H, W).
      model: "perspective" (radtan) or "fisheye".

    Returns: dict with
      map_l, map_r: (H, W, 2) float32 sample coordinates (x, y) into the raw
        images — consumed by kernels.remap.remap_bilinear on device;
      K_new: rectified shared intrinsics (3x3);
      focal_x_baseline: fx * baseline of the rectified pair.

    Algorithm (standard Bouguet): split the inter-camera rotation between the
    eyes, rotate both so epipolar lines are horizontal, share mean intrinsics.
    """
    import cv2

    H, W = image_size
    if model == "fisheye":
        R1, R2, P1, P2, Q = cv2.fisheye.stereoRectify(
            K_l, dist_l.reshape(-1, 1), K_r, dist_r.reshape(-1, 1), (W, H),
            R_rl, t_rl.reshape(3, 1), flags=cv2.CALIB_ZERO_DISPARITY,
        )
        m_l = cv2.fisheye.initUndistortRectifyMap(
            K_l, dist_l.reshape(-1, 1), R1, P1, (W, H), cv2.CV_32FC2
        )
        m_r = cv2.fisheye.initUndistortRectifyMap(
            K_r, dist_r.reshape(-1, 1), R2, P2, (W, H), cv2.CV_32FC2
        )
    else:
        R1, R2, P1, P2, Q, _, _ = cv2.stereoRectify(
            K_l, dist_l, K_r, dist_r, (W, H), R_rl, t_rl.reshape(3, 1),
            flags=cv2.CALIB_ZERO_DISPARITY, alpha=0,
        )
        m_l = cv2.initUndistortRectifyMap(K_l, dist_l, R1, P1, (W, H), cv2.CV_32FC2)
        m_r = cv2.initUndistortRectifyMap(K_r, dist_r, R2, P2, (W, H), cv2.CV_32FC2)

    map_l = m_l[0] if isinstance(m_l, tuple) else m_l
    map_r = m_r[0] if isinstance(m_r, tuple) else m_r
    K_new = P1[:3, :3].astype(np.float32)
    # P2[0,3] = -fx * baseline for CALIB_ZERO_DISPARITY
    focal_x_baseline = float(-P2[0, 3])
    return {
        "map_l": np.asarray(map_l, np.float32),
        "map_r": np.asarray(map_r, np.float32),
        "K_new": K_new,
        "focal_x_baseline": focal_x_baseline,
    }
