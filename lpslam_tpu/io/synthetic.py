"""Synthetic imagery with exact ground truth.

Replaces the reference's Webots simulation source
(/root/reference/src/Sources/WebotsSource.cpp — camera frames + ground-truth
GlobalState for testing) with a dataset-free generator: a corner-rich planar
texture observed by a moving pinhole camera. Because the scene is planar, the
image for any camera pose is an exact homography warp of the texture — giving
pixel-perfect ground truth for detector/matcher/tracker tests and benchmarks
without any dataset download.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..geometry.se3 import SE3, se3_exp, se3_inverse, se3_compose


def make_texture(h: int = 480, w: int = 640, seed: int = 0, n_shapes: int = 400):
    """Corner-rich random texture: overlapping axis-aligned rectangles of
    random intensity on a mid-gray background, lightly smoothed. Returns
    float32 (h, w) in [0, 255].
    """
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 128.0, np.float32)
    max_rw = min(64, max(w // 2, 9))
    max_rh = min(64, max(h // 2, 9))
    for _ in range(n_shapes):
        rw = rng.integers(8, max_rw)
        rh = rng.integers(8, max_rh)
        x0 = rng.integers(0, w - rw)
        y0 = rng.integers(0, h - rh)
        val = rng.uniform(20, 235)
        img[y0 : y0 + rh, x0 : x0 + rw] = val
    # light blur to avoid aliasing while keeping corners sharp
    k = np.array([0.25, 0.5, 0.25], np.float32)
    img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, mode="same"), 0, img)
    return img.astype(np.float32)


def warp_homography(img: np.ndarray, H: np.ndarray, out_shape=None):
    """Warp img by homography H (maps src pixel -> dst pixel). Pure numpy
    bilinear inverse warp (host-side test utility)."""
    if out_shape is None:
        out_shape = img.shape
    oh, ow = out_shape
    Hinv = np.linalg.inv(H)
    ys, xs = np.mgrid[0:oh, 0:ow].astype(np.float64)
    ones = np.ones_like(xs)
    pts = np.stack([xs, ys, ones], axis=0).reshape(3, -1)
    src = Hinv @ pts
    sx = (src[0] / src[2]).reshape(oh, ow)
    sy = (src[1] / src[2]).reshape(oh, ow)
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, img.shape[1] - 2)
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, img.shape[0] - 2)
    fx = np.clip(sx - x0, 0, 1)
    fy = np.clip(sy - y0, 0, 1)
    v = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )
    oob = (sx < 0) | (sx > img.shape[1] - 1) | (sy < 0) | (sy > img.shape[0] - 1)
    v = np.where(oob, 128.0, v)
    return v.astype(np.float32)


def imu_from_poses(poses, fps: float, gravity=(0.0, 9.81, 0.0)):
    """Synthesize body-frame IMU samples from a ground-truth pose sequence
    (WebotsSource publishes IMU accel/gyro alongside frames —
    /root/reference/src/Sources/WebotsSource.cpp:81-376). Returns
    (gyro (T,3), accel (T,3)) in the camera/body frame; gravity defaults to
    +y (optical y points down)."""
    from ..geometry.so3 import so3_log

    import jax.numpy as jnp

    T = len(poses)
    dt = 1.0 / max(fps, 1e-9)
    g = np.asarray(gravity, np.float64)
    gyro = np.zeros((T, 3))
    accel = np.zeros((T, 3))
    pos = np.asarray([np.asarray(p.t, np.float64) for p in poses])
    for t in range(T):
        t0, t1 = max(t - 1, 0), min(t + 1, T - 1)
        if t1 > t:
            R0 = np.asarray(poses[t].R, np.float64)
            R1 = np.asarray(poses[t1].R, np.float64)
            w = np.asarray(so3_log(jnp.asarray(R0.T @ R1, jnp.float32)))
            gyro[t] = w / dt
        # world-frame linear acceleration (central difference) + gravity,
        # rotated into the body frame
        if 0 < t < T - 1:
            a_w = (pos[t + 1] - 2 * pos[t] + pos[t - 1]) / (dt * dt)
        else:
            a_w = np.zeros(3)
        accel[t] = np.asarray(poses[t].R, np.float64).T @ (a_w + g)
    return gyro, accel


class SyntheticSequence(NamedTuple):
    """A planar-scene camera sequence with exact ground truth."""

    images: np.ndarray        # (T, H, W) float32
    poses_wc: list            # list of SE3 (camera-to-world), numpy-backed
    K: np.ndarray             # (3, 3) intrinsics
    plane_z: float            # scene plane depth in world frame
    images_r: np.ndarray = None   # (T, H, W) right-eye images (stereo mode)
    depths: np.ndarray = None     # (T, H, W) metric depth maps (RGB-D mode)
    baseline: float = 0.0


def waypoint_trajectory(
    waypoints,
    num_frames: int,
    fps: float = 20.0,
    speed: float = 0.5,
    kp: float = 2.0,
    ki: float = 0.05,
    kd: float = 0.1,
    tolerance: float = 0.08,
    yaw_gain: float = 0.15,
):
    """PID waypoint navigation (reference WebotsSource waypoint control
    parity, /root/reference/src/Sources/WebotsSource.cpp:318-369): a planar
    vehicle is steered through `waypoints` [(x, y), ...] by two PID loops on
    the position error; heading wiggles proportionally to lateral velocity
    like a steering vehicle. Returns a list of SE3 camera-to-world poses
    (camera keeps facing the scene plane, +z)."""
    from ..utils.pid import PidController

    wps = [np.asarray(wp, np.float64) for wp in waypoints]
    dt = 1.0 / max(fps, 1e-6)
    pid_x = PidController(kp, ki, kd, -speed, speed)
    pid_y = PidController(kp, ki, kd, -speed, speed)
    pos = np.array([0.0, 0.0])
    wp_i = 0
    poses = []
    for _ in range(num_frames):
        target = wps[min(wp_i, len(wps) - 1)]
        err = target - pos
        if np.linalg.norm(err) < tolerance and wp_i < len(wps) - 1:
            wp_i += 1
            pid_x.reset()
            pid_y.reset()
        vx = pid_x.update(err[0], dt)
        vy = pid_y.update(err[1], dt)
        pos = pos + np.array([vx, vy]) * dt
        yaw = yaw_gain * vx / max(speed, 1e-6)
        c, s = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses.append(SE3(R_wc.astype(np.float32),
                         np.array([pos[0], pos[1], 0.0], np.float32)))
    return poses


def make_sequence(
    num_frames: int = 30,
    h: int = 480,
    w: int = 640,
    seed: int = 0,
    motion: str = "orbit",
    fx: float = 460.0,
    plane_z: float = 5.0,
    tex_scale: int = 4,
    stereo_baseline: float = 0.0,
    with_depth: bool = False,
    poses: list = None,
):
    """Render a sequence of a textured plane z=plane_z (world units) from a
    camera that starts at the origin looking down +z.

    The texture spans the plane region seen with margin; each frame is the
    exact homography image of the texture for the ground-truth pose.
    Returns SyntheticSequence.
    """
    rng = np.random.default_rng(seed + 1)
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]], np.float32)

    # texture covers the plane patch visible from the start pose, scaled up
    tex_h, tex_w = h * tex_scale, w * tex_scale
    tex = make_texture(tex_h, tex_w, seed=seed, n_shapes=600 * tex_scale)
    # world->texture-pixel mapping: the plane point (X, Y, plane_z) maps to
    # texture pixel (X * s + tex_w/2, Y * s + tex_h/2)
    span_x = plane_z * w / fx * 2.2  # world width covered by the texture
    s = tex_w / span_x

    import jax.numpy as jnp

    given_poses = poses
    poses = []
    images = np.zeros((num_frames, h, w), np.float32)
    images_r = np.zeros((num_frames, h, w), np.float32) if stereo_baseline else None
    depths = np.zeros((num_frames, h, w), np.float32) if with_depth else None
    T_tex2world = None
    for t in range(num_frames):
        tt = t / max(num_frames - 1, 1)
        if given_poses is not None:
            T_wc = given_poses[min(t, len(given_poses) - 1)]
        elif motion == "orbit":
            xi = np.array(
                [0.6 * np.sin(2 * np.pi * tt), 0.3 * (1 - np.cos(2 * np.pi * tt)),
                 0.35 * np.sin(np.pi * tt),
                 0.04 * np.sin(2 * np.pi * tt), 0.06 * np.sin(2 * np.pi * tt), 0.03 * tt],
                np.float32,
            )
            T_wc = se3_exp(jnp.asarray(xi))  # camera-to-world
        elif motion == "forward":
            xi = np.array([0.05 * t, 0.0, 0.08 * t, 0.0, 0.0, 0.0], np.float32)
            T_wc = se3_exp(jnp.asarray(xi))
        else:  # translate
            xi = np.array([0.08 * t, 0.02 * t, 0.0, 0.0, 0.0, 0.0], np.float32)
            T_wc = se3_exp(jnp.asarray(xi))
        poses.append(SE3(np.asarray(T_wc.R), np.asarray(T_wc.t)))

        # homography texture->image for this pose:
        # world plane point P(u_t) = [ (u_t - c)/s , plane on z=plane_z ]
        # p_cam = R_cw (P - t_wc);  uv = K p_cam
        # texture pixel -> world X,Y:  X = (tx - tex_w/2)/s
        T_tex2world = np.array(
            [[1 / s, 0, -tex_w / (2 * s)], [0, 1 / s, -tex_h / (2 * s)], [0, 0, 1]]
        )

        def render(R_wc, t_wc_vec):
            R_cw = R_wc.T
            A = np.zeros((3, 3))
            A[:, 0] = R_cw[:, 0]
            A[:, 1] = R_cw[:, 1]
            A[:, 2] = R_cw @ (np.array([0, 0, plane_z]) - t_wc_vec)
            H_tex2img = (K @ A) @ T_tex2world
            return warp_homography(tex, H_tex2img, out_shape=(h, w))

        R_wc = np.asarray(T_wc.R)
        t_wc = np.asarray(T_wc.t)
        images[t] = render(R_wc, t_wc)
        if stereo_baseline:
            # right camera: shifted along the left camera's +x axis
            images_r[t] = render(R_wc, t_wc + R_wc @ np.array([stereo_baseline, 0, 0]))
        if with_depth:
            # exact per-pixel depth of the plane: p_cam = s_ray * [x, y, 1],
            # depth = s_ray solves (R_wc ray)_z * s = plane_z - t_z
            ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
            rays = np.stack(
                [(xs - K[0, 2]) / K[0, 0], (ys - K[1, 2]) / K[1, 1], np.ones_like(xs)],
                axis=-1,
            )
            d_w = rays @ R_wc.T  # world direction per pixel
            s_ray = (plane_z - t_wc[2]) / np.maximum(d_w[..., 2], 1e-9)
            depths[t] = s_ray.astype(np.float32)

    return SyntheticSequence(
        images=images, poses_wc=poses, K=K, plane_z=plane_z,
        images_r=images_r, depths=depths, baseline=stereo_baseline,
    )
