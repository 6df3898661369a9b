"""Coordinate-frame conventions and conversions.

The reference uses two frames (see the vector swap in
/root/reference/src/Trackers/OpenVSLAMTrackerBase.h:22-33 `OpenVSLAMVConvert`):

- **lpslam frame** (the public API frame): x forward?, per the reference's
  convert: lpslam (x, y, z) maps to engine-optical (y, -x, z) and back
  optical (x, y, z) -> lpslam (-y, x, z).
- **optical frame** (classic CV): x right, y down, z forward — the frame the
  tracker/map/BA operate in.

We keep the *engine* entirely in the optical frame (like the reference's SLAM
core) and convert only at the public interface boundary (like
`createTrackerResult` /root/reference/src/Trackers/OpenVSLAMTrackerBase.cpp:307-329).
"""
from __future__ import annotations

import jax.numpy as jnp

from .se3 import SE3


def lpslam_to_optical(v):
    """lpslam (x,y,z) -> optical (y,-x,z). Works on (...,3) arrays."""
    return jnp.stack([v[..., 1], -v[..., 0], v[..., 2]], axis=-1)


def optical_to_lpslam(v):
    """optical (x,y,z) -> lpslam (-y,x,z)."""
    return jnp.stack([-v[..., 1], v[..., 0], v[..., 2]], axis=-1)


# Rotation matrix that maps lpslam coords to optical coords: v_opt = M @ v_lp
_M_LP_TO_OPT = jnp.asarray(
    [[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=jnp.float32
)


def se3_lpslam_to_optical(T: SE3) -> SE3:
    """Conjugate an SE3 expressed in the lpslam frame into the optical frame."""
    M = _M_LP_TO_OPT
    return SE3(M @ T.R @ M.T, (M @ T.t[..., None])[..., 0])


def se3_optical_to_lpslam(T: SE3) -> SE3:
    M = _M_LP_TO_OPT
    return SE3(M.T @ T.R @ M, (M.T @ T.t[..., None])[..., 0])
