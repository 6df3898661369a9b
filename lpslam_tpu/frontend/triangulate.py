"""Batched two-view triangulation.

The reference engine triangulates new map points in its mapping thread
(stock OpenVSLAM two-view triangulation during keyframe insertion). Here it is
a closed-form batched midpoint solve — no SVD, one 3x3 solve per point, fully
vectorized.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera, unproject_pinhole


def triangulate_rays(o1, d1, o2, d2):
    """Midpoint of the common perpendicular of two ray bundles.

    o*, d*: (N,3) origins and (not necessarily unit) directions in world.
    Returns (p (N,3), s1, s2) with p the midpoint and s* the ray parameters
    (negative s = point behind the camera).
    """
    a = jnp.sum(d1 * d1, -1)
    b = jnp.sum(d1 * d2, -1)
    c = jnp.sum(d2 * d2, -1)
    w0 = o1 - o2
    d = jnp.sum(d1 * w0, -1)
    e = jnp.sum(d2 * w0, -1)
    denom = a * c - b * b
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    s1 = (b * e - c * d) / denom
    s2 = (a * e - b * d) / denom
    p1 = o1 + s1[:, None] * d1
    p2 = o2 + s2[:, None] * d2
    return 0.5 * (p1 + p2), s1, s2


def triangulate_midpoint(
    T1cw: SE3, T2cw: SE3, cam: PinholeCamera, uv1, uv2
):
    """Triangulate pixel correspondences between two calibrated views.

    Returns (p_w (N,3), info) where info carries per-point quality:
    depths in both cameras, parallax cosine.
    """
    T1wc_R = T1cw.R.T
    T2wc_R = T2cw.R.T
    o1 = -T1wc_R @ T1cw.t
    o2 = -T2wc_R @ T2cw.t
    r1 = unproject_pinhole(cam, uv1)  # cam frame rays
    r2 = unproject_pinhole(cam, uv2)
    d1 = jnp.einsum("ij,nj->ni", T1wc_R, r1)
    d2 = jnp.einsum("ij,nj->ni", T2wc_R, r2)

    p, s1, s2 = triangulate_rays(
        jnp.broadcast_to(o1, d1.shape), d1, jnp.broadcast_to(o2, d2.shape), d2
    )
    # depths (z in each camera)
    z1 = jnp.einsum("ij,nj->ni", T1cw.R, p)[:, 2] + T1cw.t[2]
    z2 = jnp.einsum("ij,nj->ni", T2cw.R, p)[:, 2] + T2cw.t[2]
    d1n = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    d2n = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    cos_par = jnp.sum(d1n * d2n, axis=-1)
    return p, {"z1": z1, "z2": z2, "cos_parallax": cos_par}
