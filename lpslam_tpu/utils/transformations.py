"""Frame/marker transformation helpers — reference Utils/Transformations.h
parity (/root/reference/src/Utils/Transformations.h:10-86, exercised by
src/test/TransformationsTest.cpp).

Conventions: poses are (position p, orientation q wxyz) pairs of a frame
expressed in a parent frame; transforming a child pose by a parent pose
composes rotations and offsets positions.
"""
from __future__ import annotations

import numpy as np

from ..geometry.so3 import quat_to_rot, rot_to_quat, quat_mul, quat_conj

import jax.numpy as jnp


def _rot(q):
    return np.asarray(quat_to_rot(jnp.asarray(q, jnp.float32)))


def tracker_to_origin(tracker_pos, tracker_q, origin_pos, origin_q):
    """Express a tracker-frame pose in the origin (global) frame.

    origin_*: pose of the tracker frame within the global frame.
    Returns (position, q_wxyz) of the tracked body in the global frame.
    """
    R = _rot(origin_q)
    pos = R @ np.asarray(tracker_pos) + np.asarray(origin_pos)
    q = np.asarray(quat_mul(jnp.asarray(origin_q, jnp.float32), jnp.asarray(tracker_q, jnp.float32)))
    return pos, q


def marker_to_global(marker_pos_vehicle, marker_q_vehicle, vehicle_pos, vehicle_q):
    """Marker observed in the vehicle frame -> marker pose in the global frame."""
    R = _rot(vehicle_q)
    pos = R @ np.asarray(marker_pos_vehicle) + np.asarray(vehicle_pos)
    q = np.asarray(quat_mul(jnp.asarray(vehicle_q, jnp.float32), jnp.asarray(marker_q_vehicle, jnp.float32)))
    return pos, q


def vehicle_pose_from_marker_measurement(
    marker_global_pos, marker_global_q, measured_pos, measured_q
):
    """Recover the vehicle's global pose from a measurement of a known marker.

    measured_*: the marker's pose as seen from the vehicle.
    Solves T_vehicle = T_marker_global ∘ T_measured⁻¹.
    """
    Rm = _rot(measured_q)
    q_meas_inv = np.asarray(quat_conj(jnp.asarray(measured_q, jnp.float32)))
    q_veh = np.asarray(quat_mul(jnp.asarray(marker_global_q, jnp.float32), jnp.asarray(q_meas_inv, jnp.float32)))
    Rv = _rot(q_veh)
    pos = np.asarray(marker_global_pos) - Rv @ np.asarray(measured_pos)
    return pos, q_veh
