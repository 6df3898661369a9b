"""Device mesh construction for multi-chip / multi-host runs.

The reference is a single-process thread-parallel system with no distributed
backend at all (SURVEY.md §2.3 — no MPI/NCCL/gRPC anywhere). This module is
the new first-class capability: `jax.sharding.Mesh` over the pod slice, with
axis "obs" used to shard bundle-adjustment observations / map blocks and
"data" reserved for multi-stream ingestion.

Collectives ride ICI inside a slice (psum/all_gather inserted by XLA from
shard_map); DCN is only touched by host-level dataset distribution.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "obs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def default_mesh() -> Mesh:
    return make_mesh()
