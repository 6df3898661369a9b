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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host runtime (call once per host before building
    meshes that span hosts). Thin wrapper over jax.distributed.initialize so
    pipeline code has one entry point; on single-host runs it is a no-op.

    Multi-host layout: each host runs its own SlamManager pipeline feeding a
    host-local shard of keyframe observations; distributed_bundle_adjust then
    reduces Schur blocks over ICI across the full mesh.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
