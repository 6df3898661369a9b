"""Map persistence — the `map.db` save/load capability.

The reference saves/loads the engine's map database on stop/start
(/root/reference/src/Trackers/OpenVSLAMTrackerBase.cpp:242-295, configurable
via mappingSetFilename / mappingSetMode). The MapStore is a flat pytree of
arrays, so persistence is a straight npz round-trip (atomic via tmp+rename).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .store import MapStore


def save_map(m: MapStore, path: str) -> None:
    arrays = {k: np.asarray(v) for k, v in m._asdict().items()}
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_map(path: str) -> Optional[MapStore]:
    if not os.path.exists(path):
        return None
    data = np.load(path, allow_pickle=False)
    fields = {k: jnp.asarray(data[k]) for k in MapStore._fields}
    return MapStore(**fields)
