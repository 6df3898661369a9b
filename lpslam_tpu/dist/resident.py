"""Persistent sharded map residency — the map LIVES across the mesh.

BASELINE config 5 ("multi-host sharded mapping: partitioned keyframes/map
blocks") and SURVEY §5's long-trajectory plan (trajectory-contiguous shards,
halo exchange of window-boundary keyframes). Round-2 sharded the keyframe
axis per *call*; between calls the MapStore was a single-device pytree. Here
the residency itself is persistent:

- every keyframe-axis leaf of the MapStore (kf_R/kf_t/kf_uv/kf_desc/
  kf_kp_valid/kf_lm_idx/...) is laid out as NamedSharding(mesh, P('kf'))
  — trajectory-contiguous blocks, keyframe k lives on device k // blk —
  and STAYS there between operations (every jitted op pins out_shardings);
- landmark-axis leaves and counters are replicated (they are small:
  P x 3 floats vs the K x N x ~50 B observation payload);
- the BoW database rows are sharded the same way, so loop scoring reads
  device-local rows (dist/sharded_map.sharded_bow_scores without re-layout).

Operations on the resident store:
  insert_keyframe   — functional slot write; XLA updates one shard
  local_ba          — temporal-window BA with an EXPLICIT halo exchange:
                      each device contributes its window-boundary keyframe
                      rows to one psum (only the w window rows ever cross
                      ICI — never the map), all devices then solve the same
                      small dense window problem redundantly (SPMD), and
                      each writes back only the rows it owns
  loop_scores       — sharded-database BoW scoring
  global_ba         — keyframe-sharded distributed Schur-CG
                      (dist/sharded_map._sgba_impl) reading the resident
                      blocks in place: zero re-layout

The same code runs on a virtual CPU mesh (tests / driver dryrun) and a real
multi-host slice.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mapstore.store import MapStore, MapConfig, empty_map, insert_keyframe_slots
from ..geometry.camera import PinholeCamera
from ..backend.ba import BAProblem, bundle_adjust
from .sharded_map import shard_map, sharded_global_ba
from .sharded_ba import _MeshHolder

# MapStore leaves whose leading axis is the keyframe axis
KF_LEAVES = frozenset({
    "kf_R", "kf_t", "kf_valid", "kf_frame_id",
    "kf_uv", "kf_desc", "kf_kp_valid", "kf_lm_idx",
})


def map_shardings(mesh: Mesh, axis: str = "kf") -> MapStore:
    """Per-leaf sharding pytree for a MapStore: keyframe-axis leaves
    block-sharded (trajectory-contiguous), everything else replicated."""
    kf = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return MapStore(**{
        f: (kf if f in KF_LEAVES else rep) for f in MapStore._fields
    })


@functools.partial(
    jax.jit, static_argnames=("w", "iters", "Pw", "mesh_holder", "axis")
)
def _halo_window_ba(m: MapStore, cam: PinholeCamera, w: int, iters: int,
                    Pw: int, mesh_holder=None, axis: str = "kf"):
    """Windowed local BA on the resident (sharded) store. Wire traffic is
    exactly the halo: one psum carrying the w window keyframes' pose +
    observation rows; everything else is device-local."""
    mesh = mesh_holder.mesh
    K = m.kf_R.shape[0]
    Pn = m.lm_pos.shape[0]
    n_dev = mesh.devices.size
    blk = K // n_dev

    def spec_of(ndim):
        return P(axis, *([None] * (ndim - 1)))

    in_specs = (
        spec_of(3), spec_of(2),                    # kf_R, kf_t
        spec_of(3), spec_of(2), spec_of(2),        # kf_uv, kf_kp_valid, kf_lm_idx
        P(), P(), P(), P(),                        # lm_pos, lm_valid, lm_n_obs, n_kf
    )
    out_specs = (spec_of(3), spec_of(2), P())      # kf_R, kf_t, lm_pos

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )
    def inner(kf_R, kf_t, kf_uv, kf_kpv, kf_lm, lm_pos, lm_valid, lm_n_obs,
              n_kf):
        d = jax.lax.axis_index(axis)
        base = jnp.maximum(n_kf - w, 0)
        gids = base + jnp.arange(w)                 # global window row ids
        loc = gids - d * blk
        mine = (loc >= 0) & (loc < blk)
        locc = jnp.clip(loc, 0, blk - 1)

        def halo(a, none_shift=0):
            """Gather the w window rows across shards: each device psums
            its owned rows — ONLY these w rows cross the interconnect."""
            rows = a[locc].astype(jnp.float32) + none_shift
            mask = mine.reshape((w,) + (1,) * (rows.ndim - 1))
            return jax.lax.psum(jnp.where(mask, rows, 0.0), axis) - none_shift

        win_R = halo(kf_R)
        win_t = halo(kf_t)
        win_uv = halo(kf_uv)
        win_kpv = halo(kf_kpv) > 0.5
        win_lm = (halo(kf_lm, none_shift=1.0)).astype(jnp.int32)

        exists = gids < n_kf
        rank = jnp.arange(w)
        cam_fixed = (rank < 2) | ~exists
        obs_lm = jnp.where(win_kpv & exists[:, None], win_lm, -1)

        # compact the landmark axis to the window's member set (sort-free,
        # same scheme as backend.ba._local_ba_impl)
        member = jnp.zeros((Pn,), bool).at[
            jnp.maximum(obs_lm.reshape(-1), 0)
        ].max(obs_lm.reshape(-1) >= 0)
        pos = jnp.cumsum(member.astype(jnp.int32)) - 1
        inv = jnp.where(member, pos, -1).astype(jnp.int32)
        inv = jnp.where(inv < Pw, inv, -1)
        sel = jnp.zeros((Pw,), jnp.int32).at[
            jnp.where(inv >= 0, inv, Pw)
        ].set(jnp.arange(Pn, dtype=jnp.int32), mode="drop")
        sel_member = jnp.arange(Pw) < jnp.minimum(pos[-1] + 1, Pw)
        obs_lm_c = jnp.where(obs_lm >= 0, inv[jnp.maximum(obs_lm, 0)], -1)

        prob = BAProblem(
            cam_R=win_R, cam_t=win_t,
            points=lm_pos[sel],
            obs_lm=obs_lm_c, obs_uv=win_uv,
            obs_sigma2=jnp.ones(obs_lm_c.shape, jnp.float32),
            cam_fixed=cam_fixed,
            point_valid=lm_valid[sel] & sel_member,
            point_fixed=lm_valid[sel] & (lm_n_obs[sel] <= 1),
        )
        # every device solves the same replicated window problem (SPMD —
        # the window inputs are identical after the halo psum), so the
        # write-backs below are consistent without further communication
        res = bundle_adjust(prob, cam, iters=iters)

        # write back only the rows THIS device owns (scatter-drop the rest)
        tgt = jnp.where(mine & exists, locc, blk)
        kf_R2 = kf_R.at[tgt].set(res.cam_R, mode="drop")
        kf_t2 = kf_t.at[tgt].set(res.cam_t, mode="drop")
        lm_pos2 = lm_pos.at[jnp.where(sel_member, sel, Pn)].set(
            res.points, mode="drop"
        )
        return kf_R2, kf_t2, lm_pos2

    kf_R, kf_t, lm_pos = inner(
        m.kf_R, m.kf_t, m.kf_uv, m.kf_kp_valid, m.kf_lm_idx,
        m.lm_pos, m.lm_valid, m.lm_n_obs, m.n_kf,
    )
    return m._replace(kf_R=kf_R, kf_t=kf_t, lm_pos=lm_pos)


class ResidentMap:
    """A MapStore resident across a device mesh between operations.

    All mutating methods are functional underneath but update `self.m` in
    place for convenience; every jitted program pins out_shardings so the
    keyframe blocks never silently collapse onto one device.
    """

    def __init__(self, mesh: Mesh, cfg: MapConfig, vocab_words: int = 0,
                 axis: str = "kf", window: int = 6):
        n_dev = mesh.devices.size
        if cfg.max_keyframes % n_dev != 0:
            raise ValueError(
                f"max_keyframes ({cfg.max_keyframes}) must be divisible by "
                f"the mesh size ({n_dev}) for block-contiguous residency"
            )
        self.mesh = mesh
        self.axis = axis
        self.cfg = cfg
        self.window = window
        self._holder = _MeshHolder(mesh)
        self._shardings = map_shardings(mesh, axis)
        self.m = jax.device_put(empty_map(cfg), self._shardings)
        self._kf_sh = NamedSharding(mesh, P(axis, None))
        self.db = (
            jax.device_put(
                jnp.zeros((cfg.max_keyframes, vocab_words), jnp.float32),
                self._kf_sh,
            )
            if vocab_words else None
        )
        self._insert = jax.jit(
            insert_keyframe_slots, out_shardings=self._shardings
        )
        self._db_set = jax.jit(
            lambda db, k, v: db.at[k].set(v), out_shardings=self._kf_sh,
            donate_argnums=(0,),
        )

    # -- operations ---------------------------------------------------------

    def put(self, m: MapStore) -> MapStore:
        """Adopt an existing MapStore into the resident layout (e.g. a map
        loaded from disk or handed over from a single-chip session)."""
        self.m = jax.device_put(m, self._shardings)
        return self.m

    def insert_keyframe(self, R, t, uv, desc, kp_valid, lm_idx, frame_id,
                        bow_vec=None):
        """Insert into slot n_kf (the owner shard takes the write); the BoW
        row lands in the same block of the sharded database."""
        k = self.m.n_kf
        self.m = self._insert(self.m, R, t, uv, desc, kp_valid, lm_idx,
                              frame_id)
        if self.db is not None and bow_vec is not None:
            self.db = self._db_set(self.db, k, bow_vec)
        return self.m

    def local_ba(self, cam: PinholeCamera, iters: int = 8):
        Pw = min(self.m.lm_pos.shape[0],
                 max(1024, self.window * self.m.kf_uv.shape[1] // 2))
        Pw = 1 << (Pw - 1).bit_length()
        self.m = _halo_window_ba(
            self.m, cam, self.window, iters, Pw,
            mesh_holder=self._holder, axis=self.axis,
        )
        return self.m

    def loop_scores(self, query):
        """BoW similarity of `query` against the sharded database rows."""
        from .sharded_map import sharded_bow_scores

        return sharded_bow_scores(self.db, query, mesh=self.mesh)

    def global_ba(self, cam: PinholeCamera, iters: int = 8,
                  cg_iters: int = 15):
        """Keyframe-sharded distributed Schur-CG over the resident blocks —
        the kf-axis arrays already carry the mesh layout the shard_map
        expects, so no re-layout happens on entry."""
        m2, res = sharded_global_ba(self.m, cam, mesh=self.mesh,
                                    iters=iters, cg_iters=cg_iters)
        self.m = jax.device_put(m2, self._shardings)
        return self.m, res

    # -- introspection ------------------------------------------------------

    def residency_ok(self) -> bool:
        """True iff every keyframe leaf still lives block-sharded on the
        mesh and the rest is replicated (the persistence invariant)."""
        if self.mesh.devices.size == 1:
            return True  # sharded == replicated on a single-device mesh
        for f in MapStore._fields:
            leaf = getattr(self.m, f)
            sh = leaf.sharding
            spec = getattr(sh, "spec", None)
            if f in KF_LEAVES:
                if not (spec and len(spec) >= 1 and spec[0] == self.axis):
                    return False
            else:
                if spec and any(s is not None for s in spec):
                    return False
        if self.db is not None:
            spec = self.db.sharding.spec
            if not (len(spec) >= 1 and spec[0] == self.axis):
                return False
        return True
