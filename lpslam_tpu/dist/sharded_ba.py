"""Distributed bundle adjustment: Schur blocks reduced over the device mesh.

The BASELINE north star's "multi-host sharded mapping" capability: keyframe
observations are sharded across devices along the keypoint-slot axis; every
device builds the Hessian-block partials for its shard locally, the per-camera
6x6 blocks, per-landmark 3x3 blocks and the camera-point coupling are
`psum`-reduced over ICI, and the small reduced camera system is solved
replicated (it is tiny next to the reduction). One LM iteration is therefore:

    local einsums  →  psum(Hcc, bc, Hpp, bp, Hcp)  →  replicated Schur solve
    →  replicated point back-substitution

which is the classic distributed-Gauss-Newton layout (compute where the data
lives, reduce only compact normal-equation blocks — never raw observations).

Implemented with shard_map over a 1-axis mesh, so the same code runs on a
virtual CPU mesh (tests), one real chip, or a multi-host slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..kernels.linalg import inv3x3_guarded
from jax.sharding import Mesh, PartitionSpec as P
import inspect as _inspect

try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map as _shard_map_raw
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_raw

# replication-check kwarg was renamed check_rep -> check_vma in jax 0.8
_SM_CHECK_KW = (
    "check_vma"
    if "check_vma" in _inspect.signature(_shard_map_raw).parameters
    else "check_rep"
)


def shard_map(f, **kw):
    if "check_rep" in kw:
        kw[_SM_CHECK_KW] = kw.pop("check_rep")
    return _shard_map_raw(f, **kw)

from ..geometry.se3 import SE3, se3_exp, se3_compose
from ..geometry.camera import PinholeCamera
from .mesh import make_mesh
from ..backend.ba import (
    BAProblem,
    BAResult,
    CHI2_2D,
    _project_residuals,
    _cost_and_weights,
)


def _local_blocks(cam, R, t, points, obs_lm, obs_uv, obs_sigma2, cam_fixed,
                  point_valid, gate, lam):
    """Per-shard normal-equation partials (runs on each device's obs slice)."""
    C, Nl = obs_lm.shape
    Pn = points.shape[0]
    active0 = (obs_lm >= 0) & point_valid[jnp.maximum(obs_lm, 0)]
    r, Jc, Jp, p_c = _project_residuals(cam, R, t, points, obs_lm, obs_uv)
    active = active0 & gate & (p_c[..., 2] > 1e-2)
    cost, w = _cost_and_weights(r, obs_sigma2, active)
    Jc = jnp.where(cam_fixed[:, None, None, None], 0.0, Jc)

    flat_lm = jnp.maximum(obs_lm.reshape(-1), 0)
    Hcc = jnp.einsum("cnik,cn,cnil->ckl", Jc, w, Jc)
    bc = jnp.einsum("cnik,cn,cni->ck", Jc, w, r)
    JpTJp = jnp.einsum("cnik,cn,cnil->cnkl", Jp, w, Jp)
    Hpp = jax.ops.segment_sum(JpTJp.reshape(-1, 3, 3), flat_lm, num_segments=Pn)
    bp = jax.ops.segment_sum(
        jnp.einsum("cnik,cn,cni->cnk", Jp, w, r).reshape(-1, 3),
        flat_lm, num_segments=Pn,
    )
    JcTJp = jnp.einsum("cnik,cn,cnil->cnkl", Jc, w, Jp)
    Hcp = jnp.zeros((C, Pn, 6, 3), r.dtype)
    cam_rows = jnp.broadcast_to(jnp.arange(C)[:, None], (C, Nl)).reshape(-1)
    Hcp = Hcp.at[cam_rows, flat_lm].add(JcTJp.reshape(-1, 6, 3))
    return Hcc, bc, Hpp, bp, Hcp, cost


@functools.partial(
    jax.jit, static_argnames=("iters", "axis_name", "mesh_holder")
)
def _dba_impl(prob, cam, iters, axis_name, mesh_holder):
    mesh = mesh_holder.mesh
    C, N = prob.obs_lm.shape
    Pn = prob.points.shape[0]

    obs_spec = P(None, axis_name)          # (C, N) sharded along slots
    obs_spec3 = P(None, axis_name, None)   # (C, N, 2)
    rep = P()

    def one_iteration(R, t, points, lam, gate_full):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(rep, rep, rep, obs_spec, obs_spec3, obs_spec, rep, rep,
                      obs_spec, rep),
            out_specs=(rep, rep, rep, rep, rep, rep),
            check_rep=False,
        )
        def blocks(R_, t_, pts_, olm, ouv, osg, cfx, pv, gate, lam_):
            Hcc, bc, Hpp, bp, Hcp, cost = _local_blocks(
                cam, R_, t_, pts_, olm, ouv, osg, cfx, pv, gate, lam_
            )
            # compact normal-equation reduction over ICI
            Hcc = jax.lax.psum(Hcc, axis_name)
            bc = jax.lax.psum(bc, axis_name)
            Hpp = jax.lax.psum(Hpp, axis_name)
            bp = jax.lax.psum(bp, axis_name)
            Hcp = jax.lax.psum(Hcp, axis_name)
            cost = jax.lax.psum(cost, axis_name)
            return Hcc, bc, Hpp, bp, Hcp, cost

        Hcc, bc, Hpp, bp, Hcp, cost = blocks(
            R, t, points, prob.obs_lm, prob.obs_uv, prob.obs_sigma2,
            prob.cam_fixed, prob.point_valid, gate_full, lam,
        )

        # replicated Schur solve (identical math to backend.ba)
        Hpp_d = Hpp + (lam + 1e-8) * jnp.eye(3, dtype=bc.dtype)[None]
        # guarded closed-form inverse (batched LU is ~3.8 ms at (P,3,3) on
        # v5e; the residual gate freezes blocks whose adjugate went bad)
        Hpp_inv = inv3x3_guarded(Hpp_d)
        S = jnp.zeros((C, 6, C, 6), bc.dtype)
        S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc)
        S = S - jnp.einsum("apij,pjk,bplk->aibl", Hcp, Hpp_inv, Hcp)
        bS = bc - jnp.einsum("apij,pjk,pk->ai", Hcp, Hpp_inv, bp)
        Sm = S.reshape(6 * C, 6 * C) + lam * jnp.eye(6 * C, dtype=bc.dtype)
        fixed_diag = jnp.repeat(prob.cam_fixed, 6)
        Sm = jnp.where(
            fixed_diag[:, None] | fixed_diag[None, :],
            jnp.eye(6 * C, dtype=bc.dtype), Sm,
        )
        bSm = jnp.where(fixed_diag, 0.0, bS.reshape(-1))
        dc = -jnp.linalg.solve(Sm, bSm).reshape(C, 6)
        dc = jnp.where(prob.cam_fixed[:, None], 0.0, dc)
        Hpc_dc = jnp.einsum("apij,ai->pj", Hcp, dc)
        dp = -jnp.einsum("pjk,pk->pj", Hpp_inv, bp + Hpc_dc)
        dp = jnp.where(prob.point_valid[:, None], dp, 0.0)

        T_new = jax.vmap(lambda R_, t_, d: se3_compose(se3_exp(d), SE3(R_, t_)))(
            R, t, dc
        )
        return T_new.R, T_new.t, points + dp, cost

    def step(carry, gate_full):
        R, t, points, lam, prev_cost = carry
        R2, t2, pts2, cost = one_iteration(R, t, points, lam, gate_full)
        # evaluate tentative cost (replicated residual eval on full problem)
        r2, _, _, pc2 = _project_residuals(cam, R2, t2, pts2, prob.obs_lm, prob.obs_uv)
        active0 = (prob.obs_lm >= 0) & prob.point_valid[jnp.maximum(prob.obs_lm, 0)]
        cost_new, _ = _cost_and_weights(
            r2, prob.obs_sigma2, active0 & gate_full & (pc2[..., 2] > 1e-2)
        )
        accept = cost_new < cost
        R = jnp.where(accept, R2, R)
        t = jnp.where(accept, t2, t)
        points = jnp.where(accept, pts2, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-6, 1e3)
        return (R, t, points, lam, cost_new)

    all_obs = jnp.ones_like(prob.obs_lm, dtype=bool)
    n1 = max(iters // 2, 1)
    n2 = max(iters - n1, 1)
    carry = (prob.cam_R, prob.cam_t, prob.points, jnp.float32(1e-4), jnp.float32(0))
    carry = jax.lax.fori_loop(0, n1, lambda _, c: step(c, all_obs), carry)
    R1, t1, pts1 = carry[0], carry[1], carry[2]
    r1, _, _, pc1 = _project_residuals(cam, R1, t1, pts1, prob.obs_lm, prob.obs_uv)
    chi1 = jnp.sum(r1 * r1, -1) / prob.obs_sigma2
    gate = (chi1 <= CHI2_2D * 4.0) & (pc1[..., 2] > 1e-2)
    carry = (R1, t1, pts1, jnp.float32(1e-4), carry[4])
    carry = jax.lax.fori_loop(0, n2, lambda _, c: step(c, gate), carry)
    R, t, points, _, _ = carry

    rf, _, _, pcf = _project_residuals(cam, R, t, points, prob.obs_lm, prob.obs_uv)
    active0 = (prob.obs_lm >= 0) & prob.point_valid[jnp.maximum(prob.obs_lm, 0)]
    chi2 = jnp.sum(rf * rf, -1) / prob.obs_sigma2
    inlier = active0 & (pcf[..., 2] > 1e-2) & (chi2 <= CHI2_2D)
    r0, _, _, pc0 = _project_residuals(
        cam, prob.cam_R, prob.cam_t, prob.points, prob.obs_lm, prob.obs_uv
    )
    cost0, _ = _cost_and_weights(r0, prob.obs_sigma2, active0 & (pc0[..., 2] > 1e-2))
    costf, _ = _cost_and_weights(rf, prob.obs_sigma2, active0 & (pcf[..., 2] > 1e-2))
    return BAResult(
        cam_R=R, cam_t=t, points=points,
        initial_cost=cost0, final_cost=costf, obs_inlier=inlier,
    )


class _MeshHolder:
    """Hashable static wrapper so a Mesh can ride through jit static args."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash((tuple(d.id for d in self.mesh.devices.flat), self.mesh.axis_names))

    def __eq__(self, other):
        return (
            isinstance(other, _MeshHolder)
            and tuple(d.id for d in self.mesh.devices.flat)
            == tuple(d.id for d in other.mesh.devices.flat)
            and self.mesh.axis_names == other.mesh.axis_names
        )


def distributed_bundle_adjust(
    prob: BAProblem,
    cam: PinholeCamera,
    mesh: Mesh | None = None,
    iters: int = 10,
) -> BAResult:
    """BA with the observation axis sharded across `mesh` (axis "obs").

    The keypoint-slot axis N must be divisible by the mesh size (pad the
    problem if needed — padded slots carry obs_lm = −1 and cost nothing).
    """
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    C, N = prob.obs_lm.shape
    if N % n_dev != 0:
        pad = n_dev - N % n_dev
        prob = prob._replace(
            obs_lm=jnp.pad(prob.obs_lm, ((0, 0), (0, pad)), constant_values=-1),
            obs_uv=jnp.pad(prob.obs_uv, ((0, 0), (0, pad), (0, 0))),
            obs_sigma2=jnp.pad(prob.obs_sigma2, ((0, 0), (0, pad)), constant_values=1.0),
        )
    return _dba_impl(prob, cam, iters, axis, _MeshHolder(mesh))
