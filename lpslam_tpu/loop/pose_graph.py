"""Sim(3) pose-graph optimization — scale-drift-aware loop correction.

The g2o `types_sim3` capability in the reference stack
(/root/reference/conan-packages/g2o-conan/conanfile.py:118-126; the engine's
loop-closing thread optimizes the essential/covisibility pose graph after a
loop is accepted). TPU-native design:

- State: (K, 7) Sim3 tangent-parameter deltas around the current estimates.
- Edges: (E,) pairs (i, j) with measured relative Sim3 constraints S_ij; the
  residual is log_sim3(S_ij · S_j · S_i⁻¹) — zero when consistent.
- Jacobians by forward-mode autodiff through the sim3 exp/log chain (vmapped
  per edge), Gauss-Newton blocks scatter-added into a dense (7K, 7K) system,
  one Cholesky/LU solve per iteration. For the keyframe counts a single map
  holds (hundreds), the dense solve is tiny MXU work — no sparse machinery.

All fixed iterations, masked edges, static shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.sim3 import Sim3, sim3_exp, sim3_log, sim3_compose, sim3_inverse


class PoseGraphProblem(NamedTuple):
    """Fixed-capacity pose-graph problem.

    node_R/t/s: (K,...) current Sim3 estimates (world->kf or kf->world —
      consistent use is all that matters; we use world->kf like the BA poses).
    edge_i, edge_j: (E,) int32 node indices.
    edge_R/t/s: (E,...) measured relative transforms S_ij = S_i ∘ S_j⁻¹
      at measurement time (so residual = log(S_ij ∘ S_j ∘ S_i⁻¹)).
    edge_weight: (E,) float32 (0 = padding/invalid edge).
    node_fixed: (K,) bool — gauge anchors.
    """

    node_R: jnp.ndarray
    node_t: jnp.ndarray
    node_s: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_R: jnp.ndarray
    edge_t: jnp.ndarray
    edge_s: jnp.ndarray
    edge_weight: jnp.ndarray
    node_fixed: jnp.ndarray


def _edge_residual(xi_i, xi_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
    """Residual of one edge with tangent perturbations xi on both nodes.

    S_i' = exp(xi_i) ∘ S_i etc.; r = log(S_m ∘ S_j' ∘ S_i'⁻¹).
    """
    Si = sim3_compose(sim3_exp(xi_i), Sim3(Ri, ti, si))
    Sj = sim3_compose(sim3_exp(xi_j), Sim3(Rj, tj, sj))
    Sm = Sim3(Rm, tm, sm)
    return sim3_log(sim3_compose(Sm, sim3_compose(Sj, sim3_inverse(Si))))


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(prob: PoseGraphProblem, iters: int = 10, damping: float = 1e-4):
    """Gauss-Newton over the Sim3 pose graph. Returns updated (R, t, s)."""
    K = prob.node_R.shape[0]

    res_and_jac = jax.vmap(
        lambda Ri, ti, si, Rj, tj, sj, Rm, tm, sm: (
            _edge_residual(
                jnp.zeros(7), jnp.zeros(7), Ri, ti, si, Rj, tj, sj, Rm, tm, sm
            ),
            jax.jacfwd(_edge_residual, argnums=0)(
                jnp.zeros(7), jnp.zeros(7), Ri, ti, si, Rj, tj, sj, Rm, tm, sm
            ),
            jax.jacfwd(_edge_residual, argnums=1)(
                jnp.zeros(7), jnp.zeros(7), Ri, ti, si, Rj, tj, sj, Rm, tm, sm
            ),
        )
    )

    def step(carry, _):
        R, t, s = carry
        Ri, ti, si = R[prob.edge_i], t[prob.edge_i], s[prob.edge_i]
        Rj, tj, sj = R[prob.edge_j], t[prob.edge_j], s[prob.edge_j]
        r, Ji, Jj = res_and_jac(
            Ri, ti, si, Rj, tj, sj, prob.edge_R, prob.edge_t, prob.edge_s
        )  # (E,7), (E,7,7), (E,7,7)
        w = prob.edge_weight

        # assemble dense H (K,7,K,7) via scatter-add of the four blocks
        H = jnp.zeros((K, 7, K, 7), r.dtype)
        b = jnp.zeros((K, 7), r.dtype)
        Hii = jnp.einsum("eki,e,ekj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eki,e,ekj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eki,e,ekj->eij", Ji, w, Jj)
        bi = jnp.einsum("eki,e,ek->ei", Ji, w, r)
        bj = jnp.einsum("eki,e,ek->ei", Jj, w, r)
        H = H.at[prob.edge_i, :, prob.edge_i, :].add(Hii)
        H = H.at[prob.edge_j, :, prob.edge_j, :].add(Hjj)
        H = H.at[prob.edge_i, :, prob.edge_j, :].add(Hij)
        H = H.at[prob.edge_j, :, prob.edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[prob.edge_i].add(bi)
        b = b.at[prob.edge_j].add(bj)

        Hm = H.reshape(7 * K, 7 * K) + damping * jnp.eye(7 * K, dtype=r.dtype)
        fixed = jnp.repeat(prob.node_fixed, 7)
        Hm = jnp.where(
            fixed[:, None] | fixed[None, :], jnp.eye(7 * K, dtype=r.dtype), Hm
        )
        bv = jnp.where(fixed, 0.0, b.reshape(-1))
        dx = -jnp.linalg.solve(Hm, bv).reshape(K, 7)
        dx = jnp.where(prob.node_fixed[:, None], 0.0, dx)

        S_new = jax.vmap(lambda d, R_, t_, s_: sim3_compose(sim3_exp(d), Sim3(R_, t_, s_)))(
            dx, R, t, s
        )
        return (S_new.R, S_new.t, S_new.s), jnp.sum(w * jnp.sum(r * r, -1))

    (R, t, s), costs = jax.lax.scan(
        step, (prob.node_R, prob.node_t, prob.node_s), None, length=iters
    )
    return R, t, s, costs
