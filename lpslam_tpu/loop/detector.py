"""Loop detection and closure orchestration.

Reference behavior being replaced: the engine's loop-closing thread — DBoW2
candidate query, Sim3 verification, pose-graph optimization, global BA
(enabled/disabled via `disable_loop_detector`,
/root/reference/src/Trackers/OpenVSLAMTrackerBase.cpp:253-255).

TPU-native layout: the keyframe BoW database is a device-resident (K, W)
matrix (queries are one matvec); verification is dense mutual-NN matching +
robust Umeyama Sim3 on 3D-3D landmark pairs; correction is Sim3 pose-graph
GN over all keyframes followed by batched landmark re-anchoring.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.sim3 import Sim3, sim3_compose, sim3_inverse, sim3_apply
from ..kernels.match import match_mutual_nn
from ..mapstore.store import MapStore
from .vocab import Vocabulary, bow_vector, bow_similarity
from .sim3_solve import robust_sim3_from_matches
from .pose_graph import PoseGraphProblem, optimize_pose_graph


class LoopConfig(NamedTuple):
    min_score: float = 0.18        # absolute BoW similarity gate
    min_gap: int = 8               # candidate must be this many KFs older
    min_pair_matches: int = 30     # descriptor matches to attempt Sim3
    min_sim3_inliers: int = 15
    # geometric consensus must also be a real fraction of the descriptor
    # matches — 15 coincidental inliers out of 300 matches is noise
    min_inlier_ratio: float = 0.4
    sim3_sigma: float = 0.1        # inlier scale (map units)
    # the same map region must be re-detected on this many CONSECUTIVE new
    # keyframes before a closure is attempted (the engine's loop-candidate
    # consistency check): one-off BoW hits in self-similar scenes are the
    # dominant false-positive source
    consistency: int = 3
    # metric maps (stereo / RGB-D): depth fixes the scale, so the correction
    # must be rigid — the Sim3 scale is clamped to 1 and a large estimated
    # scale itself flags a false positive (the engine optimizes its
    # stereo/RGB-D pose graph with fixed scale)
    fix_scale: bool = False
    max_scale_drift: float = 0.12  # |log s| gate when fix_scale
    pose_graph_iters: int = 10
    global_ba_iters: int = 0       # > 0: run full-map BA after the pose graph


class LoopResult(NamedTuple):
    detected: bool
    candidate: int
    n_matches: int
    n_inliers: int


class LoopVerdict(NamedTuple):
    """Outcome of detect + geometric verification (no map mutation) — the
    payload the asynchronous loop worker hands back for deferred application."""
    result: LoopResult
    k_new: int
    S_corr: object  # Sim3 correction (None unless result.detected)


@functools.partial(jax.jit, static_argnames=("iters", "min_shared"))
def correct_loop(m: MapStore, k_new, cand, corr_R, corr_t, corr_s,
                 iters: int = 10, min_shared: int = 30) -> MapStore:
    """Apply an accepted loop closure: Sim3 pose-graph optimization over
    sequential + covisibility + loop edges, then landmark re-anchoring.
    Fully traced (k_new / cand / correction are device values), so an
    accepted closure is ONE dispatch — the host never blocks on it. The
    covisibility counts are one (K, M)·(M, K) matmul on the MXU instead of
    the engine's per-keyframe covisibility list walk (the reference corrects
    the essential graph in its loop-closing thread; here the whole correction
    is a compiled program).
    """
    K, N = m.kf_lm_idx.shape
    M = m.lm_pos.shape[0]
    nk = m.n_kf
    ids = jnp.arange(K, dtype=jnp.int32)

    node_R = m.kf_R
    node_t = m.kf_t
    node_s = jnp.ones((K,), jnp.float32)

    # --- edge construction, all static shapes: E = (K-1) seq + (K-1) covis + 1 loop
    seq_i = ids[:-1]
    seq_j = ids[:-1] + 1
    seq_w = (ids[:-1] < nk - 1).astype(jnp.float32)

    # covisibility counts: B[k, l] = 1 iff keyframe k observes landmark l;
    # shared = B Bᵀ on the MXU (dense, exact for counts < 2^24)
    valid = m.kf_kp_valid & (m.kf_lm_idx >= 0) & (ids[:, None] < nk)
    rows = jnp.broadcast_to(ids[:, None], (K, N)).reshape(-1)
    cols = jnp.where(valid, m.kf_lm_idx, M).reshape(-1)
    B = jnp.zeros((K, M + 1), jnp.float32).at[rows, cols].set(1.0)[:, :M]
    shared = (B @ B.T).astype(jnp.int32)                       # (K, K)
    pair_ok = (
        (ids[None, :] > ids[:, None] + 1)   # skip self + sequential neighbors
        & (ids[None, :] < nk)
        & (shared >= min_shared)
    )
    score = jnp.where(pair_ok, shared, -1).reshape(-1)
    top_v, top_idx = jax.lax.top_k(score, K - 1)
    cov_w = (top_v > 0).astype(jnp.float32)
    cov_i = jnp.where(top_v > 0, top_idx // K, 0).astype(jnp.int32)
    cov_j = jnp.where(top_v > 0, top_idx % K, 1).astype(jnp.int32)

    ei = jnp.concatenate([seq_i, cov_i, cand[None].astype(jnp.int32)])
    ej = jnp.concatenate([seq_j, cov_j, k_new[None].astype(jnp.int32)])
    ew = jnp.concatenate([seq_w, cov_w, jnp.asarray([2.0], jnp.float32)])
    E = ei.shape[0]

    # measurements from current estimates (consistent edges), loop edge from
    # the verified correction: S_loop = S_cand ∘ S_corr ∘ S_new⁻¹
    Si = Sim3(node_R[ei], node_t[ei], node_s[ei])
    Sj = Sim3(node_R[ej], node_t[ej], node_s[ej])
    Sm = sim3_compose(Si, sim3_inverse(Sj))
    S_corr = Sim3(corr_R, corr_t, corr_s)
    S_cand = Sim3(node_R[cand], node_t[cand], jnp.float32(1.0))
    S_new = Sim3(node_R[k_new], node_t[k_new], jnp.float32(1.0))
    S_loop = sim3_compose(S_cand, sim3_compose(S_corr, sim3_inverse(S_new)))
    Sm = Sim3(
        R=Sm.R.at[E - 1].set(S_loop.R),
        t=Sm.t.at[E - 1].set(S_loop.t),
        s=Sm.s.at[E - 1].set(S_loop.s),
    )

    fixed = (ids == 0) | (ids >= nk)   # gauge anchor + empty slots

    prob = PoseGraphProblem(
        node_R=node_R, node_t=node_t, node_s=node_s,
        edge_i=ei, edge_j=ej,
        edge_R=Sm.R, edge_t=Sm.t, edge_s=Sm.s,
        edge_weight=ew,
        node_fixed=fixed,
    )
    R2, t2, s2, _ = optimize_pose_graph(prob, iters=iters)

    # landmark re-anchoring: p' = S_f_new⁻¹( S_f_old(p) ) with world->kf
    # Sim3s of the landmark's first keyframe
    f = jnp.maximum(m.lm_first_kf, 0)
    S_old = Sim3(m.kf_R[f], m.kf_t[f], jnp.ones_like(s2[f]))
    S_newS = Sim3(R2[f], t2[f], s2[f])
    p_kf = sim3_apply(S_old, m.lm_pos)
    p_corr = sim3_apply(sim3_inverse(S_newS), p_kf)
    lm_pos = jnp.where(m.lm_valid[:, None], p_corr, m.lm_pos)

    # fold scale into the SE3 keyframe poses: T = (R, t/s)
    kf_t = t2 / jnp.maximum(s2[:, None], 1e-9)
    return m._replace(kf_R=R2, kf_t=kf_t, lm_pos=lm_pos)


class LoopCloser:
    """Host-side loop closing over a MapStore. One instance per tracker."""

    def __init__(self, vocab: Vocabulary, max_keyframes: int, cfg: LoopConfig = LoopConfig()):
        self.vocab = vocab
        self.cfg = cfg
        W = vocab.words.shape[0]
        self.db = jnp.zeros((max_keyframes, W), jnp.float32)
        self.n = 0
        # consecutive-detection history for the consistency gate:
        # candidate keyframe index per recent try_close (-1 = none)
        self._recent_cands: list = []

    def add_keyframe(self, m: MapStore, k: int):
        v = bow_vector(self.vocab, m.kf_desc[k], m.kf_kp_valid[k])
        self.db = self.db.at[k].set(v)
        self.n = max(self.n, k + 1)
        return v

    def remap(self, kf_order, n_kf: int):
        """Realign the BoW database after a MapStore compaction: row for new
        slot i comes from old slot kf_order[i]; rows beyond the surviving
        keyframe count are zeroed."""
        kf_order = jnp.asarray(kf_order)
        db = self.db[kf_order]
        rows = jnp.arange(db.shape[0]) < n_kf
        self.db = jnp.where(rows[:, None], db, 0.0)
        self.n = min(self.n, int(n_kf))

    def detect(self, m: MapStore, k_new: int) -> int:
        """Returns candidate keyframe index or −1."""
        v = self.db[k_new]
        scores = np.array(bow_similarity(v, self.db))
        scores[max(0, k_new - self.cfg.min_gap):] = -1.0
        scores[self.n:] = -1.0
        cand = int(np.argmax(scores))
        if scores[cand] < self.cfg.min_score:
            return -1
        return cand

    def try_close(self, m: MapStore, k_new: int, cam=None) -> tuple[MapStore, LoopResult]:
        """Detect + verify + correct, synchronously. Returns (possibly
        updated map, result). cam: PinholeCamera — required only when
        cfg.global_ba_iters > 0. The pipeline's asynchronous loop thread
        uses the split form: `verify` on a map snapshot off the frame path,
        `apply` (one compiled dispatch) when the verdict comes back."""
        return self.apply(m, self.verify(m, k_new), cam=cam)

    def verify(self, m: MapStore, k_new: int) -> LoopVerdict:
        """Detect + consistency gate + geometric verification. Mutates only
        the closer's own consistency history — never the map — so it can run
        on a MapStore snapshot in a background worker while tracking
        continues (the reference runs this in its loop-closing thread)."""
        cand = self.detect(m, k_new)
        self._recent_cands.append(cand)
        if len(self._recent_cands) > max(self.cfg.consistency, 1):
            self._recent_cands.pop(0)
        if cand < 0:
            return LoopVerdict(LoopResult(False, -1, 0, 0), k_new, None)

        # consistency gate: the last `consistency` detections must all hit
        # the same map region (within a few keyframes of each other)
        recent = self._recent_cands[-self.cfg.consistency:]
        consistent = len(recent) >= self.cfg.consistency and all(
            c >= 0 and abs(c - cand) <= 4 for c in recent
        )
        if not consistent:
            return LoopVerdict(LoopResult(False, cand, 0, 0), k_new, None)

        # descriptor matches between the two keyframes
        idx, ok = match_mutual_nn(
            m.kf_desc[k_new], m.kf_desc[cand],
            m.kf_kp_valid[k_new], m.kf_kp_valid[cand],
            max_distance=60, ratio=0.9,
        )
        # keep pairs where both slots carry landmarks
        lm_new = m.kf_lm_idx[k_new]
        lm_old = m.kf_lm_idx[cand][idx]
        both = ok & (lm_new >= 0) & (lm_old >= 0)
        n_matches = int(jnp.sum(both))
        if n_matches < self.cfg.min_pair_matches:
            return LoopVerdict(LoopResult(False, cand, n_matches, 0), k_new, None)

        src = m.lm_pos[jnp.maximum(lm_new, 0)]   # drifted world positions
        dst = m.lm_pos[jnp.maximum(lm_old, 0)]   # loop-anchored positions
        S_corr, inlier = robust_sim3_from_matches(
            src, dst, both, sigma=self.cfg.sim3_sigma
        )
        n_inl = int(jnp.sum(inlier))
        if n_inl < max(
            self.cfg.min_sim3_inliers,
            int(self.cfg.min_inlier_ratio * n_matches),
        ):
            return LoopVerdict(LoopResult(False, cand, n_matches, n_inl), k_new, None)

        if self.cfg.fix_scale:
            s = float(S_corr.s)
            if abs(np.log(max(s, 1e-9))) > self.cfg.max_scale_drift:
                # a metric map cannot have drifted scale: the "loop" is bogus
                return LoopVerdict(LoopResult(False, cand, n_matches, n_inl), k_new, None)
            # rigid (scale-1) re-fit over the inliers: t = mean(dst) - R mean(src)
            wsel = inlier.astype(jnp.float32)[:, None]
            nw = jnp.maximum(jnp.sum(wsel), 1.0)
            mu_s = jnp.sum(src * wsel, 0) / nw
            mu_d = jnp.sum(dst * wsel, 0) / nw
            S_corr = Sim3(
                S_corr.R, mu_d - S_corr.R @ mu_s, jnp.float32(1.0)
            )

        self._recent_cands.clear()  # accepted: restart the consistency run
        return LoopVerdict(
            LoopResult(True, cand, n_matches, n_inl), k_new, S_corr
        )

    def apply(self, m: MapStore, verdict: LoopVerdict, cam=None) -> tuple[MapStore, LoopResult]:
        """Apply a verified closure to the (possibly newer) map. Correction
        is ONE compiled dispatch (`correct_loop`) — the host does not block;
        optional global BA is dispatched right behind it."""
        res = verdict.result
        if not res.detected:
            return m, res
        S = verdict.S_corr
        m = correct_loop(
            m,
            jnp.int32(verdict.k_new), jnp.int32(res.candidate),
            S.R, S.t, jnp.asarray(S.s, jnp.float32),
            iters=self.cfg.pose_graph_iters,
        )
        if self.cfg.global_ba_iters > 0 and cam is not None:
            from ..backend.ba import global_ba

            m, _ = global_ba(m, cam, iters=self.cfg.global_ba_iters)
        return m, res
