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
        """Detect + verify + correct. Returns (possibly updated map, result).

        cam: PinholeCamera — required only when cfg.global_ba_iters > 0."""
        cand = self.detect(m, k_new)
        self._recent_cands.append(cand)
        if len(self._recent_cands) > max(self.cfg.consistency, 1):
            self._recent_cands.pop(0)
        if cand < 0:
            return m, LoopResult(False, -1, 0, 0)

        # consistency gate: the last `consistency` detections must all hit
        # the same map region (within a few keyframes of each other)
        recent = self._recent_cands[-self.cfg.consistency:]
        consistent = len(recent) >= self.cfg.consistency and all(
            c >= 0 and abs(c - cand) <= 4 for c in recent
        )
        if not consistent:
            return m, LoopResult(False, cand, 0, 0)

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
            return m, LoopResult(False, cand, n_matches, 0)

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
            return m, LoopResult(False, cand, n_matches, n_inl)

        if self.cfg.fix_scale:
            s = float(S_corr.s)
            if abs(np.log(max(s, 1e-9))) > self.cfg.max_scale_drift:
                # a metric map cannot have drifted scale: the "loop" is bogus
                return m, LoopResult(False, cand, n_matches, n_inl)
            # rigid (scale-1) re-fit over the inliers: t = mean(dst) - R mean(src)
            wsel = inlier.astype(jnp.float32)[:, None]
            nw = jnp.maximum(jnp.sum(wsel), 1.0)
            mu_s = jnp.sum(src * wsel, 0) / nw
            mu_d = jnp.sum(dst * wsel, 0) / nw
            S_corr = Sim3(
                S_corr.R, mu_d - S_corr.R @ mu_s, jnp.float32(1.0)
            )

        self._recent_cands.clear()  # accepted: restart the consistency run
        m = self._correct(m, k_new, cand, S_corr)
        if self.cfg.global_ba_iters > 0 and cam is not None:
            from ..backend.ba import global_ba

            m, _ = global_ba(m, cam, iters=self.cfg.global_ba_iters)
        return m, LoopResult(True, cand, n_matches, n_inl)

    # ------------------------------------------------------------------

    def _correct(self, m: MapStore, k_new: int, cand: int, S_corr: Sim3) -> MapStore:
        """Pose-graph optimize and re-anchor landmarks."""
        K = m.kf_R.shape[0]
        nk = int(m.n_kf)

        node_R = m.kf_R
        node_t = m.kf_t
        node_s = jnp.ones((K,), jnp.float32)

        # sequential odometry edges (k, k+1) + covisibility edges (keyframe
        # pairs sharing enough landmarks — the engine optimizes the full
        # covisibility pose graph, not just the odometry chain) + loop edge
        E = 2 * K  # capacity: K-1 sequential + up to K covis + 1 loop, padded
        ei = np.zeros((E,), np.int32)
        ej = np.zeros((E,), np.int32)
        ew = np.zeros((E,), np.float32)
        for k in range(min(nk - 1, E - 1)):
            ei[k], ej[k], ew[k] = k, k + 1, 1.0

        # covisibility counts: shared-landmark matrix over live keyframes
        kf_lm = np.asarray(m.kf_lm_idx[:nk])
        kp_ok = np.asarray(m.kf_kp_valid[:nk]) & (kf_lm >= 0)
        P = m.lm_pos.shape[0]
        B = np.zeros((nk, P), bool)
        rows = np.repeat(np.arange(nk), kf_lm.shape[1])
        B[rows[kp_ok.reshape(-1)], kf_lm[kp_ok]] = True
        shared = (B.astype(np.float32) @ B.T.astype(np.float32)).astype(np.int32)
        iu, ju = np.triu_indices(nk, k=2)     # skip sequential neighbors
        counts = shared[iu, ju]
        strong = counts >= 30
        order = np.argsort(-counts[strong])[: K - 1]
        slot = K - 1  # covis edges occupy [K-1, 2K-2)
        for a, b in zip(iu[strong][order], ju[strong][order]):
            ei[slot], ej[slot], ew[slot] = a, b, 1.0
            slot += 1

        ei[E - 1], ej[E - 1], ew[E - 1] = cand, k_new, 2.0  # loop edge, stronger

        ei_j = jnp.asarray(ei)
        ej_j = jnp.asarray(ej)

        Si = Sim3(node_R[ei_j], node_t[ei_j], node_s[ei_j])
        Sj = Sim3(node_R[ej_j], node_t[ej_j], node_s[ej_j])
        Sm = sim3_compose(Si, sim3_inverse(Sj))  # consistent with current estimates

        # loop edge measurement: S_cand ∘ S_corr ∘ S_new⁻¹
        S_cand = Sim3(node_R[cand], node_t[cand], jnp.float32(1.0))
        S_new = Sim3(node_R[k_new], node_t[k_new], jnp.float32(1.0))
        S_loop = sim3_compose(S_cand, sim3_compose(S_corr, sim3_inverse(S_new)))
        Sm = Sim3(
            R=Sm.R.at[E - 1].set(S_loop.R),
            t=Sm.t.at[E - 1].set(S_loop.t),
            s=Sm.s.at[E - 1].set(S_loop.s),
        )

        fixed = np.zeros((K,), bool)
        fixed[0] = True
        fixed[nk:] = True  # freeze empty slots

        prob = PoseGraphProblem(
            node_R=node_R, node_t=node_t, node_s=node_s,
            edge_i=ei_j, edge_j=ej_j,
            edge_R=Sm.R, edge_t=Sm.t, edge_s=Sm.s,
            edge_weight=jnp.asarray(ew),
            node_fixed=jnp.asarray(fixed),
        )
        R2, t2, s2, _ = optimize_pose_graph(prob, iters=self.cfg.pose_graph_iters)

        # landmark re-anchoring: p' = S_f_new⁻¹( S_f_old(p) ) with world->kf
        # Sim3s of the landmark's first keyframe
        f = jnp.maximum(m.lm_first_kf, 0)
        S_old = Sim3(m.kf_R[f], m.kf_t[f], jnp.ones_like(s2[f]) * 1.0)
        S_newS = Sim3(R2[f], t2[f], s2[f])
        p_kf = sim3_apply(S_old, m.lm_pos)
        p_corr = sim3_apply(sim3_inverse(S_newS), p_kf)
        lm_pos = jnp.where(m.lm_valid[:, None], p_corr, m.lm_pos)

        # fold scale into the SE3 keyframe poses: T = (R, t/s)
        kf_R = R2
        kf_t = t2 / jnp.maximum(s2[:, None], 1e-9)
        return m._replace(kf_R=kf_R, kf_t=kf_t, lm_pos=lm_pos)
