"""Loop-closure component tests: vocabulary recall, Sim3 recovery, pose-graph
drift correction."""
import numpy as np

import jax.numpy as jnp

from lpslam_tpu.geometry.sim3 import Sim3, sim3_exp, sim3_apply, sim3_compose, sim3_inverse
from lpslam_tpu.geometry import se3_exp
from lpslam_tpu.kernels.orb import OrbParams, extract_orb
from lpslam_tpu.io.synthetic import make_texture
from lpslam_tpu.loop import (
    train_vocabulary,
    bow_vector,
    bow_similarity,
    umeyama_sim3,
    robust_sim3_from_matches,
    optimize_pose_graph,
    PoseGraphProblem,
)


def _orb_desc(img, n=256):
    f = extract_orb(jnp.asarray(img), OrbParams(num_keypoints=n, num_levels=1))
    return f.desc, f.valid


class TestVocabulary:
    def test_same_place_scores_higher(self):
        import cv2

        # three 'places'; a revisit of place 0 must out-score other places
        imgs = [make_texture(240, 320, seed=s) for s in (0, 1, 2)]
        h, w = imgs[0].shape
        M = cv2.getRotationMatrix2D((w / 2, h / 2), 5.0, 1.0)
        M[:, 2] += (4, -3)
        revisit = cv2.warpAffine(imgs[0], M, (w, h), borderValue=128)

        descs = [_orb_desc(i) for i in imgs]
        train = jnp.concatenate([d for d, _ in descs])
        vocab = train_vocabulary(np.asarray(train), n_words=256, iters=5)

        vecs = jnp.stack([bow_vector(vocab, d, v) for d, v in descs])
        dq, vq = _orb_desc(revisit)
        q = bow_vector(vocab, dq, vq)
        scores = np.asarray(bow_similarity(q, vecs))
        assert scores[0] > scores[1] + 0.1
        assert scores[0] > scores[2] + 0.1


class TestSim3Solve:
    def test_umeyama_recovers(self, rng):
        src = rng.normal(0, 2, (100, 3)).astype(np.float32)
        xi = np.zeros(7, np.float32)
        xi[:3] = [0.3, -0.2, 0.5]
        xi[3:6] = [0.1, 0.2, -0.1]
        xi[6] = np.log(1.3)
        S = sim3_exp(jnp.asarray(xi))
        dst = np.asarray(sim3_apply(S, jnp.asarray(src)))
        S_est = umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(float(S_est.s), float(S.s), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(S_est.R), np.asarray(S.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S_est.t), np.asarray(S.t), atol=1e-4)

    def test_robust_with_outliers(self, rng):
        src = rng.normal(0, 2, (200, 3)).astype(np.float32)
        S = sim3_exp(jnp.asarray([0.1, 0.0, -0.3, 0.05, -0.02, 0.1, np.log(0.9)]))
        dst = np.array(sim3_apply(S, jnp.asarray(src)))
        out = rng.random(200) < 0.25
        dst[out] += rng.uniform(1, 5, (out.sum(), 3))
        S_est, inlier = robust_sim3_from_matches(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(200, bool), sigma=0.05
        )
        assert np.asarray(inlier).sum() > 100
        np.testing.assert_allclose(float(S_est.s), float(S.s), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(S_est.t), np.asarray(S.t), atol=1e-2)


class TestPoseGraph:
    def test_loop_correction_reduces_drift(self):
        # a circle of keyframes with accumulated drift; a loop edge from last
        # to first must pull the chain closed
        K = 12
        rng = np.random.default_rng(5)
        # ground-truth poses on a circle (world->kf = inverse of kf->world)
        gt_R, gt_t = [], []
        for k in range(K):
            a = 2 * np.pi * k / K
            xi = np.asarray([np.cos(a), np.sin(a), 0, 0, 0, a], np.float32)
            T = se3_exp(jnp.asarray(xi))
            gt_R.append(np.asarray(T.R))
            gt_t.append(np.asarray(T.t))
        gt_R, gt_t = np.asarray(gt_R), np.asarray(gt_t)

        # drifted estimates: inject growing error
        est_R, est_t = gt_R.copy(), gt_t.copy()
        for k in range(1, K):
            d = se3_exp(jnp.asarray(
                np.asarray([0.02 * k, -0.015 * k, 0.01 * k, 0.004 * k, 0, 0.006 * k],
                           np.float32)))
            est_R[k] = np.asarray(d.R) @ gt_R[k]
            est_t[k] = np.asarray(d.R) @ gt_t[k] + np.asarray(d.t)

        # sequential edges measured from GROUND TRUTH (odometry was good
        # locally); loop edge K-1 -> 0 also from ground truth
        E = K
        ei = np.r_[np.arange(K - 1), [K - 1]].astype(np.int32)
        ej = np.r_[np.arange(1, K), [0]].astype(np.int32)
        ew = np.ones(E, np.float32)
        Sm_R = np.zeros((E, 3, 3), np.float32)
        Sm_t = np.zeros((E, 3), np.float32)
        Sm_s = np.ones((E,), np.float32)
        for e in range(E):
            i, j = ei[e], ej[e]
            Si = Sim3(jnp.asarray(gt_R[i]), jnp.asarray(gt_t[i]), jnp.float32(1.0))
            Sj = Sim3(jnp.asarray(gt_R[j]), jnp.asarray(gt_t[j]), jnp.float32(1.0))
            Sij = sim3_compose(Si, sim3_inverse(Sj))
            Sm_R[e] = np.asarray(Sij.R)
            Sm_t[e] = np.asarray(Sij.t)

        fixed = np.zeros(K, bool)
        fixed[0] = True
        prob = PoseGraphProblem(
            node_R=jnp.asarray(est_R), node_t=jnp.asarray(est_t),
            node_s=jnp.ones((K,), jnp.float32),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_R=jnp.asarray(Sm_R), edge_t=jnp.asarray(Sm_t),
            edge_s=jnp.asarray(Sm_s),
            edge_weight=jnp.asarray(ew),
            node_fixed=jnp.asarray(fixed),
        )
        R2, t2, s2, costs = optimize_pose_graph(prob, iters=12)

        err_before = np.linalg.norm(est_t - gt_t, axis=1).mean()
        err_after = np.linalg.norm(np.asarray(t2) - gt_t, axis=1).mean()
        assert err_after < 0.2 * err_before, (err_before, err_after)
        assert float(costs[-1]) < float(costs[0]) * 0.01


class TestVocabPersistence:
    def test_save_load_roundtrip(self, tmp_path, rng):
        from lpslam_tpu.loop import train_vocabulary, save_vocabulary, load_vocabulary, assign_words

        desc = rng.integers(0, 2**32, (512, 8), dtype=np.uint32)
        vocab = train_vocabulary(desc, n_words=64, iters=3)
        path = str(tmp_path / "vocab")
        save_vocabulary(vocab, path)
        v2 = load_vocabulary(path)
        np.testing.assert_array_equal(np.asarray(v2.words), np.asarray(vocab.words))
        a1 = np.asarray(assign_words(vocab, jnp.asarray(desc[:32])))
        a2 = np.asarray(assign_words(v2, jnp.asarray(desc[:32])))
        np.testing.assert_array_equal(a1, a2)


class TestLoopGates:
    """False-positive gates added after the room-benchmark runs showed
    one-off BoW hits corrupting metric maps (stereo/rgbd ATE 0.77/5.2 with
    loop closure vs 0.04/0.02 without)."""

    def _closer_with_stub_detect(self, consistency, cands, fix_scale=False):
        from lpslam_tpu.loop import LoopCloser, LoopConfig
        from lpslam_tpu.loop.vocab import Vocabulary

        import jax.numpy as jnp

        vocab = Vocabulary(words=jnp.zeros((4, 8), jnp.uint32),
                           words_pm1=jnp.zeros((4, 256), jnp.int8),
                           idf=jnp.ones((4,), jnp.float32))
        closer = LoopCloser(vocab, 8, LoopConfig(
            consistency=consistency, fix_scale=fix_scale))
        seq = iter(cands)
        closer.detect = lambda m, k: next(seq)
        return closer

    def test_consistency_gate_blocks_one_off_hits(self):
        from lpslam_tpu.mapstore import MapConfig, empty_map

        m = empty_map(MapConfig(max_keyframes=8, max_landmarks=64,
                                num_keypoints=16))
        # detection pattern: hit, miss, hit — never 3 consecutive
        closer = self._closer_with_stub_detect(3, [2, -1, 2, -1, 2])
        for k in range(5):
            m2, res = closer.try_close(m, k)
            assert not res.detected

    def test_consistency_gate_passes_sustained_hits(self):
        """Three consecutive detections of the same region reach the
        geometric-verification stage (which then fails on the empty map —
        n_matches gate — proving the consistency gate opened)."""
        from lpslam_tpu.mapstore import MapConfig, empty_map

        m = empty_map(MapConfig(max_keyframes=8, max_landmarks=64,
                                num_keypoints=16))
        closer = self._closer_with_stub_detect(3, [2, 2, 2])
        results = [closer.try_close(m, k)[1] for k in range(3)]
        assert not results[0].detected and not results[1].detected
        # third call passed consistency: candidate surfaces with match counts
        assert results[2].candidate == 2
