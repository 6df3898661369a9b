"""Keyframe-axis-sharded global BA (distributed Schur-CG) and distributed
loop scoring on the 8-device virtual mesh: correctness vs the single-device
dense solver, mesh-size invariance, and padding."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpslam_tpu.geometry import PinholeCamera, se3_exp
from lpslam_tpu.backend.ba import BAProblem, bundle_adjust
from lpslam_tpu.dist import make_mesh
from lpslam_tpu.dist.sharded_map import (
    sharded_global_ba_problem,
    sharded_global_ba,
    sharded_bow_scores,
)

CAM = PinholeCamera.make(460.0, 460.0, 160.0, 120.0)


def _make_problem(C=16, Pn=256, N=64, noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-2, 2, Pn), rng.uniform(-1.5, 1.5, Pn), rng.uniform(4, 8, Pn)],
        -1,
    ).astype(np.float32)
    xis = np.asarray(
        [[0.08 * c, 0.02 * c, 0.01 * c, 0.005 * c, -0.004 * c, 0.0] for c in range(C)],
        np.float32,
    )
    T = se3_exp(jnp.asarray(xis))
    R_gt, t_gt = np.asarray(T.R), np.asarray(T.t)
    obs_lm = np.full((C, N), -1, np.int32)
    obs_uv = np.zeros((C, N, 2), np.float32)
    for c in range(C):
        p_c = pts @ R_gt[c].T + t_gt[c]
        uv = np.stack(
            [460 * p_c[:, 0] / p_c[:, 2] + 160, 460 * p_c[:, 1] / p_c[:, 2] + 120],
            -1,
        )
        sel = rng.permutation(Pn)[:N]
        obs_lm[c] = sel
        obs_uv[c] = uv[sel] + rng.normal(0, 0.3, (N, 2))
    # perturb initial state
    t0 = t_gt + rng.normal(0, noise, t_gt.shape).astype(np.float32)
    pts0 = pts + rng.normal(0, noise, pts.shape).astype(np.float32)
    cam_fixed = np.zeros((C,), bool)
    cam_fixed[:2] = True
    t0[:2] = t_gt[:2]
    return (
        BAProblem(
            cam_R=jnp.asarray(R_gt),
            cam_t=jnp.asarray(t0),
            points=jnp.asarray(pts0),
            obs_lm=jnp.asarray(obs_lm),
            obs_uv=jnp.asarray(obs_uv),
            obs_sigma2=jnp.ones((C, N), jnp.float32),
            cam_fixed=jnp.asarray(cam_fixed),
            point_valid=jnp.ones((Pn,), bool),
        ),
        t_gt,
        pts,
    )


class TestShardedGlobalBA:
    def test_converges_to_ground_truth(self):
        prob, t_gt, pts_gt = _make_problem()
        mesh = make_mesh(8)
        res = sharded_global_ba_problem(prob, CAM, mesh=mesh, iters=8, cg_iters=20)
        assert float(res.final_cost) < float(res.initial_cost) * 0.05
        err = np.linalg.norm(np.asarray(res.cam_t) - t_gt, axis=1)
        assert err.max() < 0.02, err.max()

    def test_matches_dense_solver(self):
        """The distributed Schur-CG must land where the dense single-device
        Schur solve lands (same objective, same staging)."""
        prob, t_gt, _ = _make_problem(seed=3)
        dense = bundle_adjust(prob, CAM, iters=10)
        mesh = make_mesh(8)
        shard = sharded_global_ba_problem(prob, CAM, mesh=mesh, iters=10, cg_iters=25)
        d_t = np.linalg.norm(np.asarray(dense.cam_t) - t_gt, axis=1).max()
        s_t = np.linalg.norm(np.asarray(shard.cam_t) - t_gt, axis=1).max()
        # both converge; distributed within 2x of dense's error (CG inexactness)
        assert s_t < max(2.0 * d_t, 5e-3), (s_t, d_t)

    @pytest.mark.slow
    def test_mesh_size_invariance(self):
        """1, 2, 4, 8 devices produce the same solution (collectives are
        exact reductions — layout must not change the math)."""
        prob, _, _ = _make_problem(seed=5)
        sols = []
        for n in (1, 2, 4, 8):
            res = sharded_global_ba_problem(
                prob, CAM, mesh=make_mesh(n), iters=4, cg_iters=12
            )
            sols.append(np.asarray(res.cam_t))
        for s in sols[1:]:
            np.testing.assert_allclose(s, sols[0], atol=2e-4)

    def test_camera_axis_padding(self):
        """C not divisible by the mesh size gets padded with fixed cameras."""
        prob, t_gt, _ = _make_problem(C=13, seed=7)
        res = sharded_global_ba_problem(prob, CAM, mesh=make_mesh(8), iters=6)
        assert res.cam_t.shape[0] >= 13
        err = np.linalg.norm(np.asarray(res.cam_t)[:13] - t_gt, axis=1)
        assert err.max() < 0.05


class TestShardedMapStoreBA:
    @pytest.mark.slow
    def test_global_ba_over_mapstore(self):
        """End-to-end: build a tracker map on synthetic data, run the
        keyframe-sharded global BA over the whole MapStore, landmarks and
        keyframes improve (cost drops) without corrupting the store."""
        from lpslam_tpu.io.synthetic import make_sequence
        from lpslam_tpu.frontend.tracker import MonoTracker, TrackerConfig
        from lpslam_tpu.kernels.orb import OrbParams
        from lpslam_tpu.mapstore import MapConfig

        seq = make_sequence(num_frames=25, h=240, w=320, seed=8, motion="orbit")
        cam = PinholeCamera.make(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
        cfg = TrackerConfig(
            orb=OrbParams(num_keypoints=384, num_levels=2),
            map_cfg=MapConfig(max_keyframes=16, max_landmarks=4096, num_keypoints=384),
        )
        tr = MonoTracker(cam, cfg)
        for t in range(len(seq.images)):
            tr.process(seq.images[t])
        nk = tr.n_keyframes
        assert nk >= 4
        m2, res = sharded_global_ba(tr.map, cam, mesh=make_mesh(8), iters=6)
        assert float(res.final_cost) <= float(res.initial_cost)
        assert np.isfinite(np.asarray(m2.kf_t)[:nk]).all()
        assert int(m2.n_kf) == nk


class TestShardedBowScores:
    def test_matches_replicated_scoring(self):
        rng = np.random.default_rng(0)
        db = jnp.asarray(rng.uniform(0, 1, (37, 64)).astype(np.float32))
        q = jnp.asarray(rng.uniform(0, 1, (64,)).astype(np.float32))
        got = np.asarray(sharded_bow_scores(db, q, mesh=make_mesh(8)))
        dn = np.asarray(db) / np.linalg.norm(db, axis=1, keepdims=True)
        want = dn @ (np.asarray(q) / np.linalg.norm(q))
        np.testing.assert_allclose(got, want, atol=1e-5)
