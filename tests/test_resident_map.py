"""Persistent sharded map residency (dist/resident.py) on the virtual mesh.

BASELINE config 5 / SURVEY §5: the MapStore's keyframe blocks LIVE across the
mesh between operations (trajectory-contiguous NamedSharding), local BA
halo-exchanges only the window-boundary keyframe rows, loop scoring reads
device-local BoW rows, global BA consumes the resident blocks in place.
Pins: residency invariants after every op, exact agreement with the
single-device solvers, and mesh-size solution identity.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpslam_tpu.geometry import PinholeCamera, se3_exp
from lpslam_tpu.mapstore import MapConfig, empty_map
from lpslam_tpu.backend.ba import local_ba
from lpslam_tpu.dist import make_mesh, ResidentMap

CAM = PinholeCamera.make(460.0, 460.0, 160.0, 120.0)
CFG = MapConfig(max_keyframes=16, max_landmarks=256, num_keypoints=64)


def _payloads(C=10, Pn=200, N=64, noise=0.02, seed=0):
    """C keyframe payloads observing a shared landmark field."""
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-2, 2, Pn), rng.uniform(-1.5, 1.5, Pn),
         rng.uniform(4, 8, Pn)], -1,
    ).astype(np.float32)
    xis = np.asarray(
        [[0.08 * c, 0.02 * c, 0.01 * c, 0.005 * c, -0.004 * c, 0.0]
         for c in range(C)], np.float32)
    T = se3_exp(jnp.asarray(xis))
    R_gt, t_gt = np.asarray(T.R), np.asarray(T.t)
    kfs = []
    for c in range(C):
        p_c = pts @ R_gt[c].T + t_gt[c]
        uv = np.stack([460 * p_c[:, 0] / p_c[:, 2] + 160,
                       460 * p_c[:, 1] / p_c[:, 2] + 120], -1)
        sel = rng.permutation(Pn)[:N]
        t0 = t_gt[c] if c < 2 else t_gt[c] + rng.normal(0, noise, 3)
        kfs.append(dict(
            R=R_gt[c], t=t0.astype(np.float32),
            uv=(uv[sel] + rng.normal(0, 0.3, (N, 2))).astype(np.float32),
            desc=rng.integers(0, 2**32, (N, 8), dtype=np.uint32),
            kp_valid=np.ones(N, bool), lm_idx=sel.astype(np.int32),
            frame_id=c * 3,
        ))
    pts0 = pts + rng.normal(0, noise, pts.shape).astype(np.float32)
    return kfs, pts0, pts, t_gt


def _seed_landmarks(rm: ResidentMap, pts0, n_obs=3):
    Pn = len(pts0)
    m = rm.m._replace(
        lm_pos=rm.m.lm_pos.at[:Pn].set(jnp.asarray(pts0)),
        lm_valid=rm.m.lm_valid.at[:Pn].set(True),
        lm_n_obs=rm.m.lm_n_obs.at[:Pn].set(n_obs),
        n_lm=jnp.int32(Pn),
    )
    rm.put(m)


def _build(mesh_n, kfs, pts0, vocab_words=0, seed_db=None):
    rm = ResidentMap(make_mesh(mesh_n, axis_name="kf"), CFG,
                     vocab_words=vocab_words)
    _seed_landmarks(rm, pts0)
    for i, kf in enumerate(kfs):
        bow = None if seed_db is None else seed_db[i]
        rm.insert_keyframe(kf["R"], kf["t"], kf["uv"], kf["desc"],
                           kf["kp_valid"], kf["lm_idx"], kf["frame_id"],
                           bow_vec=bow)
    return rm


def test_insert_preserves_residency_and_values():
    kfs, pts0, _, _ = _payloads()
    rm = _build(8, kfs, pts0)
    assert rm.residency_ok()
    assert int(rm.m.n_kf) == len(kfs)
    # slot values land where they should, across shard boundaries
    for i in (0, 3, 9):
        np.testing.assert_allclose(np.asarray(rm.m.kf_t[i]), kfs[i]["t"],
                                    atol=1e-6)
        assert int(rm.m.kf_frame_id[i]) == kfs[i]["frame_id"]


@pytest.mark.slow
def test_local_ba_matches_single_device_solver():
    """The halo-exchange window BA must equal backend.ba.local_ba's
    temporal-window solve bit-for-bit in configuration (same window, same
    compaction, same solver) — and be mesh-size independent."""
    kfs, pts0, pts_gt, t_gt = _payloads()
    results = []
    for n in (1, 2, 4, 8):
        rm = _build(n, kfs, pts0)
        rm.local_ba(CAM, iters=6)
        assert rm.residency_ok()
        results.append(np.asarray(rm.m.kf_t))
    # reference: plain local_ba on the unsharded store
    ref_rm = _build(1, kfs, pts0)
    m_ref, res = local_ba(ref_rm.m, CAM, window=6, iters=6,
                          covisibility=False)
    ref_t = np.asarray(m_ref.kf_t)
    for r in results:
        np.testing.assert_allclose(r, ref_t, atol=2e-4)
    # the window solve made real progress on its objective
    assert float(res.final_cost) < float(res.initial_cost)


def test_loop_scores_on_resident_db():
    rng = np.random.default_rng(1)
    kfs, pts0, _, _ = _payloads()
    W = 64
    db_rows = rng.uniform(0, 1, (len(kfs), W)).astype(np.float32)
    rm = _build(8, kfs, pts0, vocab_words=W, seed_db=db_rows)
    assert rm.residency_ok()
    q = rng.uniform(0, 1, (W,)).astype(np.float32)
    got = np.asarray(rm.loop_scores(jnp.asarray(q)))[:len(kfs)]
    dn = db_rows / np.linalg.norm(db_rows, axis=1, keepdims=True)
    want = dn @ (q / np.linalg.norm(q))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_full_resident_sequence_mesh_invariance():
    """insert -> local BA -> loop score -> global BA against the PERSISTENT
    resident store: the whole sequence is mesh-size invariant and keeps the
    residency invariant at every step."""
    rng = np.random.default_rng(2)
    kfs, pts0, _, t_gt = _payloads()
    W = 32
    db_rows = rng.uniform(0, 1, (len(kfs), W)).astype(np.float32)
    finals = []
    for n in (1, 2, 8):
        rm = _build(n, kfs, pts0, vocab_words=W, seed_db=db_rows)
        rm.local_ba(CAM, iters=4)
        assert rm.residency_ok()
        s = rm.loop_scores(jnp.asarray(db_rows[-1]))
        assert np.isfinite(np.asarray(s)[:len(kfs)]).all()
        rm.global_ba(CAM, iters=8, cg_iters=20)
        assert rm.residency_ok()
        finals.append(np.asarray(rm.m.kf_t))
    for f in finals[1:]:
        np.testing.assert_allclose(f, finals[0], atol=3e-4)
    # and it converged toward the ground truth
    nk = len(kfs)
    err = np.linalg.norm(finals[0][:nk] - t_gt, axis=1)
    assert err.max() < 0.02, err
