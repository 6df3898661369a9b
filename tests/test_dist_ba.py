"""Distributed BA on the 8-device virtual CPU mesh: must agree with the
single-device solver (the multi-host test strategy SURVEY.md §4 prescribes)."""
import numpy as np

import jax
import jax.numpy as jnp

from lpslam_tpu.backend import bundle_adjust
from lpslam_tpu.dist import make_mesh, distributed_bundle_adjust

from test_ba import build_problem, CAM


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_matches_single_device():
    # local rng: results must not depend on suite-wide fixture consumption
    import numpy as np
    rng = np.random.default_rng(7)
    prob, R_gt, t_gt, pts_gt = build_problem(rng)
    mesh = make_mesh(8)
    res_d = distributed_bundle_adjust(prob, CAM, mesh=mesh, iters=12)
    res_s = bundle_adjust(prob, CAM, iters=12)
    # both must converge to ground truth (identical math; iteration ordering
    # differs slightly due to cost-eval placement, so compare to GT not bitwise)
    for c in range(2, 6):
        assert np.linalg.norm(np.asarray(res_d.cam_t[c]) - t_gt[c]) < 1e-2
        assert np.linalg.norm(np.asarray(res_s.cam_t[c]) - t_gt[c]) < 1e-2
    assert float(res_d.final_cost) < float(res_d.initial_cost) * 0.05


def test_distributed_with_ragged_n():
    # N not divisible by mesh size exercises the padding path
    import numpy as np
    rng = np.random.default_rng(8)
    prob, R_gt, t_gt, _ = build_problem(rng, N=301)
    mesh = make_mesh(8)
    res = distributed_bundle_adjust(prob, CAM, mesh=mesh, iters=12)
    assert float(res.final_cost) < float(res.initial_cost) * 0.05
    for c in range(2, 6):
        assert np.linalg.norm(np.asarray(res.cam_t[c]) - t_gt[c]) < 2e-2
