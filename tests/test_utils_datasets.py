"""Utils (transformations/PID/timing) and dataset-reader tests.

Transformations tests mirror the reference's TransformationsTest.cpp cases:
tracker→origin, marker→global, vehicle-from-marker round trips.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from lpslam_tpu.utils import (
    tracker_to_origin,
    marker_to_global,
    vehicle_pose_from_marker_measurement,
    PidController,
    ScopeTimer,
    TimingStats,
    to_rad,
    to_degree,
)
from lpslam_tpu.geometry.so3 import so3_exp, rot_to_quat
from lpslam_tpu.io.datasets import TumRgbdDataset, EurocDataset


def rand_quat(rng):
    w = rng.standard_normal(3) * 0.8
    return np.asarray(rot_to_quat(so3_exp(jnp.asarray(w, jnp.float32))))


class TestTransformations:
    def test_tracker_to_origin_identity(self, rng):
        p, q = tracker_to_origin(
            [1, 2, 3], [1, 0, 0, 0], [0, 0, 0], [1, 0, 0, 0]
        )
        np.testing.assert_allclose(p, [1, 2, 3], atol=1e-6)

    def test_marker_roundtrip(self, rng):
        # place a marker in the vehicle frame, lift to global, then recover
        # the vehicle pose from the same measurement
        vq = rand_quat(rng)
        vp = rng.standard_normal(3)
        mq = rand_quat(rng)
        mp = rng.standard_normal(3)
        g_pos, g_q = marker_to_global(mp, mq, vp, vq)
        r_pos, r_q = vehicle_pose_from_marker_measurement(g_pos, g_q, mp, mq)
        np.testing.assert_allclose(r_pos, vp, atol=1e-4)
        sign = np.sign(r_q[0]) * np.sign(vq[0]) or 1.0
        np.testing.assert_allclose(r_q * sign, vq, atol=1e-4)


class TestPid:
    def test_converges(self):
        pid = PidController(kp=0.5, ki=0.1, out_min=-1, out_max=1)
        x = 0.0
        target = 2.0
        for _ in range(200):
            u = pid.update(target - x, 0.1)
            x += u * 0.1
        assert abs(x - target) < 0.1


class TestTiming:
    def test_scope_timer(self):
        stats = TimingStats()
        with ScopeTimer("op", stats):
            sum(range(1000))
        assert stats.mean("op") > 0


class TestMath:
    def test_rad_degree(self):
        assert abs(to_rad(180.0) - np.pi) < 1e-9
        assert abs(to_degree(np.pi / 2) - 90.0) < 1e-9


class TestTumReader:
    def test_reads_fixture(self, tmp_path):
        import cv2

        root = tmp_path / "tum"
        (root / "rgb").mkdir(parents=True)
        (root / "depth").mkdir()
        rng = np.random.default_rng(0)
        rgb_lines, depth_lines = ["# comment"], ["# comment"]
        for i in range(3):
            ts = 1000.0 + i * 0.05
            img = rng.integers(0, 255, (24, 32), np.uint8)
            cv2.imwrite(str(root / "rgb" / f"{ts:.6f}.png"), img)
            d = (rng.uniform(0.5, 3.0, (24, 32)) * 5000).astype(np.uint16)
            cv2.imwrite(str(root / "depth" / f"{ts:.6f}.png"), d)
            rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
            depth_lines.append(f"{ts + 0.004:.6f} depth/{ts:.6f}.png")
        (root / "rgb.txt").write_text("\n".join(rgb_lines))
        (root / "depth.txt").write_text("\n".join(depth_lines))
        (root / "groundtruth.txt").write_text(
            "# ts tx ty tz qx qy qz qw\n"
            "1000.0 1 2 3 0 0 0 1\n1000.1 1.1 2 3 0 0 0 1\n"
        )

        ds = TumRgbdDataset(str(root))
        frames = list(ds)
        assert len(frames) == 3
        assert frames[0].image.shape == (24, 32)
        assert frames[0].depth is not None
        assert 0.4 < frames[0].depth.mean() < 3.1  # scaled to meters
        gt = ds.ground_truth()
        assert gt is not None
        np.testing.assert_allclose(gt.positions[0], [1, 2, 3])
        assert gt.quaternions_wxyz[0][0] == 1.0  # w first

    def test_missing_dir_is_empty(self, tmp_path):
        ds = TumRgbdDataset(str(tmp_path / "nope"))
        assert len(ds) == 0


class TestEurocReader:
    def test_reads_fixture(self, tmp_path):
        import cv2

        root = tmp_path / "euroc"
        for cam in ("cam0", "cam1"):
            (root / "mav0" / cam / "data").mkdir(parents=True)
        gt_dir = root / "mav0" / "state_groundtruth_estimate0"
        gt_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        rows0, rows1 = ["#ts,filename"], ["#ts,filename"]
        for i in range(2):
            ts = 1403636579763555584 + i * 50000000
            img = rng.integers(0, 255, (24, 32), np.uint8)
            for cam, rows in (("cam0", rows0), ("cam1", rows1)):
                cv2.imwrite(str(root / "mav0" / cam / "data" / f"{ts}.png"), img)
                rows.append(f"{ts},{ts}.png")
        (root / "mav0" / "cam0" / "data.csv").write_text("\n".join(rows0))
        (root / "mav0" / "cam1" / "data.csv").write_text("\n".join(rows1))
        (gt_dir / "data.csv").write_text(
            "#ts,px,py,pz,qw,qx,qy,qz\n"
            f"{1403636579763555584},4.68,-1.78,0.8,1,0,0,0\n"
        )
        ds = EurocDataset(str(root))
        frames = list(ds)
        assert len(frames) == 2
        assert frames[0].image_right is not None
        gt = ds.ground_truth()
        np.testing.assert_allclose(gt.positions[0], [4.68, -1.78, 0.8])
