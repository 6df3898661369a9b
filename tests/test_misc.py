"""Checkpoint roundtrip, global BA, occupancy/laser export, facade, dataset
runner plumbing."""
import json
import subprocess
import sys
import os

import numpy as np
import pytest

import jax.numpy as jnp


class TestCheckpoint:
    def test_map_roundtrip(self, tmp_path):
        from lpslam_tpu.mapstore import MapConfig, empty_map
        from lpslam_tpu.mapstore.checkpoint import save_map, load_map

        m = empty_map(MapConfig(max_keyframes=4, max_landmarks=16, num_keypoints=8))
        m = m._replace(
            lm_pos=m.lm_pos.at[0].set(jnp.asarray([1.0, 2.0, 3.0])),
            lm_valid=m.lm_valid.at[0].set(True),
            n_lm=jnp.int32(1),
        )
        path = str(tmp_path / "map.db")
        save_map(m, path)
        m2 = load_map(path)
        assert m2 is not None
        np.testing.assert_allclose(np.asarray(m2.lm_pos[0]), [1, 2, 3])
        assert int(m2.n_lm) == 1
        assert load_map(str(tmp_path / "missing.db")) is None


class TestGlobalBA:
    def test_runs_on_small_map(self, rng):
        from lpslam_tpu.geometry import PinholeCamera, se3_exp, se3_apply, project_pinhole
        from lpslam_tpu.mapstore import MapConfig, empty_map
        from lpslam_tpu.mapstore.store import insert_keyframe_slots
        from lpslam_tpu.backend import global_ba

        cam = PinholeCamera.make(230.0, 230.0, 160.0, 120.0)
        m = empty_map(MapConfig(max_keyframes=4, max_landmarks=128, num_keypoints=64))
        pts = np.stack(
            [rng.uniform(-2, 2, 64), rng.uniform(-1.5, 1.5, 64), rng.uniform(4, 8, 64)],
            -1,
        ).astype(np.float32)
        m = m._replace(
            lm_pos=m.lm_pos.at[:64].set(jnp.asarray(pts)),
            lm_valid=m.lm_valid.at[:64].set(True),
            n_lm=jnp.int32(64),
        )
        for k in range(3):
            T = se3_exp(jnp.asarray([0.2 * k, 0, 0.05 * k, 0, 0, 0], jnp.float32))
            uv = project_pinhole(cam, se3_apply(T, jnp.asarray(pts)))
            m = insert_keyframe_slots(
                m, T.R, T.t, uv, jnp.zeros((64, 8), jnp.uint32),
                jnp.ones(64, bool), jnp.arange(64, dtype=jnp.int32), k,
            )
        m2, res = global_ba(m, cam, iters=4)
        assert float(res.final_cost) <= float(res.initial_cost) + 1e-3
        assert np.isfinite(np.asarray(m2.lm_pos[:64])).all()


class TestOccupancyLaser:
    def test_occupancy_with_laser(self):
        from lpslam_tpu.geometry import PinholeCamera
        from lpslam_tpu.pipeline.trackers import VSLAMTracker, LaserScan
        from lpslam_tpu.mapstore.store import insert_keyframe_slots

        cam = PinholeCamera.make(230.0, 230.0, 160.0, 120.0)
        tr = VSLAMTracker(cam, {"mode": "mono", "keypoints": 64,
                                "max_keyframes": 4, "max_landmarks": 128})
        m = tr.engine.map
        m = m._replace(
            lm_pos=m.lm_pos.at[0].set(jnp.asarray([1.0, 0.0, 3.0])),
            lm_valid=m.lm_valid.at[0].set(True),
            n_lm=jnp.int32(1),
        )
        m = insert_keyframe_slots(
            m, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.zeros((64, 2), jnp.float32), jnp.zeros((64, 8), jnp.uint32),
            jnp.zeros(64, bool), jnp.full((64,), -1, jnp.int32), 0,
        )
        tr.engine.map = m
        tr.add_laser_scan(LaserScan(
            timestamp=0.0, ranges=np.full(8, 2.0),
            angle_min=-0.5, angle_increment=0.125, range_max=10.0,
        ))
        occ = tr.get_occupancy_map()
        assert occ is not None
        grid = occ["grid"]
        assert (grid == 100).sum() >= 2  # landmark + laser endpoints
        assert (grid == 0).sum() >= 1    # keyframe free cell
        assert occ["cell_size"] == 0.1

    def test_laser_staleness(self):
        from lpslam_tpu.geometry import PinholeCamera
        from lpslam_tpu.pipeline.trackers import VSLAMTracker, LaserScan

        cam = PinholeCamera.make(230.0, 230.0, 160.0, 120.0)
        tr = VSLAMTracker(cam, {"mode": "mono", "keypoints": 64,
                                "max_keyframes": 4, "max_landmarks": 128,
                                "max_laser_age": 0.5})
        tr.add_laser_scan(LaserScan(0.0, np.ones(4), 0.0, 0.1, 5.0))
        tr.add_laser_scan(LaserScan(1.0, np.ones(4), 0.0, 0.1, 5.0))
        # the 0.0 scan is older than max_laser_age relative to the 1.0 scan
        assert len(tr._laser_buffer) == 1


class TestFacade:
    def test_interface_surface(self):
        from lpslam_tpu.interface import LpSlamManager
        from lpslam_tpu.pipeline.config import CameraConfig

        mgr = LpSlamManager()
        mgr.set_camera_configuration(
            CameraConfig(number=0, fx=230.0, fy=230.0, cx=160.0, cy=120.0)
        )
        assert mgr.add_image_data_source("Synthetic", {"num_frames": 2})
        assert mgr.add_tracker("VSLAM", {"mode": "mono", "keypoints": 64,
                                         "max_keyframes": 4, "max_landmarks": 256})
        assert not mgr.add_tracker("Bogus")
        assert not mgr.add_image_data_source("Bogus")
        st = mgr.get_slam_status()
        assert st.localization in ("Off", "NOT_INITIALIZED")
        mgr.add_marker(1, [0, 0, 1], [1, 0, 0, 0])
        assert mgr.mapping_get_features() == []


class TestDatasetRunner:
    def test_plumbing_on_fixture(self, tmp_path):
        import cv2
        from lpslam_tpu.eval.run_dataset import main

        root = tmp_path / "tum"
        (root / "rgb").mkdir(parents=True)
        rng = np.random.default_rng(0)
        lines = []
        for i in range(3):
            ts = 10.0 + 0.1 * i
            img = rng.integers(0, 255, (48, 64), np.uint8)
            cv2.imwrite(str(root / "rgb" / f"{i}.png"), img)
            lines.append(f"{ts} rgb/{i}.png")
        (root / "rgb.txt").write_text("\n".join(lines))

        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = main(["--tum", str(root), "--mode", "mono", "--keypoints", "64",
                       "--max-keyframes", "4", "--max-landmarks", "256"])
        assert rc == 0
        out = json.loads(buf.getvalue().strip())
        assert out["frames"] == 3


class TestLaserExtrinsics:
    def test_nav_transform_callback_applied(self):
        from lpslam_tpu.geometry import PinholeCamera
        from lpslam_tpu.pipeline.manager import SlamManager
        from lpslam_tpu.pipeline.config import CameraConfig

        mgr = SlamManager()
        mgr.set_camera_configuration(
            CameraConfig(number=0, fx=230.0, fy=230.0, cx=160.0, cy=120.0)
        )
        tr = mgr.add_tracker_by_name("VSLAM", {"mode": "mono", "keypoints": 64,
                                               "max_keyframes": 4,
                                               "max_landmarks": 128})
        calls = []

        def nav_tf(ts, frm, to):
            calls.append((ts, frm, to))
            R = np.eye(3)
            return (np.asarray([0.1, 0.0, 0.0]), R)

        mgr.request_nav_transformation = nav_tf
        mgr.add_laser_scan(1.0, np.ones(8), 0.0, 0.1, 5.0)
        assert calls == [(1.0, "laser", "camera")]
        scan = tr._laser_buffer[-1]
        assert scan.extrinsic_R is not None
        np.testing.assert_allclose(scan.extrinsic_t, [0.1, 0, 0])


class TestMappingGetFeatures:
    def _tracker_with_landmarks(self):
        import jax.numpy as jnp
        from lpslam_tpu.geometry import PinholeCamera
        from lpslam_tpu.pipeline.trackers import VSLAMTracker

        cam = PinholeCamera.make(230.0, 230.0, 160.0, 120.0)
        tr = VSLAMTracker(cam, {"mode": "mono", "keypoints": 64,
                                "max_keyframes": 4, "max_landmarks": 128})
        m = tr.engine.map
        # optical-frame positions; lpslam = (-y, x, z)
        pts = jnp.asarray([
            [1.0, -2.0, 3.0],    # lpslam (2, 1, 3)
            [-1.0, 2.0, 5.0],    # lpslam (-2, -1, 5)
            [0.5, -0.5, 9.0],    # lpslam (0.5, 0.5, 9)
        ], jnp.float32)
        m = m._replace(
            lm_pos=m.lm_pos.at[:3].set(pts),
            lm_valid=m.lm_valid.at[:3].set(True),
            lm_n_obs=m.lm_n_obs.at[:3].set(4),
            n_lm=jnp.int32(3),
        )
        tr.engine.map = m
        return tr

    def test_boundary_filters_features(self):
        """LpSlamMapBoundary parity: only landmarks whose lpslam-plane
        (y, z) fall inside top_left/bottom_right are exported, and the
        count honors the boundary (LpSlamManager.h:106-109)."""
        tr = self._tracker_with_landmarks()
        all_feats = tr.get_features()
        assert len(all_feats) == 3
        # rectangle around y in [0, 2], z in [0, 6]: keeps only lpslam
        # (2, 1, 3) — excludes (-1) y of the second and z=9 of the third
        boundary = ((0.0, 0.0), (2.0, 6.0))
        feats = tr.get_features(boundary=boundary)
        assert len(feats) == 1
        np.testing.assert_allclose(feats[0]["position"], [2.0, 1.0, 3.0])
        assert tr.get_features_count(boundary=boundary) == 1
        assert tr.get_features_count() == 3

    def test_transform_applied_on_export(self):
        """LpSlamMatrix9x9 parity: flat 9-element transform multiplies each
        lpslam-frame position (trans * p_lpslam,
        OpenVSLAMTrackerBase.cpp:401-411)."""
        tr = self._tracker_with_landmarks()
        # scale by 2 around x, swap y/z
        T = [2.0, 0, 0,
             0, 0, 1.0,
             0, 1.0, 0]
        feats = tr.get_features(transform=T)
        np.testing.assert_allclose(feats[0]["position"], [4.0, 3.0, 1.0])

    def test_max_count_truncates(self):
        tr = self._tracker_with_landmarks()
        assert len(tr.get_features(2)) == 2
