"""Round-2 correctness fixes: replay state normalization, tracker-result
orientation contract, worker-thread error surfacing, NMS tie-breaking, and
wire-format interop against the reference's own generated protobuf bindings.
"""
import os
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

from lpslam_tpu.io import lpslam_pb as pb
from lpslam_tpu.pipeline.queues import (
    BoundedQueue,
    CameraQueueEntry,
    ManagedThread,
)
from lpslam_tpu.pipeline.record import (
    RecordEngine,
    ReplayEngine,
    pb_state_to_tuple,
    tuple_to_pb_state,
    _rot_to_quat_np,
    _quat_to_rot_np,
)


def _rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _rot_x(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])


class TestReplayStateNormalization:
    def test_global_state_replays_as_tuple(self, tmp_path):
        """A recorded SensorGlobalState must come back as the (position,
        rotation-matrix) tuple every live consumer expects (ADVICE r1 high)."""
        path = str(tmp_path / "rec.pb")
        rec = RecordEngine(record_images=True)
        rec.set_output_file(path)
        rec.start()
        img = np.random.default_rng(0).uniform(0, 255, (32, 48)).astype(np.float32)
        R = _rot_z(0.3) @ _rot_x(-0.2)
        q = _rot_to_quat_np(R)
        rec.store_global_state(0.5, np.array([1.0, 2.0, 3.0]), q, reference=False)
        rec.store_camera_image(CameraQueueEntry(timestamp=1.0, image=img))
        rec.stop()

        camq, senq = BoundedQueue(64), BoundedQueue(64)
        rep = ReplayEngine(path, chunk=10)
        rep.attach(camq, senq)
        rep.stream_more()

        sv = senq.pop(timeout=1.0)
        assert sv is not None and sv.kind == "global_state"
        pos, Rr = sv.state  # must unpack exactly like live-source entries
        np.testing.assert_allclose(pos, [1.0, 2.0, 3.0], atol=1e-9)
        np.testing.assert_allclose(Rr, R, atol=1e-9)

    def test_camera_image_nav_context_roundtrip(self, tmp_path):
        """state_odom/state_map recorded with each frame (CameraImage fields
        4/5/11/12, RecordEngine.cpp parity) and restored on replay."""
        path = str(tmp_path / "rec.pb")
        rec = RecordEngine(record_images=True)
        rec.set_output_file(path)
        rec.start()
        img = np.random.default_rng(1).uniform(0, 255, (32, 48)).astype(np.float32)
        odom = (np.array([0.1, -0.2, 0.3]), _rot_z(0.7))
        smap = (np.array([5.0, 6.0, 7.0]), _rot_x(0.4))
        rec.store_camera_image(
            CameraQueueEntry(timestamp=2.0, image=img, state_odom=odom, state_map=smap)
        )
        rec.stop()

        camq = BoundedQueue(16)
        rep = ReplayEngine(path, chunk=10)
        rep.attach(camq, None)
        rep.stream_more()
        entry = camq.pop(timeout=1.0)
        assert entry is not None
        pos_o, R_o = entry.state_odom
        np.testing.assert_allclose(pos_o, odom[0], atol=1e-9)
        np.testing.assert_allclose(R_o, odom[1], atol=1e-9)
        pos_m, R_m = entry.state_map
        np.testing.assert_allclose(pos_m, smap[0], atol=1e-9)
        np.testing.assert_allclose(R_m, smap[1], atol=1e-9)

    def test_replay_with_recording_enabled_through_manager(self, tmp_path, monkeypatch):
        """End-to-end regression for the r1 crash: replaying a stream that
        contains SensorGlobalState while recording is enabled must not kill
        the worker thread (manager re-records sv.state as a tuple)."""
        from lpslam_tpu.pipeline.manager import SlamManager
        from lpslam_tpu.pipeline.config import CameraConfig

        path = str(tmp_path / "rec.pb")
        rec = RecordEngine(record_images=True)
        rec.set_output_file(path)
        rec.start()
        rng = np.random.default_rng(2)
        for i in range(5):
            img = rng.uniform(0, 255, (32, 48)).astype(np.float32)
            rec.store_global_state(
                float(i), np.array([i, 0.0, 0.0]), np.array([1.0, 0, 0, 0])
            )
            rec.store_camera_image(CameraQueueEntry(timestamp=float(i) + 0.01, image=img))
        rec.stop()

        monkeypatch.chdir(tmp_path)  # recorder writes slam_<date>.pb in cwd
        mgr = SlamManager()
        mgr.set_camera_configuration(
            CameraConfig(number=0, fx=100.0, fy=100.0, cx=24.0, cy=16.0)
        )
        mgr.add_source_by_name("Replay", {"file": path})
        mgr.set_recording(True)
        mgr.start()
        deadline = time.monotonic() + 10.0
        while time.monotonic() < deadline and mgr._frames < 5:
            time.sleep(0.05)
        status = mgr.get_status()
        mgr.stop()
        assert mgr._frames >= 5, "worker thread stalled"
        assert status.error == "", f"worker raised: {status.error}"


class TestTrackerResultOrientation:
    def test_matches_reference_component_swap(self):
        """createTrackerResult contract: q = quat(rot_cw) with (w,-y,x,z)
        swap; position = lpslam swap of the camera center."""
        from lpslam_tpu.pipeline.trackers import create_tracker_result_pose

        # rotation about optical z by theta: quat = (cos t/2, 0, 0, sin t/2)
        theta = 0.6
        R = _rot_z(theta).astype(np.float32)
        t = np.array([1.0, 2.0, 3.0], np.float32)
        pos, q = create_tracker_result_pose(R, t)
        center = -R.T @ t
        np.testing.assert_allclose(pos, [-center[1], center[0], center[2]], atol=1e-6)
        np.testing.assert_allclose(
            q, [np.cos(theta / 2), 0.0, 0.0, np.sin(theta / 2)], atol=1e-6
        )

        # rotation about optical x: quat (c, s, 0, 0) -> swapped (c, 0, s, 0)
        R = _rot_x(theta).astype(np.float32)
        pos, q = create_tracker_result_pose(R, np.zeros(3, np.float32))
        np.testing.assert_allclose(
            q, [np.cos(theta / 2), 0.0, np.sin(theta / 2), 0.0], atol=1e-6
        )

    def test_quat_helpers_roundtrip(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            R = _quat_to_rot_np(*q)
            q2 = _rot_to_quat_np(R)
            # q and -q are the same rotation
            assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-9


class TestManagedThreadErrors:
    def test_exception_does_not_kill_worker(self):
        calls = []

        def fn(thread):
            calls.append(1)
            if len(calls) == 1:
                raise RuntimeError("boom")
            time.sleep(0.005)

        t = ManagedThread(fn, name="t")
        t.start()
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline and len(calls) < 3:
            time.sleep(0.01)
        t.stop()
        assert len(calls) >= 3, "thread died after first exception"
        assert isinstance(t.error, RuntimeError)
        assert t.error_count == 1


class TestNmsTieBreak:
    def test_plateau_maxima_all_survive_deterministically(self):
        """Plateau policy (see nms3x3 docstring): equal maxima all survive;
        the result is a pure function of the score map."""
        import jax.numpy as jnp
        from lpslam_tpu.kernels.fast import nms3x3

        score = np.zeros((12, 12), np.float32)
        score[5, 5] = score[5, 6] = score[6, 5] = score[6, 6] = 7.0  # 2x2 plateau
        out1 = np.asarray(nms3x3(jnp.asarray(score)))
        out2 = np.asarray(nms3x3(jnp.asarray(score)))
        np.testing.assert_array_equal(out1, out2)
        assert (out1 > 0).sum() == 4
        # a strictly-greater neighbor still kills the whole plateau
        score[5, 4] = 8.0
        out3 = np.asarray(nms3x3(jnp.asarray(score)))
        assert out3[5, 5] == 0.0 and out3[6, 5] == 0.0

    def test_strict_maximum_survives(self):
        import jax.numpy as jnp
        from lpslam_tpu.kernels.fast import nms3x3

        score = np.zeros((10, 10), np.float32)
        score[4, 4] = 5.0
        score[4, 5] = 4.0
        out = np.asarray(nms3x3(jnp.asarray(score)))
        assert out[4, 4] == 5.0 and out[4, 5] == 0.0


REF_PB2_DIR = "/root/reference/src/Serialize"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_PB2_DIR, "SlamSerialize_pb2.py")),
    reason="reference tree not present",
)
class TestReferenceBindingInterop:
    """Decode/encode against the reference's OWN generated SlamSerialize_pb2
    (run in a subprocess with the pure-python protobuf implementation, since
    the generated file predates protoc 3.19)."""

    def _run_ref(self, script: str) -> str:
        env = dict(os.environ)
        env["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
        env.pop("PYTHONPATH", None)
        out = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, env=env, timeout=120,
        )
        assert out.returncode == 0, out.stderr
        return out.stdout.strip()

    def test_reference_decodes_our_bytes(self, tmp_path):
        ours = pb.CameraImage(
            timestamp=1_700_000_000_123_456_789,
            data_number=7,
            image_data=b"\x11\x22\x33",
            camera_number=2,
            has_state_odom=True,
            state_odom=pb.GlobalState(
                position=pb.Vec3Sigma(x=1.5, y=-2.25, z=0.125),
                orientation=pb.Orientation(w=0.5, x=0.5, y=-0.5, z=0.5),
            ),
        ).encode()
        blob = tmp_path / "ours.bin"
        blob.write_bytes(ours)
        out = self._run_ref(textwrap.dedent(f"""
            import sys
            sys.path.insert(0, {REF_PB2_DIR!r})
            import SlamSerialize_pb2 as ref
            m = ref.CameraImage()
            m.ParseFromString(open({str(blob)!r}, 'rb').read())
            print(m.timeStamp, m.dataNumber, m.cameraNumber,
                  m.imageData.hex(), m.hasGlobalState_odom,
                  m.state_odom.position.x, m.state_odom.orientation.y)
        """))
        parts = out.split()
        assert parts[0] == "1700000000123456789"
        assert parts[1] == "7" and parts[2] == "2"
        assert parts[3] == "112233"
        assert parts[4] == "True"
        assert float(parts[5]) == 1.5 and float(parts[6]) == -0.5

    def test_we_decode_reference_bytes(self, tmp_path):
        blob = tmp_path / "ref.bin"
        self._run_ref(textwrap.dedent(f"""
            import sys
            sys.path.insert(0, {REF_PB2_DIR!r})
            import SlamSerialize_pb2 as ref
            m = ref.SensorGlobalState()
            m.timesTamp = 42_000_000_000
            m.globalState.position.x = -3.5
            m.globalState.position.z = 9.75
            m.globalState.orientation.w = 0.8
            m.globalState.orientation.x = 0.6
            m.reference = True
            open({str(blob)!r}, 'wb').write(m.SerializeToString())
            print('ok')
        """))
        dec = pb.SensorGlobalState.decode(blob.read_bytes())
        assert dec.timestamp == 42_000_000_000
        assert dec.state.position.x == -3.5
        assert dec.state.position.z == 9.75
        assert dec.state.orientation.w == 0.8
        assert dec.state.orientation.x == 0.6
        assert dec.reference is True

    def test_framed_stream_reference_roundtrip(self, tmp_path):
        """Full framed .pb stream written by us, decoded message-by-message
        with the reference bindings (ProtoStream framing parity)."""
        path = tmp_path / "stream.pb"
        w = pb.ProtoStreamWriter(str(path))
        w.write(pb.MSG_SENSOR_IMU, pb.SensorImu(
            timestamp=5, acc=pb.Vec3Sigma(x=0.5), gyro=pb.Vec3Sigma(z=-1.5)))
        w.write(pb.MSG_RESULT, pb.GlobalStateInTime(
            timestamp=6, state=pb.GlobalState(position=pb.Vec3Sigma(y=2.5))))
        w.close()
        out = self._run_ref(textwrap.dedent(f"""
            import struct, sys
            sys.path.insert(0, {REF_PB2_DIR!r})
            import SlamSerialize_pb2 as ref
            f = open({str(path)!r}, 'rb')
            t1, n1 = struct.unpack('<QQ', f.read(16))
            imu = ref.SensorImu(); imu.ParseFromString(f.read(n1))
            t2, n2 = struct.unpack('<QQ', f.read(16))
            res = ref.GlobalStateInTime(); res.ParseFromString(f.read(n2))
            print(t1, imu.timesTamp, imu.acc.x, imu.gyro.z,
                  t2, res.timeStamp, res.globalState.position.y)
        """))
        parts = out.split()
        # framing ids: SensorImu=2, Result(GlobalStateInTime)=4 (MessageTypes.h)
        assert parts[:4] == ["2", "5", "0.5", "-1.5"]
        assert parts[4:] == ["4", "6", "2.5"]
