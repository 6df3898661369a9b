"""Pipeline tests — config robustness (reference SlamManagerTest parity),
record/replay round trip, manager end-to-end on a synthetic source."""
import json
import time

import numpy as np
import pytest

from lpslam_tpu.pipeline.config import (
    ConfigOptions,
    ConfigError,
    load_config_file,
    CameraConfig,
)
from lpslam_tpu.pipeline.queues import BoundedQueue, CameraQueueEntry
from lpslam_tpu.pipeline.record import RecordEngine, ReplayEngine
from lpslam_tpu.pipeline.processors import BlackoutImageProcessor, AdjustIntensityProcessor
from lpslam_tpu.io import lpslam_pb as pb


class TestConfigOptions:
    def test_required_and_defaults(self):
        schema = ConfigOptions().required("a", int).optional("b", float, 2.5)
        out = schema.parse({"a": 3})
        assert out == {"a": 3, "b": 2.5}

    def test_missing_required(self):
        with pytest.raises(ConfigError):
            ConfigOptions().required("a", int).parse({})

    def test_unknown_key_rejected(self):
        with pytest.raises(ConfigError):
            ConfigOptions().optional("a", int, 1).parse({"zzz": 1})

    def test_underscore_keys_ignored(self):
        out = ConfigOptions().optional("a", int, 1).parse({"_comment": "hi"})
        assert out == {"a": 1}

    def test_type_checking(self):
        with pytest.raises(ConfigError):
            ConfigOptions().optional("a", int, 1).parse({"a": "nope"})


class TestConfigFile:
    def test_missing_file(self, tmp_path):
        with pytest.raises(ConfigError):
            load_config_file(str(tmp_path / "nope.json"))

    def test_invalid_json(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text("{not json")
        with pytest.raises(ConfigError):
            load_config_file(str(p))

    def test_full_file(self, tmp_path):
        cfg = {
            "manager": {"record": True, "replay_chunks": 100},
            "datasources": [{"type": "Synthetic", "configuration": {"num_frames": 5}}],
            "trackers": [{"type": "VSLAM", "configuration": {"mode": "mono"}}],
            "processors": [{"type": "AdjustIntensity"}],
            "cameras": [
                {
                    "number": 0,
                    "model": "perspective",
                    "fx": 460.0, "fy": 460.0, "cx": 320.0, "cy": 240.0,
                    "distortion": [-0.28, 0.07, 0.0, 0.0, 0.0],
                    "resolution": [640, 480],
                    "fps": 20,
                }
            ],
        }
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps(cfg))
        fc = load_config_file(str(p))
        assert fc.manager.record is True
        assert fc.manager.replay_chunks == 100
        assert fc.trackers == [("VSLAM", {"mode": "mono"})]
        assert 0 in fc.cameras
        assert fc.cameras[0].model == "perspective"
        assert fc.cameras[0].distortion.size == 5

    def test_camera_validation(self):
        with pytest.raises(ConfigError):
            CameraConfig.from_json({"model": "warp-drive"})
        with pytest.raises(ConfigError):
            CameraConfig.from_json({"model": "fisheye", "distortion": [1, 2, 3]})
        with pytest.raises(ConfigError):
            CameraConfig.from_json({"model": "perspective", "bogus_key": 1})


class TestProtoWire:
    def test_camera_image_roundtrip(self):
        msg = pb.CameraImage(
            timestamp=123456789,
            image_data=b"\x01\x02\x03",
            camera_number=2,
            has_state_odom=True,
            state_odom=pb.GlobalState(
                position=pb.Vec3Sigma(x=1.5, y=-2.0, z=0.25),
                orientation=pb.Orientation(w=0.7, x=0.1, y=0.2, z=0.3),
            ),
        )
        out = pb.CameraImage.decode(msg.encode())
        assert out.timestamp == 123456789
        assert out.image_data == b"\x01\x02\x03"
        assert out.camera_number == 2
        assert out.has_state_odom
        assert out.state_odom.position.x == 1.5
        assert out.state_odom.orientation.z == 0.3

    def test_wire_matches_google_protobuf(self, tmp_path):
        """Cross-check our hand-rolled encoder against the google.protobuf
        runtime on a dynamically-built equivalent schema."""
        from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

        fdp = descriptor_pb2.FileDescriptorProto()
        fdp.name = "x.proto"
        fdp.syntax = "proto3"
        m = fdp.message_type.add()
        m.name = "SensorImu"
        f = m.field.add(); f.name = "timesTamp"; f.number = 1
        f.type = f.TYPE_INT64; f.label = f.LABEL_OPTIONAL
        v = fdp.message_type.add()
        v.name = "Vec"
        for i, nm in enumerate(["x", "y", "z"], start=1):
            fv = v.field.add(); fv.name = nm; fv.number = i
            fv.type = fv.TYPE_DOUBLE; fv.label = fv.LABEL_OPTIONAL
        f2 = m.field.add(); f2.name = "acc"; f2.number = 2
        f2.type = f2.TYPE_MESSAGE; f2.label = f2.LABEL_OPTIONAL
        f2.type_name = ".Vec"
        pool = descriptor_pool.DescriptorPool()
        pool.Add(fdp)
        cls = message_factory.GetMessageClass(pool.FindMessageTypeByName("SensorImu"))
        ref = cls()
        ref.timesTamp = 987654321
        ref.acc.x = 1.25
        ref.acc.y = -0.5
        ref.acc.z = 3.75
        ref_bytes = ref.SerializeToString()

        ours = pb.SensorImu(
            timestamp=987654321, acc=pb.Vec3Sigma(x=1.25, y=-0.5, z=3.75)
        ).encode()
        # decode each other's bytes
        dec = pb.SensorImu.decode(ref_bytes)
        assert dec.timestamp == 987654321 and dec.acc.y == -0.5
        ref2 = cls(); ref2.ParseFromString(ours)
        assert ref2.timesTamp == 987654321 and ref2.acc.z == 3.75

    def test_record_replay_roundtrip(self, tmp_path):
        path = str(tmp_path / "rec.pb")
        rec = RecordEngine(record_images=True)
        rec.set_output_file(path)
        rec.start()
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
        for i in range(5):
            rec.store_camera_image(
                CameraQueueEntry(timestamp=float(i), image=img, camera_number=1)
            )
            rec.store_imu(float(i), np.asarray([0.1, 0.2, 9.8]), np.asarray([0, 0, 0.1]))
            rec.store_result(float(i), np.asarray([i, 0.0, 0.0]), np.asarray([1.0, 0, 0, 0]))
        time.sleep(0.5)
        rec.stop()

        camq = BoundedQueue(maxsize=1000)
        sensq = BoundedQueue(maxsize=1000)
        rep = ReplayEngine(path, chunk=10)
        rep.attach(camq, sensq)
        n = rep.stream_more()
        assert n == 5
        assert rep.done or rep.stream_more() == 0
        entry = camq.pop()
        assert entry.image.shape == (48, 64)
        assert entry.camera_number == 1
        # JPEG lossy: mean error small
        assert np.abs(entry.image - img).mean() < 8.0
        sv = sensq.pop()
        assert sv.kind == "imu" and abs(sv.acc[2] - 9.8) < 1e-9


class TestProcessors:
    def test_blackout(self):
        proc = BlackoutImageProcessor({"start_frame": 1, "end_frame": 2})
        img = np.full((8, 8), 100.0, np.float32)
        e0 = proc.process_image(CameraQueueEntry(timestamp=0, image=img.copy()))
        e1 = proc.process_image(CameraQueueEntry(timestamp=1, image=img.copy()))
        assert e0.image.max() == 100.0
        assert e1.image.max() == 0.0

    def test_adjust_intensity(self):
        proc = AdjustIntensityProcessor()
        img = np.random.default_rng(0).uniform(100, 140, (32, 32)).astype(np.float32)
        out = proc.process_image(CameraQueueEntry(timestamp=0, image=img))
        assert out.image.max() > 250.0
        assert out.image.min() < 5.0


@pytest.mark.slow
class TestManagerE2E:
    def test_synthetic_mono_pipeline(self):
        from lpslam_tpu.pipeline.manager import SlamManager
        from lpslam_tpu.pipeline.config import CameraConfig

        mgr = SlamManager()
        src = mgr.add_source_by_name("Synthetic", {"num_frames": 25, "fps": 200.0})
        K = src.K
        mgr.set_camera_configuration(
            CameraConfig(number=0, fx=float(K[0, 0]), fy=float(K[1, 1]),
                         cx=float(K[0, 2]), cy=float(K[1, 2]))
        )
        mgr.add_tracker_by_name("VSLAM", {"mode": "mono", "keypoints": 512,
                                          "max_keyframes": 32, "max_landmarks": 4096})
        results = []
        mgr.on_reconstruction = results.append
        mgr.start()
        t0 = time.time()
        # wait for the worker to drain the queue (first frames pay the jit
        # compile cost), then settle
        while time.time() - t0 < 240:
            if src.done and mgr.camera_queue.empty():
                break
            time.sleep(0.2)
        time.sleep(1.0)
        st = mgr.get_status()
        mgr.stop()
        assert st.frames_processed >= 20
        n_valid = sum(1 for r in results if r.valid)
        assert n_valid > 10, (st.frames_processed, n_valid, st.localization)
        assert st.keyframes >= 2
        assert st.landmarks > 100


class TestPixelFormats:
    def test_nv12_top_bottom(self):
        from lpslam_tpu.pipeline.manager import SlamManager

        mgr = SlamManager()
        h, w = 8, 16  # stacked both-eyes frame
        y = np.arange(h * w, dtype=np.uint8)
        uv = np.full(h * w // 2, 128, np.uint8)
        buf = np.concatenate([y, uv])
        ok = mgr.add_image_from_buffer(
            0.0, buf, pixel_format="nv12", stereo_layout="top_bottom",
            width=w, height=h,
        )
        assert ok
        entry = mgr.camera_queue.pop()
        assert entry.image.shape == (4, 16)
        assert entry.image_second.shape == (4, 16)
        np.testing.assert_allclose(entry.image[0, :4], [0, 1, 2, 3])

    def test_yuyv(self):
        from lpslam_tpu.pipeline.manager import SlamManager

        mgr = SlamManager()
        h, w = 4, 8
        packed = np.zeros((h, w, 2), np.uint8)
        packed[:, :, 0] = 7   # luma
        packed[:, :, 1] = 99  # chroma
        ok = mgr.add_image_from_buffer(
            0.0, packed.reshape(-1), pixel_format="yuyv", width=w, height=h
        )
        assert ok
        entry = mgr.camera_queue.pop()
        assert entry.image.shape == (4, 8)
        assert (entry.image == 7).all()

    def test_undersized_buffer_rejected(self):
        from lpslam_tpu.pipeline.manager import SlamManager

        mgr = SlamManager()
        assert not mgr.add_image_from_buffer(
            0.0, np.zeros(10, np.uint8), pixel_format="nv12", width=16, height=8
        )


class TestFileSource:
    def test_reads_directory(self, tmp_path):
        import cv2
        from lpslam_tpu.pipeline.sources import FileImageSource
        from lpslam_tpu.pipeline.queues import BoundedQueue

        rng = np.random.default_rng(0)
        for i in range(3):
            cv2.imwrite(str(tmp_path / f"{i:03d}.png"),
                        rng.integers(0, 255, (24, 32), np.uint8))
        src = FileImageSource({"directory": str(tmp_path), "fps": 200.0})
        q = BoundedQueue(maxsize=10)
        src.start(q)
        t0 = time.time()
        got = []
        while len(got) < 3 and time.time() - t0 < 10:
            e = q.pop(timeout=0.5)
            if e is not None:
                got.append(e)
        src.stop()
        assert len(got) == 3
        assert got[0].image.shape == (24, 32)


class TestResultProcessorHook:
    def test_process_results_sees_sensor_values_and_results(self):
        """Every processor's result hook runs once per frame with that
        frame's drained sensor values and the trackers' results
        (processSensorValuesAndResults parity, SlamManager.cpp:207-227)."""
        from types import SimpleNamespace
        from lpslam_tpu.pipeline.manager import SlamManager
        from lpslam_tpu.pipeline.processors import ProcessorBase
        from lpslam_tpu.pipeline.queues import CameraQueueEntry, SensorQueueEntry

        class SpyProcessor(ProcessorBase):
            def __init__(self):
                super().__init__()
                self.calls = []

            def process_results(self, sensor_values, results):
                self.calls.append((list(sensor_values), list(results)))
                return results

        class FakeTracker:
            def start(self, sensor_queue=None):
                pass

            def stop(self):
                pass

            def process_image(self, entry, nav_odom, nav_map, sensor_values):
                return [SimpleNamespace(
                    timestamp=entry.timestamp,
                    position=np.zeros(3),
                    orientation_wxyz=np.asarray([1.0, 0, 0, 0]),
                    valid=True,
                )]

        mgr = SlamManager()
        spy = SpyProcessor()
        mgr.processors.append(spy)
        mgr.trackers.append(FakeTracker())
        mgr.sensor_queue.push(SensorQueueEntry(
            timestamp=0.5, kind="imu", acc=np.zeros(3), gyro=np.zeros(3)))
        mgr.camera_queue.push(CameraQueueEntry(
            timestamp=1.0, image=np.zeros((32, 32), np.float32)))
        mgr._work(None)
        assert len(spy.calls) == 1
        svs, results = spy.calls[0]
        assert len(svs) == 1 and svs[0].kind == "imu"
        assert len(results) == 1 and results[0].valid
        assert results[0].timestamp == 1.0
