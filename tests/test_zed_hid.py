"""ZED HID sensor stream (pipeline/zed_hid.py) against an injected device
double — no hardware. Pins the wire decode (packed RawData layout + LSB
scales, sensorcapture_def.hpp:24-96), the wall-clock timestamp re-basing
(first valid sample anchors, MCU deltas advance), IMU publication on the
sensor queue, and the once-per-second keep-alive ping."""
import struct
import time

import numpy as np

from lpslam_tpu.pipeline.queues import BoundedQueue
from lpslam_tpu.pipeline.zed_hid import (
    ZedSensorCapture,
    decode_report,
    ACC_SCALE,
    GYRO_SCALE,
    MAG_SCALE,
    TS_SCALE_NS,
    REP_ID_SENSOR_DATA,
    REP_ID_REQUEST_SET,
    RQ_CMD_PING,
)

_RAW = struct.Struct("<BBQ3h3hBBIhB3hBIBIBhIIhh")


def make_report(mcu_ts, gyro=(100, -200, 300), acc=(1000, 2000, -3000),
                imu_valid=True, mag=(16, 32, -48), temp_c=2345,
                press=101325, frame_sync=0, frame_sync_count=0):
    return _RAW.pack(
        REP_ID_SENSOR_DATA, 0 if imu_valid else 1, mcu_ts,
        *gyro, *acc,
        frame_sync, 1, frame_sync_count,
        2500, 1, *mag,
        0, 0, 0, 0,
        1, temp_c, press, 512 * 50,
        3000, 3100,
    ) + b"\x00" * (64 - _RAW.size)


class FakeHid:
    """File-like HID double: a scripted list of reports, then empty reads."""

    def __init__(self, reports):
        self.reports = list(reports)
        self.writes = []

    def read(self, n):
        if self.reports:
            return self.reports.pop(0)
        time.sleep(0.001)
        return b""

    def write(self, data):
        self.writes.append(bytes(data))


def test_decode_scales():
    raw = decode_report(make_report(mcu_ts=1000))
    assert raw is not None and raw["imu_valid"]
    np.testing.assert_allclose(
        np.asarray(raw["acc"], np.float32) * ACC_SCALE,
        np.array([1000, 2000, -3000], np.float32) * (9.8189 * 8 / 32768),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(raw["gyro"], np.float32) * GYRO_SCALE,
        np.array([100, -200, 300], np.float32) * (1000.0 / 32768), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(raw["mag"], np.float32) * MAG_SCALE, [1.0, 2.0, -3.0])
    assert raw["press"] == 101325
    # non-sensor report ids are ignored
    assert decode_report(b"\x20" + b"\x00" * 63) is None


def test_capture_rebases_timestamps_and_publishes_imu():
    # 400 Hz -> one MCU tick step of 2.5 ms = 2.5e6 / TS_SCALE_NS ticks
    step = int(round(2.5e6 / TS_SCALE_NS))
    reports = [make_report(mcu_ts=1_000_000 + i * step) for i in range(5)]
    dev = FakeHid(reports)
    q = BoundedQueue(maxsize=32)
    cap = ZedSensorCapture(device=dev)
    cap.attach(q)
    t0 = time.time()
    cap.start()
    deadline = time.time() + 5.0
    while cap.n_samples < 4 and time.time() < deadline:
        time.sleep(0.01)
    cap.stop()
    # first valid sample anchors only; the remaining 4 publish
    assert cap.n_samples == 4
    entries = []
    while not q.empty():
        entries.append(q.pop(timeout=0.1))
    assert len(entries) == 4
    ts = [e.timestamp for e in entries]
    # anchored near wall clock, spaced by the MCU delta (2.5 ms)
    assert abs(ts[0] - t0) < 2.0
    deltas = np.diff(ts)
    np.testing.assert_allclose(deltas, 2.5e-3, rtol=1e-3)
    for e in entries:
        assert e.kind == "imu"
        assert e.acc.shape == (3,) and e.gyro.shape == (3,)


def test_keepalive_ping_cadence():
    reports = [make_report(mcu_ts=1000 + i) for i in range(3)]
    dev = FakeHid(reports)
    cap = ZedSensorCapture(device=dev)
    cap._reads_since_ping = 400  # force the 1 Hz ping boundary
    cap.start()
    deadline = time.time() + 5.0
    while not dev.writes and time.time() < deadline:
        time.sleep(0.01)
    cap.stop()
    assert dev.writes and dev.writes[0] == bytes([REP_ID_REQUEST_SET,
                                                  RQ_CMD_PING])
