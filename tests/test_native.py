"""Native C++ module tests: build, queue semantics + threading, framed stream
IO interop with the Python codec, FAST detector vs the JAX kernel."""
import threading
import time

import numpy as np
import pytest

from lpslam_tpu.native import get_native


@pytest.fixture(scope="module")
def native():
    mod = get_native()
    if mod is None:
        pytest.skip("native toolchain unavailable")
    return mod


class TestBoundedQueue:
    def test_fifo(self, native):
        q = native.BoundedQueue(maxsize=4)
        for i in range(3):
            assert q.push(i)
        assert q.qsize() == 3
        assert [q.pop() for _ in range(3)] == [0, 1, 2]
        assert q.pop(timeout=0.05) is None

    def test_drop_oldest(self, native):
        q = native.BoundedQueue(maxsize=2)
        q.push(1)
        q.push(2)
        q.push(3, drop_oldest=True)
        assert q.pop() == 2
        assert q.pop() == 3

    def test_blocking_producer_consumer(self, native):
        q = native.BoundedQueue(maxsize=8)
        received = []

        def consumer():
            while True:
                item = q.pop(timeout=2.0)
                if item is None or item == "stop":
                    break
                received.append(item)

        t = threading.Thread(target=consumer)
        t.start()
        for i in range(100):
            q.push(i)
        q.push("stop")
        t.join(timeout=5)
        assert received == list(range(100))

    def test_qsize_poll_vs_blocking_pop_no_deadlock(self, native):
        """Regression: a GIL-holding qsize() poll concurrent with a
        GIL-releasing pop() must not deadlock. The original queue kept the
        mutex locked across GIL reacquisition (unique_lock destructing after
        Py_END_ALLOW_THREADS), so a popping thread holding the mutex while
        waiting for the GIL deadlocked against a qsize() caller holding the
        GIL while waiting for the mutex — exactly RecordEngine.stop()'s
        drain loop (`while not q.empty()`) against its record worker."""
        q = native.BoundedQueue(maxsize=64)
        done = threading.Event()

        def consumer():
            while not done.is_set():
                q.pop(timeout=0.05)

        def producer():
            i = 0
            while not done.is_set():
                q.push(i, timeout=0.0, drop_oldest=True)
                i += 1

        threads = [threading.Thread(target=consumer, daemon=True),
                   threading.Thread(target=producer, daemon=True)]
        for t in threads:
            t.start()
        # hammer qsize from the main thread (the GIL-held mutex acquisition)
        deadline = time.monotonic() + 2.0
        polls = 0
        while time.monotonic() < deadline:
            q.qsize()
            polls += 1
        done.set()
        for t in threads:
            t.join(timeout=5)
        assert not any(t.is_alive() for t in threads), (
            f"queue deadlocked after {polls} qsize polls"
        )
        assert polls > 1000  # the poller itself must not have stalled

    def test_close_unblocks(self, native):
        q = native.BoundedQueue(maxsize=2)
        out = []

        def waiter():
            out.append(q.pop(timeout=10.0))

        t = threading.Thread(target=waiter)
        t.start()
        time.sleep(0.1)
        q.close()
        t.join(timeout=3)
        assert not t.is_alive()
        assert out == [None]


class TestStream:
    def test_roundtrip_and_python_interop(self, native, tmp_path):
        from lpslam_tpu.io import lpslam_pb as pb

        path = str(tmp_path / "native.pb")
        w = native.StreamWriter(path)
        msg = pb.SensorImu(timestamp=42, acc=pb.Vec3Sigma(x=1.0, y=2.0, z=3.0))
        w.write(pb.MSG_SENSOR_IMU, msg.encode())
        w.write(7, b"rawpayload")  # unknown type passthrough
        w.close()

        # native reader
        r = native.StreamReader(path)
        t1, p1 = r.read()
        assert t1 == pb.MSG_SENSOR_IMU
        dec = pb.SensorImu.decode(p1)
        assert dec.timestamp == 42 and dec.acc.z == 3.0
        t2, p2 = r.read()
        assert (t2, p2) == (7, b"rawpayload")
        assert r.read() is None

        # python reader reads the native file
        with pb.ProtoStreamReader(path) as pr:
            t, m = next(pr)
            assert t == pb.MSG_SENSOR_IMU and m.acc.y == 2.0

    def test_size_cap(self, native, tmp_path):
        w = native.StreamWriter(str(tmp_path / "x.pb"))
        with pytest.raises(ValueError):
            w.write(1, b"x" * 6_000_000)


class TestFastDetect:
    def test_matches_jax_kernel(self, native):
        import jax.numpy as jnp

        from lpslam_tpu.io.synthetic import make_texture
        from lpslam_tpu.kernels.fast import fast_score

        img = make_texture(120, 160, seed=6)
        img8 = np.clip(img, 0, 255).astype(np.uint8)
        corners = native.fast_detect(img8.tobytes(), 160, 120, 20.0)
        assert len(corners) > 20
        _, is_corner = fast_score(jnp.asarray(img8.astype(np.float32)), 20.0)
        ref = {(x, y) for y, x in np.argwhere(np.asarray(is_corner))}
        ours = {(x, y) for x, y, _ in corners}
        inter = len(ref & ours)
        union = len(ref | ours)
        assert inter / union > 0.95, (inter, union)
