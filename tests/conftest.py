"""Test configuration: force a clean CPU JAX with an 8-device virtual mesh.

Two concerns handled here:

1. This container routes JAX through an experimental remote-TPU plugin
   (sitecustomize on PYTHONPATH) that also intercepts *CPU* compilation,
   making it slow, numerically wrong (sin/cos max-err ~1e-2), and prone to
   hangs. Tests must run on a clean local CPU backend, so if the plugin's
   site dir is on the import path we re-exec pytest once with a scrubbed
   environment.

2. Tests exercise multi-device sharding (`jax.sharding.Mesh`) without TPU pod
   hardware via 8 virtual CPU devices (`--xla_force_host_platform_device_count`),
   mirroring how the reference tests its pipeline without live cameras
   (/root/reference/src/test/SlamManagerTest.cpp builds a real SlamManager
   without start()). Real-chip benchmarks run separately via bench.py.
"""
import os
import sys

_GUARD = "LPSLAM_TPU_TEST_REEXEC"


def _needs_clean_env() -> bool:
    if os.environ.get(_GUARD):
        return False
    return any(".axon_site" in p for p in sys.path) or ".axon_site" in os.environ.get(
        "PYTHONPATH", ""
    )


def pytest_configure(config):
    if not _needs_clean_env():
        return
    env = dict(os.environ)
    env[_GUARD] = "1"
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # Restore the real stdout/stderr fds before exec so the child's output
    # isn't swallowed by the outer pytest's fd-level capture.
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
            capman.stop_global_capturing()
        except Exception:
            pass
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
