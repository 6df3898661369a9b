"""Native runtime components (C++17), built on first import with g++.

Exposes (when the toolchain is available):
- BoundedQueue: GIL-releasing bounded queue (TBB-queue role);
- StreamWriter / StreamReader: framed record-stream IO;
- fast_detect: host-side FAST-9/16 corner detector.

`get_native()` returns the module or None (callers fall back to the pure-
Python equivalents — capability is identical, the native path is faster and
GIL-friendlier).
"""
from __future__ import annotations

import hashlib
import importlib.util
import os
import subprocess
import sys
import sysconfig
from typing import Optional

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "module.cpp")
_BUILD = os.path.join(_HERE, "_build")

_cached = None
_tried = False


def _source_tag() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def build_native(verbose: bool = False) -> Optional[str]:
    """Compile the extension if needed; returns the .so path or None."""
    os.makedirs(_BUILD, exist_ok=True)
    tag = _source_tag()
    so_path = os.path.join(_BUILD, f"lpslam_native_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", _SRC, "-o", so_path,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if res.returncode != 0:
        if verbose:
            sys.stderr.write(res.stderr)
        return None
    return so_path


def get_native():
    """Returns the compiled lpslam_native module, or None."""
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    so_path = build_native()
    if so_path is None:
        return None
    spec = importlib.util.spec_from_file_location("lpslam_native", so_path)
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception:
        return None
    _cached = mod
    return mod
