"""Loader for the native host runtime (C++ extension).

Compiles ``_native/lightmotif_native.cpp`` on first use with the system
compiler (cached next to the source) and exposes its functions; when no
compiler is available the callers fall back to the NumPy paths.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
import threading

_LOCK = threading.Lock()
_MODULE = None
_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "_native", "lightmotif_native.cpp")


def _build(so_path: str) -> bool:
    include = sysconfig.get_path("include")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        _SRC,
        "-o",
        so_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get() -> "object | None":
    """Return the native module, building it on demand; None if
    unavailable."""
    global _MODULE, _FAILED
    if _MODULE is not None or _FAILED:
        return _MODULE
    with _LOCK:
        if _MODULE is not None or _FAILED:
            return _MODULE
        suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
        so_path = os.path.join(
            os.path.dirname(_SRC), f"_lightmotif_native{suffix}"
        )
        if not os.path.exists(so_path) or os.path.getmtime(
            so_path
        ) < os.path.getmtime(_SRC):
            if not _build(so_path):
                _FAILED = True
                return None
        try:
            spec = importlib.util.spec_from_file_location(
                "_lightmotif_native", so_path
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _MODULE = mod
        except Exception:
            _FAILED = True
            return None
    return _MODULE
