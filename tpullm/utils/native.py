"""On-demand builder/loader for the native C++ components (ctypes).

The reference compiles its C++ in-tree; here the small native pieces
(grammar automaton, weight repack) build lazily with g++ and cache next to
their sources. Loading failures degrade to the pure-Python paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_LOCK = threading.Lock()
_CACHE: dict[str, ctypes.CDLL | None] = {}


def load_native(name: str, extra_flags: tuple[str, ...] = ()):
    """Build (if stale) and dlopen native/<name>.cpp -> libtpullm_<name>.so.
    Returns None when the toolchain or build is unavailable."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        so = os.path.join(_DIR, f"libtpullm_{name}.so")
        lib = None
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", *extra_flags,
                     "-o", so, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
        except Exception:
            lib = None
        _CACHE[name] = lib
        return lib
