"""ctypes binding to the native GBNF engine (native/grammar.cpp).

Builds the shared library on demand (g++, cached next to the source) — the
same role as the reference's compiled-in src/llama-grammar.cpp.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from .parser import parse_gbnf

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_LOCK = threading.Lock()
_LIB = None


def _load_lib():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        from ..utils.native import load_native

        lib = load_native("grammar")
        if lib is None:
            raise RuntimeError("failed to build native/grammar.cpp (g++)")
        lib.tpg_init.restype = ctypes.c_void_p
        lib.tpg_init.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32]
        lib.tpg_free.argtypes = [ctypes.c_void_p]
        lib.tpg_clone.restype = ctypes.c_void_p
        lib.tpg_clone.argtypes = [ctypes.c_void_p]
        lib.tpg_accept.restype = ctypes.c_int
        lib.tpg_accept.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.tpg_check.restype = ctypes.c_int
        lib.tpg_check.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.tpg_done.restype = ctypes.c_int
        lib.tpg_done.argtypes = [ctypes.c_void_p]
        lib.tpg_dead.restype = ctypes.c_int
        lib.tpg_dead.argtypes = [ctypes.c_void_p]
        lib.tpg_filter.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
        _LIB = lib
        return lib


class Grammar:
    """A live grammar state over Unicode code points."""

    def __init__(self, gbnf: str | None = None, _handle=None):
        self._lib = _load_lib()
        if _handle is not None:
            self._h = _handle
            return
        rules, root = parse_gbnf(gbnf)
        flat, offs = [], []
        for r in rules:
            offs.append(len(flat))
            flat.extend(r)
        elems = np.asarray(flat, np.uint32).reshape(-1, 2)
        offs_a = np.asarray(offs, np.uint32)
        self._h = self._lib.tpg_init(
            elems.ctypes.data_as(ctypes.c_void_p),
            offs_a.ctypes.data_as(ctypes.c_void_p),
            len(offs), len(flat), root)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.tpg_free(self._h)
        except Exception:
            pass

    def clone(self) -> "Grammar":
        return Grammar(_handle=self._lib.tpg_clone(self._h))

    @staticmethod
    def _cps(text: str) -> np.ndarray:
        return np.asarray([ord(c) for c in text], np.uint32)

    def accept(self, text: str) -> int:
        """Advance through text; returns #codepoints consumed."""
        cps = self._cps(text)
        if len(cps) == 0:
            return 0
        return self._lib.tpg_accept(
            self._h, cps.ctypes.data_as(ctypes.c_void_p), len(cps))

    def check(self, text: str) -> bool:
        """Would text be fully consumable from the current state?"""
        cps = self._cps(text)
        if len(cps) == 0:
            return True
        return bool(self._lib.tpg_check(
            self._h, cps.ctypes.data_as(ctypes.c_void_p), len(cps)))

    def matches(self, text: str) -> bool:
        """Full-string match from the initial state of this grammar object."""
        g = self.clone()
        n = g.accept(text)
        return n == len(text) and g.done

    @property
    def done(self) -> bool:
        return bool(self._lib.tpg_done(self._h))

    @property
    def dead(self) -> bool:
        return bool(self._lib.tpg_dead(self._h))

    def filter_pieces(self, pieces: list[str]) -> np.ndarray:
        """Vector of 0/1: which pieces are consumable from the current state."""
        offs = [0]
        flat: list[int] = []
        for p in pieces:
            flat.extend(ord(c) for c in p)
            offs.append(len(flat))
        cps = np.asarray(flat or [0], np.uint32)
        offs_a = np.asarray(offs, np.int32)
        out = np.zeros(len(pieces), np.uint8)
        self._lib.tpg_filter(
            self._h, cps.ctypes.data_as(ctypes.c_void_p),
            offs_a.ctypes.data_as(ctypes.c_void_p), len(pieces),
            out.ctypes.data_as(ctypes.c_void_p))
        return out
