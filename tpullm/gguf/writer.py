"""GGUF v3 writer (little-endian or big-endian).

Counterpart of gguf-py/gguf/gguf_writer.py + ggml/src/gguf.cpp writer paths.
Used by the quantize tool, the model saver, synthetic-model test fixtures,
and state serialization.
"""
from __future__ import annotations

import struct
from typing import Any, Sequence

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGUF_VERSION,
    GGMLType,
    GGUFValueType,
    Keys,
    row_size_bytes,
)

_SCALAR_FMT = {
    GGUFValueType.UINT8: "B",
    GGUFValueType.INT8: "b",
    GGUFValueType.UINT16: "H",
    GGUFValueType.INT16: "h",
    GGUFValueType.UINT32: "I",
    GGUFValueType.INT32: "i",
    GGUFValueType.FLOAT32: "f",
    GGUFValueType.BOOL: "?",
    GGUFValueType.UINT64: "Q",
    GGUFValueType.INT64: "q",
    GGUFValueType.FLOAT64: "d",
}

_NP_TO_VT = {
    np.dtype(np.uint8): GGUFValueType.UINT8,
    np.dtype(np.int8): GGUFValueType.INT8,
    np.dtype(np.uint16): GGUFValueType.UINT16,
    np.dtype(np.int16): GGUFValueType.INT16,
    np.dtype(np.uint32): GGUFValueType.UINT32,
    np.dtype(np.int32): GGUFValueType.INT32,
    np.dtype(np.float32): GGUFValueType.FLOAT32,
    np.dtype(np.bool_): GGUFValueType.BOOL,
    np.dtype(np.uint64): GGUFValueType.UINT64,
    np.dtype(np.int64): GGUFValueType.INT64,
    np.dtype(np.float64): GGUFValueType.FLOAT64,
}

_NP_TO_GGML = {
    np.dtype(np.float32): GGMLType.F32,
    np.dtype(np.float16): GGMLType.F16,
    np.dtype(np.float64): GGMLType.F64,
    np.dtype(np.int8): GGMLType.I8,
    np.dtype(np.int16): GGMLType.I16,
    np.dtype(np.int32): GGMLType.I32,
    np.dtype(np.int64): GGMLType.I64,
}


class GGUFWriter:
    def __init__(self, path: str, arch: str | None = None, byteorder: str = "<"):
        self.path = path
        self.bo = byteorder
        self.kv: list[tuple[str, GGUFValueType, Any]] = []
        self.tensors: list[tuple[str, tuple[int, ...], GGMLType, bytes | np.ndarray]] = []
        self.alignment = GGUF_DEFAULT_ALIGNMENT
        if arch is not None:
            self.add_string(Keys.General.ARCHITECTURE, arch)

    # -- KV --

    def add_kv(self, key: str, value: Any, vtype: GGUFValueType | None = None) -> None:
        if vtype is None:
            vtype = _infer_vtype(value)
        # last-wins: the reference loader rejects duplicate keys outright
        for i, (k, _, _) in enumerate(self.kv):
            if k == key:
                self.kv[i] = (key, vtype, value)
                return
        self.kv.append((key, vtype, value))

    def add_string(self, key: str, value: str) -> None:
        self.add_kv(key, value, GGUFValueType.STRING)

    def add_uint32(self, key: str, value: int) -> None:
        self.add_kv(key, int(value), GGUFValueType.UINT32)

    def add_int32(self, key: str, value: int) -> None:
        self.add_kv(key, int(value), GGUFValueType.INT32)

    def add_uint64(self, key: str, value: int) -> None:
        self.add_kv(key, int(value), GGUFValueType.UINT64)

    def add_float32(self, key: str, value: float) -> None:
        self.add_kv(key, float(value), GGUFValueType.FLOAT32)

    def add_bool(self, key: str, value: bool) -> None:
        self.add_kv(key, bool(value), GGUFValueType.BOOL)

    def add_array(self, key: str, value: Sequence[Any] | np.ndarray) -> None:
        self.add_kv(key, value, GGUFValueType.ARRAY)

    # -- tensors --

    def add_tensor(
        self,
        name: str,
        data: np.ndarray | bytes,
        ggml_type: GGMLType | None = None,
        ne_shape: tuple[int, ...] | None = None,
    ) -> None:
        """Add a tensor.

        For plain dtypes pass a typed numpy array (ne_shape inferred as reversed
        numpy shape). For quantized payloads pass raw bytes/uint8 plus explicit
        ggml_type and ne_shape (ggml ne order, ne[0] = row length).
        """
        if ggml_type is None:
            assert isinstance(data, np.ndarray) and data.dtype in _NP_TO_GGML
            ggml_type = _NP_TO_GGML[data.dtype]
            ne_shape = tuple(reversed(data.shape))
        assert ne_shape is not None
        n_rows = 1
        for d in ne_shape[1:]:
            n_rows *= d
        expect = row_size_bytes(ggml_type, ne_shape[0]) * n_rows
        nbytes = data.nbytes if isinstance(data, np.ndarray) else len(data)
        assert nbytes == expect, f"{name}: payload {nbytes}B != expected {expect}B"
        self.tensors.append((name, tuple(int(d) for d in ne_shape), ggml_type, data))

    # -- serialization --

    def _pack(self, vt: GGUFValueType, v: Any) -> bytes:
        return struct.pack(self.bo + _SCALAR_FMT[vt], v)

    def _pack_string(self, s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack(self.bo + "Q", len(b)) + b

    def _pack_value(self, vt: GGUFValueType, v: Any) -> bytes:
        if vt == GGUFValueType.STRING:
            return self._pack_string(v)
        if vt == GGUFValueType.ARRAY:
            if isinstance(v, np.ndarray):
                et = _NP_TO_VT[v.dtype]
                body = v.astype(v.dtype.newbyteorder(self.bo)).tobytes()
                return struct.pack(self.bo + "IQ", et, v.size) + body
            if len(v) > 0 and isinstance(v[0], str):
                body = b"".join(self._pack_string(s) for s in v)
                return struct.pack(self.bo + "IQ", GGUFValueType.STRING, len(v)) + body
            et = _infer_vtype(v[0]) if v else GGUFValueType.INT32
            body = b"".join(self._pack(et, x) for x in v)
            return struct.pack(self.bo + "IQ", et, len(v)) + body
        return self._pack(vt, v)

    def write(self) -> None:
        out = bytearray()
        out += GGUF_MAGIC
        out += struct.pack(self.bo + "IQQ", GGUF_VERSION, len(self.tensors), len(self.kv))
        for key, vt, v in self.kv:
            out += self._pack_string(key)
            out += struct.pack(self.bo + "I", vt)
            out += self._pack_value(vt, v)

        offset = 0
        payloads: list[bytes] = []
        for name, ne, tt, data in self.tensors:
            out += self._pack_string(name)
            out += struct.pack(self.bo + "I", len(ne))
            for d in ne:
                out += struct.pack(self.bo + "Q", d)
            out += struct.pack(self.bo + "IQ", tt, offset)
            if isinstance(data, np.ndarray):
                if data.dtype.itemsize > 1 and self.bo != "=" and _needs_swap(self.bo):
                    data = data.byteswap()
                data = data.tobytes()
            payloads.append(data)
            size = (len(data) + self.alignment - 1) // self.alignment * self.alignment
            offset += size

        pad = (-len(out)) % self.alignment
        out += b"\x00" * pad
        for data in payloads:
            out += data
            out += b"\x00" * ((-len(data)) % self.alignment)

        with open(self.path, "wb") as f:
            f.write(bytes(out))


def _needs_swap(bo: str) -> bool:
    host = "<" if struct.pack("=I", 1) == struct.pack("<I", 1) else ">"
    return bo != host


def _infer_vtype(v: Any) -> GGUFValueType:
    if isinstance(v, bool):
        return GGUFValueType.BOOL
    if isinstance(v, str):
        return GGUFValueType.STRING
    if isinstance(v, int):
        return GGUFValueType.UINT32 if 0 <= v < 2**32 else GGUFValueType.INT64
    if isinstance(v, float):
        return GGUFValueType.FLOAT32
    if isinstance(v, (list, tuple, np.ndarray)):
        return GGUFValueType.ARRAY
    raise TypeError(f"cannot infer GGUF value type for {type(v)}")
