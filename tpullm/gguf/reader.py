"""GGUF v3 reader: mmap-backed, zero-copy numpy views over tensor payloads.

TPU-native counterpart of the reference reader (ggml/src/gguf.cpp:1-1556,
gguf-py/gguf/gguf_reader.py): metadata is parsed eagerly (it is tiny),
tensor payloads are exposed lazily as numpy views into the mmap so that
multi-GiB checkpoints stream straight from page cache into device transfer
buffers without an intermediate host copy.

Supports little- and big-endian files (the s390x fork ships a BE converter,
docs/build-s390x.md:120-148) and the sharded-file convention
``<name>-%05d-of-%05d.gguf`` (include/llama.h:475).
"""
from __future__ import annotations

import mmap
import os
import re
import struct
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGMLType,
    GGUFValueType,
    Keys,
    row_size_bytes,
    type_block_size,
    type_size_bytes,
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

_SCALAR_NP = {
    GGUFValueType.UINT8: np.uint8,
    GGUFValueType.INT8: np.int8,
    GGUFValueType.UINT16: np.uint16,
    GGUFValueType.INT16: np.int16,
    GGUFValueType.UINT32: np.uint32,
    GGUFValueType.INT32: np.int32,
    GGUFValueType.FLOAT32: np.float32,
    GGUFValueType.BOOL: np.bool_,
    GGUFValueType.UINT64: np.uint64,
    GGUFValueType.INT64: np.int64,
    GGUFValueType.FLOAT64: np.float64,
}


class _Cursor:
    """Sequential parser over a bytes-like buffer with explicit endianness."""

    def __init__(self, buf, offset: int, byteorder: str):
        self.buf = buf
        self.pos = offset
        self.bo = byteorder  # '<' or '>'

    def scalar(self, vt: GGUFValueType):
        fmt = self.bo + _SCALAR_FMT[vt]
        size = struct.calcsize(fmt)
        (v,) = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return v

    def u32(self) -> int:
        return self.scalar(GGUFValueType.UINT32)

    def u64(self) -> int:
        return self.scalar(GGUFValueType.UINT64)

    def string(self) -> str:
        n = self.u64()
        s = bytes(self.buf[self.pos : self.pos + n])
        self.pos += n
        return s.decode("utf-8", errors="replace")

    def value(self, vt: GGUFValueType) -> Any:
        vt = GGUFValueType(vt)
        if vt == GGUFValueType.STRING:
            return self.string()
        if vt == GGUFValueType.ARRAY:
            et = GGUFValueType(self.u32())
            n = self.u64()
            if et == GGUFValueType.STRING:
                return [self.string() for _ in range(n)]
            if et == GGUFValueType.ARRAY:
                return [self.value(GGUFValueType.ARRAY) for _ in range(n)]
            # contiguous scalar array: bulk numpy read
            dt = np.dtype(_SCALAR_NP[et]).newbyteorder(self.bo)
            arr = np.frombuffer(self.buf, dtype=dt, count=n, offset=self.pos)
            self.pos += arr.nbytes
            return arr
        return self.scalar(vt)


@dataclass
class GGUFTensorInfo:
    name: str
    shape: tuple[int, ...]  # ggml ne order: shape[0] = row length (contiguous dim)
    ggml_type: GGMLType
    offset: int  # relative to data section start
    # filled by reader:
    n_bytes: int = 0
    file_index: int = 0

    @property
    def np_shape(self) -> tuple[int, ...]:
        """Numpy (row-major) shape: reversed ggml ne order."""
        return tuple(reversed(self.shape))

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n


class GGUFFile:
    """One or more (sharded) GGUF files presented as a single model.

    ``metadata`` maps key -> python value (str / int / float / bool /
    np.ndarray / list[str]). ``tensors`` maps name -> GGUFTensorInfo.
    ``tensor_data(name)`` returns a zero-copy numpy uint8 view of the payload
    (byteswapped copy only if file endianness differs from host).
    """

    def __init__(self, path: str | os.PathLike):
        self.paths = _expand_split_paths(str(path))
        self.metadata: dict[str, Any] = {}
        self.tensors: dict[str, GGUFTensorInfo] = {}
        self._mmaps: list[mmap.mmap] = []
        self._data_offsets: list[int] = []
        self.byteorder = "<"
        for idx, p in enumerate(self.paths):
            self._read_one(p, idx)

    # -- parsing --

    def _read_one(self, path: str, file_index: int) -> None:
        f = open(path, "rb")
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        f.close()
        self._mmaps.append(mm)

        if mm[:4] != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file (magic {mm[:4]!r})")
        # version field discriminates endianness: valid versions are tiny ints
        (ver_le,) = struct.unpack_from("<I", mm, 4)
        bo = "<" if ver_le < 0x10000 else ">"
        if file_index == 0:
            self.byteorder = bo
        cur = _Cursor(mm, 4, bo)
        version = cur.u32()
        if version not in (2, 3):
            raise ValueError(f"{path}: unsupported GGUF version {version}")
        n_tensors = cur.u64()
        n_kv = cur.u64()

        meta: dict[str, Any] = {}
        for _ in range(n_kv):
            key = cur.string()
            vt = GGUFValueType(cur.u32())
            meta[key] = cur.value(vt)
        if file_index == 0:
            self.metadata.update(meta)

        infos: list[GGUFTensorInfo] = []
        for _ in range(n_tensors):
            name = cur.string()
            n_dims = cur.u32()
            shape = tuple(cur.u64() for _ in range(n_dims))
            ttype = GGMLType(cur.u32())
            offset = cur.u64()
            infos.append(GGUFTensorInfo(name, shape, ttype, offset, file_index=file_index))

        alignment = int(meta.get(Keys.General.ALIGNMENT, GGUF_DEFAULT_ALIGNMENT))
        data_start = (cur.pos + alignment - 1) // alignment * alignment
        self._data_offsets.append(data_start)

        for ti in infos:
            ti.n_bytes = row_size_bytes(ti.ggml_type, ti.shape[0]) * (ti.n_elements // ti.shape[0])
            if ti.name in self.tensors:
                raise ValueError(f"duplicate tensor {ti.name!r}")
            self.tensors[ti.name] = ti

    # -- accessors --

    def get(self, key: str, default: Any = None) -> Any:
        return self.metadata.get(key, default)

    @property
    def architecture(self) -> str:
        return str(self.metadata.get(Keys.General.ARCHITECTURE, ""))

    def tensor_names(self) -> list[str]:
        return list(self.tensors.keys())

    def tensor_data(self, name: str) -> np.ndarray:
        """Payload bytes as uint8 in HOST byte order (zero-copy from mmap
        when the file matches the host; a swapped copy otherwise — the
        quantized-block field swap of gguf_convert_endian in reverse)."""
        ti = self.tensors[name]
        mm = self._mmaps[ti.file_index]
        base = self._data_offsets[ti.file_index] + ti.offset
        raw = np.frombuffer(mm, dtype=np.uint8, count=ti.n_bytes, offset=base)
        host = "<" if _host_le() else ">"
        if self.byteorder != host:
            from .endian import swap_block_fields

            try:
                return swap_block_fields(raw, ti.ggml_type)
            except NotImplementedError:
                pass  # integer types etc: handled by tensor_array views
        return raw

    def tensor_array(self, name: str) -> np.ndarray:
        """Typed view for non-quantized tensors; uint8 block view for quantized.

        For quantized types returns shape (*outer_dims, n_blocks_per_row, block_bytes)
        uint8; for plain types returns the natural np dtype with np_shape.
        Big-endian files are byteswapped to host order (copy) for multi-byte types.
        """
        ti = self.tensors[name]
        raw = self.tensor_data(name)
        t = ti.ggml_type
        np_map = {
            GGMLType.F32: np.float32,
            GGMLType.F16: np.float16,
            GGMLType.F64: np.float64,
            GGMLType.I8: np.int8,
            GGMLType.I16: np.int16,
            GGMLType.I32: np.int32,
            GGMLType.I64: np.int64,
        }
        host = "<" if _host_le() else ">"
        already_host = self.byteorder == host or t in (
            GGMLType.F32, GGMLType.F16, GGMLType.BF16)  # tensor_data swapped
        if t in np_map:
            dt = np.dtype(np_map[t])
            if not already_host:
                dt = dt.newbyteorder(self.byteorder)
            arr = raw.view(dt).reshape(ti.np_shape)
            if dt != np.dtype(np_map[t]):
                arr = arr.astype(np_map[t])  # byteswap copy to host order
            return arr
        if t == GGMLType.BF16:
            return raw.view(np.uint16).reshape(ti.np_shape)
        blk, bs = type_block_size(t), type_size_bytes(t)
        outer = ti.np_shape[:-1]
        return raw.reshape(*outer, ti.shape[0] // blk, bs)

    def close(self) -> None:
        """Best-effort unmap; no-op for maps still referenced by live views."""
        remaining = []
        for mm in self._mmaps:
            try:
                mm.close()
            except BufferError:
                remaining.append(mm)
        self._mmaps = remaining


def _host_le() -> bool:
    return struct.pack("=I", 1) == struct.pack("<I", 1)


_SPLIT_RE = re.compile(r"^(.*)-(\d{5})-of-(\d{5})\.gguf$")


def _expand_split_paths(path: str) -> list[str]:
    m = _SPLIT_RE.match(path)
    if not m:
        return [path]
    base, _no, count = m.group(1), int(m.group(2)), int(m.group(3))
    return [f"{base}-{i:05d}-of-{count:05d}.gguf" for i in range(1, count + 1)]


def read_gguf(path: str | os.PathLike) -> GGUFFile:
    return GGUFFile(path)
