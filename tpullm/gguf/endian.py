"""Endianness helpers for quantized block payloads.

Quant bytes are endian-neutral; only the multi-byte scale/metadata fields
inside each block need swapping when a file's byte order differs from the
host (the s390x fork's big-endian path, docs/build-s390x.md:120-148).
"""
from __future__ import annotations

import numpy as np

from .constants import GGMLType, GGML_QUANT_SIZES

# per-block (offset, width) multi-byte fields, per quant type
SWAP_FIELDS: dict[GGMLType, list[tuple[int, int]]] = {
    GGMLType.Q4_0: [(0, 2)],
    GGMLType.Q4_1: [(0, 2), (2, 2)],
    GGMLType.Q5_0: [(0, 2)],
    GGMLType.Q5_1: [(0, 2), (2, 2)],
    GGMLType.Q8_0: [(0, 2)],
    GGMLType.Q2_K: [(80, 2), (82, 2)],
    GGMLType.Q3_K: [(108, 2)],
    GGMLType.Q4_K: [(0, 2), (2, 2)],
    GGMLType.Q5_K: [(0, 2), (2, 2)],
    GGMLType.Q6_K: [(208, 2)],
    GGMLType.IQ4_NL: [(0, 2)],
    GGMLType.IQ4_XS: [(0, 2), (2, 2)],
    GGMLType.TQ2_0: [(64, 2)],
}


def swap_block_fields(raw: np.ndarray, qtype: GGMLType) -> np.ndarray:
    """Byte-swap the block metadata fields of a quantized payload (copy)."""
    t = GGMLType(qtype)
    if t == GGMLType.F32:
        return raw.view(np.uint32).byteswap().view(np.uint8)
    if t in (GGMLType.F16, GGMLType.BF16):
        return raw.view(np.uint16).byteswap().view(np.uint8)
    fields = SWAP_FIELDS.get(t)
    if fields is None:
        raise NotImplementedError(f"endian swap for {t.name}")
    blk, bs = GGML_QUANT_SIZES[t]
    b = raw.reshape(-1, bs).copy()
    for off, width in fields:
        assert width == 2
        lo = b[:, off].copy()
        b[:, off] = b[:, off + 1]
        b[:, off + 1] = lo
    return b.reshape(raw.shape)
