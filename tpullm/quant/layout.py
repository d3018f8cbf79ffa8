"""Load-time relayout of ggml block formats into TPU-friendly planar arrays.

The reference CPU backend repacks quantized weights into interleaved tiles at
load time (ggml/src/ggml-cpu/repack.cpp). The TPU analogue: split each block
format into *planar* arrays — packed quants in one dense uint8/int8 array,
scales in their own small arrays, sub-byte scale fields pre-unpacked to int8 —
so XLA and Pallas kernels index them with plain strides instead of byte
gymnastics. Quants stay bit-packed (the big arrays keep 4-bit density in HBM);
only the tiny scale metadata is widened.

``decode_planar(bytes, qtype)`` runs on host (numpy, views where possible).
The resulting dict of arrays is what ``QTensor`` carries onto the device.
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, GGML_QUANT_SIZES
from .numpy_impl import _k4_scale_min, _q3k_scales


def _blk(data: np.ndarray, qtype: GGMLType) -> np.ndarray:
    blk, bs = GGML_QUANT_SIZES[qtype]
    assert data.dtype == np.uint8
    return data.reshape(*data.shape[:-1], data.shape[-1] // bs, bs)


def _f16_field(b: np.ndarray, off: int) -> np.ndarray:
    u = b[..., off].astype(np.uint16) | (b[..., off + 1].astype(np.uint16) << 8)
    return np.ascontiguousarray(u).view(np.float16).reshape(u.shape)


def decode_planar(data: np.ndarray, qtype: GGMLType) -> dict[str, np.ndarray]:
    """(..., row_bytes) uint8 -> named planar arrays, leading dims preserved.

    Per-type contents (leading dims ``(..., nb)`` where nb = blocks per row):

    - Q4_0:  qs u8 (...,nb,16), d f16
    - Q4_1:  qs u8 (...,nb,16), d f16, m f16
    - Q5_0:  qs u8 (...,nb,16), qh u8 (...,nb,4), d f16
    - Q5_1:  qs, qh, d, m
    - Q8_0:  qs i8 (...,nb,32), d f16
    - Q2_K:  qs u8 (...,nb,64), sc u8 (...,nb,16) [lo=scale hi=min], d f16, dmin f16
    - Q3_K:  qs u8 (...,nb,64), hmask u8 (...,nb,32), sc i8 (...,nb,16) [−32 applied], d f16
    - Q4_K:  qs u8 (...,nb,128), sc u8 (...,nb,8), mn u8 (...,nb,8), d f16, dmin f16
    - Q5_K:  qs, qh u8 (...,nb,32), sc, mn, d, dmin
    - Q6_K:  ql u8 (...,nb,128), qh u8 (...,nb,64), sc i8 (...,nb,16), d f16
    - Q8_K:  qs i8 (...,nb,256), d f32
    - IQ4_NL: qs u8 (...,nb,16), d f16
    - IQ4_XS: qs u8 (...,nb,128), sc i8 (...,nb,8) [−32 applied], d f16
    - MXFP4: qs u8 (...,nb,16), e u8 (...,nb)
    """
    qtype = GGMLType(qtype)
    b = _blk(np.ascontiguousarray(data), qtype)
    if qtype == GGMLType.Q4_0:
        return {"qs": b[..., 2:18], "d": _f16_field(b, 0)}
    if qtype == GGMLType.Q4_1:
        return {"qs": b[..., 4:20], "d": _f16_field(b, 0), "m": _f16_field(b, 2)}
    if qtype == GGMLType.Q5_0:
        return {"qs": b[..., 6:22], "qh": b[..., 2:6], "d": _f16_field(b, 0)}
    if qtype == GGMLType.Q5_1:
        return {
            "qs": b[..., 8:24],
            "qh": b[..., 4:8],
            "d": _f16_field(b, 0),
            "m": _f16_field(b, 2),
        }
    if qtype == GGMLType.Q8_0:
        return {"qs": b[..., 2:34].view(np.int8), "d": _f16_field(b, 0)}
    if qtype == GGMLType.Q2_K:
        return {
            "qs": b[..., 16:80],
            "sc": b[..., 0:16],
            "d": _f16_field(b, 80),
            "dmin": _f16_field(b, 82),
        }
    if qtype == GGMLType.Q3_K:
        sc = (_q3k_scales(b[..., 96:108]) - 32).astype(np.int8)
        return {
            "qs": b[..., 32:96],
            "hmask": b[..., 0:32],
            "sc": sc,
            "d": _f16_field(b, 108),
        }
    if qtype == GGMLType.Q4_K:
        sc, mn = _k4_scale_min(b[..., 4:16])
        return {
            "qs": b[..., 16:144],
            "sc": sc.astype(np.uint8),
            "mn": mn.astype(np.uint8),
            "d": _f16_field(b, 0),
            "dmin": _f16_field(b, 2),
        }
    if qtype == GGMLType.Q5_K:
        sc, mn = _k4_scale_min(b[..., 4:16])
        return {
            "qs": b[..., 48:176],
            "qh": b[..., 16:48],
            "sc": sc.astype(np.uint8),
            "mn": mn.astype(np.uint8),
            "d": _f16_field(b, 0),
            "dmin": _f16_field(b, 2),
        }
    if qtype == GGMLType.Q6_K:
        return {
            "ql": b[..., 0:128],
            "qh": b[..., 128:192],
            "sc": b[..., 192:208].view(np.int8),
            "d": _f16_field(b, 208),
        }
    if qtype == GGMLType.Q8_K:
        u = (
            b[..., 0].astype(np.uint32)
            | (b[..., 1].astype(np.uint32) << 8)
            | (b[..., 2].astype(np.uint32) << 16)
            | (b[..., 3].astype(np.uint32) << 24)
        )
        return {
            "qs": b[..., 4:260].view(np.int8),
            "d": np.ascontiguousarray(u).view(np.float32).reshape(u.shape),
        }
    if qtype == GGMLType.IQ4_NL:
        return {"qs": b[..., 2:18], "d": _f16_field(b, 0)}
    if qtype == GGMLType.IQ4_XS:
        sh = (b[..., 2].astype(np.int32) | (b[..., 3].astype(np.int32) << 8))[..., None]
        sl = b[..., 4:8]
        ib = np.arange(8)
        ls_lo = (np.take(sl, ib // 2, axis=-1) >> (4 * (ib % 2))) & 0xF
        ls = ((ls_lo.astype(np.int32) | (((sh >> (2 * ib)) & 3) << 4)) - 32).astype(np.int8)
        return {"qs": b[..., 8:136], "sc": ls, "d": _f16_field(b, 0)}
    if qtype == GGMLType.MXFP4:
        return {"qs": b[..., 1:17], "e": b[..., 0]}
    if qtype == GGMLType.TQ2_0:
        return {"qs": b[..., 0:64], "d": _f16_field(b, 64)}
    raise NotImplementedError(f"planar layout for {qtype.name}")


PLANAR_TYPES = frozenset(
    {
        GGMLType.Q4_0,
        GGMLType.Q4_1,
        GGMLType.Q5_0,
        GGMLType.Q5_1,
        GGMLType.Q8_0,
        GGMLType.Q2_K,
        GGMLType.Q3_K,
        GGMLType.Q4_K,
        GGMLType.Q5_K,
        GGMLType.Q6_K,
        GGMLType.Q8_K,
        GGMLType.IQ4_NL,
        GGMLType.IQ4_XS,
        GGMLType.MXFP4,
        GGMLType.TQ2_0,
    }
)
