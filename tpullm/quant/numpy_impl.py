"""ggml block-quant formats: vectorized numpy (de)quantization.

This is the host-side correctness anchor of the framework: the on-disk block
layouts and numerics follow the public ggml format contract
(ggml/src/ggml-common.h:150-460 struct layouts; quantizer semantics
ggml/src/ggml-quants.c quantize_row_*_ref / make_qx_quants / make_qkx2_quants).
The implementation is block-parallel numpy rather than the reference's scalar
loops; dequantization is bit-exact w.r.t. the format, quantization reproduces
the reference's scale-search algorithms in fp32.

All functions operate on the last axis: ``dequantize(bytes, qtype)`` takes
``(..., row_bytes)`` uint8 and returns ``(..., n)`` float32;
``quantize(x, qtype)`` takes ``(..., n)`` float and returns uint8 bytes.
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, GGML_QUANT_SIZES, QK_K

GROUP_MAX_EPS = 1e-15

# non-linear 4-bit LUTs (public format constants, ggml-common.h:1110-1118)
KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    dtype=np.float32,
)
KVALUES_MXFP4 = np.array(
    [0, 1, 2, 3, 4, 6, 8, 12, 0, -1, -2, -3, -4, -6, -8, -12], dtype=np.float32
)


def _f16(x: np.ndarray) -> np.ndarray:
    """fp32 -> fp16 -> fp32 round-trip (storage-scale semantics)."""
    return np.asarray(x, np.float32).astype(np.float16).astype(np.float32)


def _f16_decode(u16: np.ndarray) -> np.ndarray:
    return u16.view(np.float16).astype(np.float32) if u16.dtype == np.uint16 else u16


def _rint(x: np.ndarray) -> np.ndarray:
    """nearest_int(): round-to-nearest, ties-to-even (the fp32 +2^23 trick)."""
    return np.rint(x)


def _blocks(data: np.ndarray, qtype: GGMLType) -> np.ndarray:
    """(..., row_bytes) uint8 -> (..., nb, block_bytes)."""
    _, bs = GGML_QUANT_SIZES[qtype]
    assert data.dtype == np.uint8
    assert data.shape[-1] % bs == 0, f"{data.shape[-1]} % {bs}"
    return data.reshape(*data.shape[:-1], data.shape[-1] // bs, bs)


def _u16le(b: np.ndarray) -> np.ndarray:
    """two uint8 columns -> uint16 (LE)."""
    return (b[..., 0].astype(np.uint16) | (b[..., 1].astype(np.uint16) << 8))


def _f16le(b: np.ndarray) -> np.ndarray:
    return _u16le(b).view(np.float16) if b.flags.c_contiguous else np.ascontiguousarray(_u16le(b)).view(np.float16)


def _f16_at(blk: np.ndarray, off: int) -> np.ndarray:
    """fp16 scalar field at byte offset -> fp32 (..., nb)."""
    u = blk[..., off].astype(np.uint16) | (blk[..., off + 1].astype(np.uint16) << 8)
    return np.ascontiguousarray(u).view(np.float16).astype(np.float32).reshape(u.shape)


def _f32_at(blk: np.ndarray, off: int) -> np.ndarray:
    u = (
        blk[..., off].astype(np.uint32)
        | (blk[..., off + 1].astype(np.uint32) << 8)
        | (blk[..., off + 2].astype(np.uint32) << 16)
        | (blk[..., off + 3].astype(np.uint32) << 24)
    )
    return np.ascontiguousarray(u).view(np.float32).reshape(u.shape)


def _store_f16(out: np.ndarray, off: int, val: np.ndarray) -> None:
    u = np.asarray(val, np.float32).astype(np.float16).view(np.uint16)
    out[..., off] = (u & 0xFF).astype(np.uint8)
    out[..., off + 1] = (u >> 8).astype(np.uint8)


# ============================ dequantize ============================


def _dq_q4_0(blk):
    d = _f16_at(blk, 0)[..., None]
    qs = blk[..., 2:18]
    lo = (qs & 0xF).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    return d * np.concatenate([lo, hi], axis=-1).astype(np.float32)


def _dq_q4_1(blk):
    d = _f16_at(blk, 0)[..., None]
    m = _f16_at(blk, 2)[..., None]
    qs = blk[..., 4:20]
    lo = (qs & 0xF).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    return d * np.concatenate([lo, hi], axis=-1) + m


def _qh_bits(blk, off):
    """32-bit qh field -> (..., nb, 32) bit array in element order."""
    qh = (
        blk[..., off].astype(np.uint32)
        | (blk[..., off + 1].astype(np.uint32) << 8)
        | (blk[..., off + 2].astype(np.uint32) << 16)
        | (blk[..., off + 3].astype(np.uint32) << 24)
    )
    shifts = np.arange(32, dtype=np.uint32)
    return ((qh[..., None] >> shifts) & 1).astype(np.uint8)


def _dq_q5_0(blk):
    d = _f16_at(blk, 0)[..., None]
    bits = _qh_bits(blk, 2)
    qs = blk[..., 6:22]
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.concatenate([lo, hi], axis=-1) | (bits.astype(np.int32) << 4)
    return d * (q - 16).astype(np.float32)


def _dq_q5_1(blk):
    d = _f16_at(blk, 0)[..., None]
    m = _f16_at(blk, 2)[..., None]
    bits = _qh_bits(blk, 4)
    qs = blk[..., 8:24]
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.concatenate([lo, hi], axis=-1) | (bits.astype(np.int32) << 4)
    return d * q.astype(np.float32) + m


def _dq_q8_0(blk):
    d = _f16_at(blk, 0)[..., None]
    return d * blk[..., 2:34].view(np.int8).astype(np.float32)


def _dq_q8_1(blk):
    d = _f16_at(blk, 0)[..., None]
    return d * blk[..., 4:36].view(np.int8).astype(np.float32)


def _dq_q8_K(blk):
    d = _f32_at(blk, 0)[..., None]
    return d * blk[..., 4:260].view(np.int8).astype(np.float32)


def _dq_q2_K(blk):
    # layout: scales[16] | qs[64] | d f16 | dmin f16
    sc = blk[..., 0:16]
    qs = blk[..., 16:80]
    d = _f16_at(blk, 80)[..., None]
    dmin = _f16_at(blk, 82)[..., None]
    # element order per 128-half: shift group j (0..3), bytes 0..31
    q = qs.reshape(*qs.shape[:-1], 2, 32)  # halves
    shifts = np.arange(4, dtype=np.uint8) * 2
    bits = (q[..., :, None, :] >> shifts[None, :, None]) & 3  # (..., 2, 4, 32)
    bits = bits.reshape(*bits.shape[:-3], 256).astype(np.float32)
    dl = d * (sc & 0xF).astype(np.float32)  # (..., 16)
    ml = dmin * (sc >> 4).astype(np.float32)
    dl16 = np.repeat(dl, 16, axis=-1)
    ml16 = np.repeat(ml, 16, axis=-1)
    return dl16 * bits - ml16


def _q3k_scales(scb):
    """12 packed bytes -> 16 signed 6-bit scales (offset by -32 NOT applied)."""
    j = np.arange(16)
    low = np.where(
        j < 8,
        np.take(scb, np.minimum(j, 7), axis=-1) & 0xF,
        np.take(scb, np.maximum(j - 8, 0), axis=-1) >> 4,
    )
    hi = (np.take(scb, 8 + (j % 4), axis=-1) >> (2 * (j // 4))) & 3
    return (low | (hi << 4)).astype(np.int32)


def _dq_q3_K(blk):
    hm = blk[..., 0:32]
    qs = blk[..., 32:96]
    scb = blk[..., 96:108]
    d = _f16_at(blk, 108)[..., None]
    scales = _q3k_scales(scb) - 32  # (..., 16)
    q = qs.reshape(*qs.shape[:-1], 2, 32)
    shifts = np.arange(4, dtype=np.uint8) * 2
    bits = ((q[..., :, None, :] >> shifts[None, :, None]) & 3).astype(np.int32)
    bits = bits.reshape(*bits.shape[:-3], 256)
    # hmask: element e uses hm[e % 32] bit (e // 32)
    e = np.arange(256)
    hbit = (np.take(hm, e % 32, axis=-1) >> (e // 32)) & 1
    qv = bits - np.where(hbit == 1, 0, 4)
    sc16 = np.repeat(scales, 16, axis=-1).astype(np.float32)
    return d * sc16 * qv.astype(np.float32)


def _k4_scale_min(scb):
    """12 packed bytes -> (sc, m) 8 six-bit pairs (get_scale_min_k4 semantics)."""
    j = np.arange(8)
    b_j = np.take(scb, j, axis=-1).astype(np.uint8)
    b_j4 = np.take(scb, j + 4, axis=-1).astype(np.uint8)
    b_jm4 = np.take(scb, np.maximum(j - 4, 0), axis=-1).astype(np.uint8)
    sc = np.where(j < 4, b_j & 63, (b_j4 & 0xF) | ((b_jm4 >> 6) << 4))
    m = np.where(j < 4, b_j4 & 63, (b_j4 >> 4) | ((b_j >> 6) << 4))
    return sc.astype(np.float32), m.astype(np.float32)


def _dq_q4_K(blk):
    d = _f16_at(blk, 0)[..., None]
    dmin = _f16_at(blk, 2)[..., None]
    sc, m = _k4_scale_min(blk[..., 4:16])
    qs = blk[..., 16:144].reshape(*blk.shape[:-1], 4, 32)
    lo = (qs & 0xF).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    q = np.concatenate([lo, hi], axis=-1).reshape(*blk.shape[:-1], 256)
    d_sub = np.repeat(d * sc, 32, axis=-1)
    m_sub = np.repeat(dmin * m, 32, axis=-1)
    return d_sub * q - m_sub


def _dq_q5_K(blk):
    d = _f16_at(blk, 0)[..., None]
    dmin = _f16_at(blk, 2)[..., None]
    sc, m = _k4_scale_min(blk[..., 4:16])
    qh = blk[..., 16:48]
    qs = blk[..., 48:176].reshape(*blk.shape[:-1], 4, 32)
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    g = np.arange(4)
    lob = ((qh[..., None, :] >> (2 * g)[None, :, None]) & 1).astype(np.int32)  # (...,4,32)
    hib = ((qh[..., None, :] >> (2 * g + 1)[None, :, None]) & 1).astype(np.int32)
    q = np.concatenate([lo + 16 * lob, hi + 16 * hib], axis=-1).reshape(
        *blk.shape[:-1], 256
    ).astype(np.float32)
    d_sub = np.repeat(d * sc, 32, axis=-1)
    m_sub = np.repeat(dmin * m, 32, axis=-1)
    return d_sub * q - m_sub


def _dq_q6_K(blk):
    ql = blk[..., 0:128].reshape(*blk.shape[:-1], 2, 64)
    qh = blk[..., 128:192].reshape(*blk.shape[:-1], 2, 32)
    sc = blk[..., 192:208].view(np.int8).astype(np.float32)
    d = _f16_at(blk, 208)[..., None]
    l_lo = (ql[..., :32] & 0xF).astype(np.int32)  # L[l], half h
    l2_lo = (ql[..., 32:] & 0xF).astype(np.int32)  # L[l+32]
    l_hi = (ql[..., :32] >> 4).astype(np.int32)  # L[l+64]
    l2_hi = (ql[..., 32:] >> 4).astype(np.int32)  # L[l+96]
    h = qh.astype(np.int32)
    q1 = (l_lo | ((h & 3) << 4)) - 32
    q2 = (l2_lo | (((h >> 2) & 3) << 4)) - 32
    q3 = (l_hi | (((h >> 4) & 3) << 4)) - 32
    q4 = (l2_hi | (((h >> 6) & 3) << 4)) - 32
    q = np.concatenate([q1, q2, q3, q4], axis=-1).reshape(*blk.shape[:-1], 256)
    sc16 = np.repeat(sc, 16, axis=-1)  # scale per 16 elems, order matches ql groups
    return d * sc16 * q.astype(np.float32)


def _dq_iq4_nl(blk):
    d = _f16_at(blk, 0)[..., None]
    qs = blk[..., 2:18]
    lo = KVALUES_IQ4NL[qs & 0xF]
    hi = KVALUES_IQ4NL[qs >> 4]
    return d * np.concatenate([lo, hi], axis=-1)


def _dq_iq4_xs(blk):
    d = _f16_at(blk, 0)[..., None]
    sh = _u16le(blk[..., 2:4]).astype(np.int32)[..., None]  # scales_h
    sl = blk[..., 4:8]
    qs = blk[..., 8:136].reshape(*blk.shape[:-1], 8, 16)
    ib = np.arange(8)
    ls_lo = (np.take(sl, ib // 2, axis=-1) >> (4 * (ib % 2))) & 0xF
    ls_hi = (sh >> (2 * ib)) & 3
    ls = (ls_lo.astype(np.int32) | (ls_hi << 4)) - 32  # (..., 8)
    dl = (d * ls.astype(np.float32))[..., None]  # (..., 8, 1)
    lo = KVALUES_IQ4NL[qs & 0xF]
    hi = KVALUES_IQ4NL[qs >> 4]
    y = dl * np.concatenate([lo, hi], axis=-1)  # (..., 8, 32)
    return y.reshape(*blk.shape[:-1], 256)


def _e8m0_half(e: np.ndarray) -> np.ndarray:
    bits = np.where(
        e < 2,
        np.uint32(0x00200000) << e.astype(np.uint32),
        (e.astype(np.uint32) - 1) << 23,
    ).astype(np.uint32)
    return bits.view(np.float32)


def _dq_mxfp4(blk):
    d = _e8m0_half(blk[..., 0])[..., None]
    qs = blk[..., 1:17]
    lo = KVALUES_MXFP4[qs & 0xF]
    hi = KVALUES_MXFP4[qs >> 4]
    return d * np.concatenate([lo, hi], axis=-1)


def _dq_tq2_0(blk):
    """TQ2_0 ternary: 64B of 2-bit trits (value-1 offset) + f16 d per 256
    (ggml-common.h block_tq2_0; dequantize_row_tq2_0 order: per 32-byte
    chunk, shift planes 0,2,4,6)."""
    qs = blk[..., 0:64]
    d = _f16_at(blk, 64)
    q = qs.reshape(*qs.shape[:-1], 2, 32)
    parts = [((q >> s) & 3).astype(np.int32) - 1 for s in (0, 2, 4, 6)]
    grid = np.stack(parts, axis=-2).reshape(*qs.shape[:-1], 256)
    return d[..., None] * grid.astype(np.float32)


def _dq_tq1_0(blk):
    """TQ1_0 ternary 1.69 bpw: 48B of 5-trits-per-byte (powers-of-3
    packing) + 4B qh (4 trits each) + f16 d (ggml-common.h block_tq1_0;
    dequantize_row_tq1_0: q = (uint8)(qs*3^n), trit = (q*3)>>8 - 1)."""
    qs = blk[..., 0:48].astype(np.uint16)
    qh = blk[..., 48:52].astype(np.uint16)
    d = _f16_at(blk, 52)
    pow3 = np.asarray([1, 3, 9, 27, 81, 243], np.uint16)

    def trits(bytes_, n_planes):
        # (..., nb, m) -> (..., nb, n_planes, m) element-ordered trit planes
        q = (bytes_[..., None, :] * pow3[:n_planes, None]) & 0xFF
        return (((q * 3) >> 8).astype(np.int32) - 1)

    a = trits(qs[..., 0:32], 5).reshape(*blk.shape[:-1], 160)
    b = trits(qs[..., 32:48], 5).reshape(*blk.shape[:-1], 80)
    c = trits(qh, 4).reshape(*blk.shape[:-1], 16)
    grid = np.concatenate([a, b, c], axis=-1).astype(np.float32)
    return d[..., None] * grid


def _ue4m3_to_f32(x):
    """UE4M3 scale byte -> f32 (ggml_ue4m3_to_fp32: unsigned e4m3 * 0.5;
    0 and 0x7F decode to 0)."""
    x = np.asarray(x, np.uint8)
    e = ((x >> 3) & 0xF).astype(np.int32)
    m = (x & 0x7).astype(np.float32)
    sub = m * np.float32(2.0) ** -9
    norm = (1.0 + m / 8.0) * np.float32(2.0) ** (e - 7)
    v = np.where(e == 0, sub, norm) * 0.5
    return np.where((x == 0) | (x == 0x7F), 0.0, v).astype(np.float32)


def _dq_nvfp4(blk):
    """NVFP4: 64-block of four 16-element sub-blocks, each with a UE4M3
    scale byte; E2M1 nibbles via the mxfp4 LUT, sub-block half-split
    (dequantize_row_nvfp4: lo nibbles -> [0,8), hi -> [8,16))."""
    d = _ue4m3_to_f32(blk[..., 0:4])  # (..., nb, 4)
    qs = blk[..., 4:36].reshape(*blk.shape[:-1], 4, 8)
    lo = KVALUES_MXFP4[qs & 0xF]
    hi = KVALUES_MXFP4[qs >> 4]
    sub = np.concatenate([lo, hi], axis=-1)  # (..., nb, 4, 16)
    return (d[..., None] * sub).reshape(*blk.shape[:-1], 64)


def _q_tq1_0(x):
    """quantize_row_tq1_0_ref (ggml-quants.c:2240): d = amax, trits
    q = round(x/d)+1 packed base-3 (first element at the highest power),
    then byte = ceil(q * 256 / 243) so decode's (byte*3^n & 0xFF)*3 >> 8
    recovers digit n."""
    x = x.reshape(-1, 256).astype(np.float32)
    d = np.abs(x).max(axis=-1)
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    q = (np.clip(_rint(x * inv[:, None]), -1, 1) + 1).astype(np.uint16)

    def pack(vals, m):
        # vals (..., 5, m) element-major planes -> (..., m) bytes
        b = np.zeros(vals.shape[:-2] + (m,), np.uint16)
        for n in range(5):
            b = b * 3 + vals[..., n, :]
        return ((b * 256 + 242) // 243).astype(np.uint8)

    a = pack(q[:, 0:160].reshape(-1, 5, 32), 32)
    bq = pack(q[:, 160:240].reshape(-1, 5, 16), 16)
    ch = np.zeros((x.shape[0], 4), np.uint16)
    hq = q[:, 240:256].reshape(-1, 4, 4)
    for n in range(4):
        ch = ch * 3 + hq[:, n, :]
    # qh packs only 4 trits; decode multiplies by 3^n for n<4, so scale
    # the base-3 number to the top of the byte the same ceil-way
    ch = ((ch * 3) * 256 + 242) // 243  # digits d0..d3 + a zero 5th trit
    out = np.zeros((x.shape[0], 54), np.uint8)
    out[:, 0:32] = a
    out[:, 32:48] = bq
    out[:, 48:52] = ch.astype(np.uint8)
    _store_f16(out, 52, d)
    return out


def _fp32_to_ue4m3(x):
    """ggml_fp32_to_ue4m3 (ggml-impl.h:517), vectorized."""
    x = np.asarray(x, np.float32)
    out = np.zeros(x.shape, np.uint8)
    pos = x > 0
    xv = np.minimum(np.where(pos, x, 1.0), 448.0)
    bits = np.ascontiguousarray(xv).view(np.uint32).reshape(x.shape)
    fe = ((bits >> 23) & 0xFF).astype(np.int32) - 127
    fm = ((bits >> 20) & 0x7).astype(np.int32)
    ue = fe + 7
    rnd = ((bits >> 19) & 1).astype(np.int32)
    man = fm + rnd
    exp2 = np.where(man > 7, ue + 1, ue)
    man2 = np.where(man > 7, 0, man)
    norm = np.where(exp2 >= 15, 0x7E, (exp2 << 3) | man2)
    sub_man = np.clip((xv * 512.0 + 0.5).astype(np.int32), 0, 7)
    sub = np.where(sub_man < 1, 0, sub_man)
    out = np.where(ue <= 0, sub, norm).astype(np.uint8)
    return np.where(pos, out, 0).astype(np.uint8)


def _q_nvfp4(x):
    """quantize_row_nvfp4_ref (ggml-quants.c:342): per-16 UE4M3 scale
    (amax/6 through the fp32->ue4m3 rounding), E2M1 nibbles by nearest
    LUT value at the DECODED scale, half-split lo/hi."""
    x = x.reshape(-1, 64).astype(np.float32)
    sub = x.reshape(-1, 4, 16)
    amax = np.abs(sub).max(-1)
    ue = _fp32_to_ue4m3(amax / 6.0)
    d = _ue4m3_to_f32(ue)  # decoded scale (includes the 0.5 factor)
    lut = np.asarray(KVALUES_MXFP4, np.float32)  # (16,)
    err = np.abs(lut.reshape(1, 1, 1, 16) * d[..., None, None]
                 - sub[..., None])
    idx = err.argmin(-1).astype(np.uint8)  # first-min == reference '<'
    lo, hi = idx[..., :8], idx[..., 8:]
    qs = (lo | (hi << 4)).reshape(-1, 32)
    out = np.zeros((x.shape[0], 36), np.uint8)
    out[:, 0:4] = ue
    out[:, 4:36] = qs
    return out


def _q_tq2_0(x):
    x = x.reshape(-1, 256).astype(np.float32)
    d = np.abs(x).max(axis=-1)
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    q = np.clip(_rint(x * inv[:, None]) + 1, 0, 2).astype(np.uint8)
    qg = q.reshape(-1, 2, 4, 32)
    packed = (qg[:, :, 0] | (qg[:, :, 1] << 2) | (qg[:, :, 2] << 4)
              | (qg[:, :, 3] << 6)).reshape(-1, 64)
    out = np.zeros((x.shape[0], 66), np.uint8)
    out[:, 0:64] = packed
    _store_f16(out, 64, d)
    return out




# ---------------------------------------------------------------------------
# i-quants (IQ1/IQ2/IQ3): codebook-grid formats. Layouts per ggml-quants.c
# block_iq* structs; the shared E8-lattice grids and canonical sign table
# live in iq_grids (pure format data). Decode-only: the reference's encoders
# for these need an importance matrix search and are out of scope here.
# ---------------------------------------------------------------------------


def _u16cols(b):
    """(..., 2k) uint8 -> (..., k) uint16 (LE pairs)."""
    return (b[..., 0::2].astype(np.uint16)
            | (b[..., 1::2].astype(np.uint16) << 8))


def _u32cols(b):
    """(..., 4k) uint8 -> (..., k) uint32 (LE quads)."""
    u = b.astype(np.uint32)
    return u[..., 0::4] | (u[..., 1::4] << 8) | (u[..., 2::4] << 16) \
        | (u[..., 3::4] << 24)


def _signs_from_idx(idx):
    """7-bit canonical sign indices (...,) -> +-1.0 f32 (..., 8)."""
    from .iq_grids import KSIGNS

    bits = KSIGNS[idx][..., None] >> np.arange(8, dtype=np.uint8)
    return np.where(bits & 1, np.float32(-1), np.float32(1))


def _sign_bytes(b):
    """Raw sign bytes (...,) uint8 -> +-1.0 f32 (..., 8)."""
    bits = b[..., None] >> np.arange(8, dtype=np.uint8)
    return np.where(bits & 1, np.float32(-1), np.float32(1))


def _iqgrid(name, idx, per):
    from .iq_grids import grid

    g = grid(name).astype(np.float32)
    return g[idx]  # (..., per)


def _dq_iq2_xxs(blk):
    # block: d f16 | 32 x u32 pairs: [4 grid bytes][4x7b signs + 4b scale]
    d = _f16_at(blk, 0)  # (..., nb)
    q = _u32cols(blk[..., 2:]).reshape(*blk.shape[:-1], 8, 2)
    gi = q[..., 0]  # 4 grid bytes packed LE
    meta = q[..., 1]
    db = d[..., None] * (0.5 + (meta >> 28).astype(np.float32)) * 0.25
    sidx = (meta[..., None] >> np.array([0, 7, 14, 21], np.uint32)) & 0x7F
    signs = _signs_from_idx(sidx.astype(np.int64))  # (..., 8, 4, 8)
    gb = (gi[..., None] >> np.array([0, 8, 16, 24], np.uint32)) & 0xFF
    vals = _iqgrid("IQ2_XXS", gb.astype(np.int64), 8)  # (..., 8, 4, 8)
    y = db[..., None, None] * vals * signs
    return y.reshape(*blk.shape[:-1], 256)


def _dq_iq2_xs(blk):
    # block: d f16 | 32 x u16 (9b grid idx + 7b sign idx) | 8 x u8 scales
    d = _f16_at(blk, 0)
    qs = _u16cols(blk[..., 2:66]).reshape(*blk.shape[:-1], 16, 2)
    sc = blk[..., 66:74]
    s4 = (sc[..., None] >> np.array([0, 4], np.uint8)) & 0x0F  # (...,8,2)
    db = d[..., None, None] * (0.5 + s4.astype(np.float32)) * 0.25  # (...,8,2)
    db = db.reshape(*blk.shape[:-1], 16, 1, 1)
    signs = _signs_from_idx((qs >> 9).astype(np.int64))  # (...,16,2,8)
    vals = _iqgrid("IQ2_XS", (qs & 511).astype(np.int64), 8)
    y = db * vals * signs
    return y.reshape(*blk.shape[:-1], 256)


def _dq_iq2_s(blk):
    # block: d f16 | 32 qs | 32 sign bytes | 8 qh | 8 scales
    d = _f16_at(blk, 0)
    qs = blk[..., 2:34]
    sb = blk[..., 34:66]
    qh = blk[..., 66:74]
    sc = blk[..., 74:82]
    s4 = (sc[..., None] >> np.array([0, 4], np.uint8)) & 0x0F
    db = (d[..., None, None] * (0.5 + s4.astype(np.float32)) * 0.25)
    db = db.reshape(*blk.shape[:-1], 16, 1, 1)
    hi = (qh[..., None] >> np.array([0, 2, 4, 6], np.uint8)) & 0x03
    gi = qs.astype(np.uint16) | (hi.reshape(*qs.shape).astype(np.uint16) << 8)
    vals = _iqgrid("IQ2_S", gi.astype(np.int64), 8)  # (...,32,8)
    signs = _sign_bytes(sb)  # (...,32,8)
    y = db * vals.reshape(*blk.shape[:-1], 16, 2, 8) \
        * signs.reshape(*blk.shape[:-1], 16, 2, 8)
    return y.reshape(*blk.shape[:-1], 256)


def _dq_iq3_xxs(blk):
    # block: d f16 | 64 grid-index bytes | 8 x u32 (4x7b signs + 4b scale)
    d = _f16_at(blk, 0)
    qs = blk[..., 2:66]
    meta = _u32cols(blk[..., 66:98])  # (..., 8)
    db = d[..., None] * (0.5 + (meta >> 28).astype(np.float32)) * 0.5
    sidx = (meta[..., None] >> np.array([0, 7, 14, 21], np.uint32)) & 0x7F
    signs = _signs_from_idx(sidx.astype(np.int64))  # (...,8,4,8)
    vals = _iqgrid("IQ3_XXS", qs.astype(np.int64), 4)  # (...,64,4)
    y = db[..., None, None] * vals.reshape(*blk.shape[:-1], 8, 4, 8) * signs
    return y.reshape(*blk.shape[:-1], 256)


def _dq_iq3_s(blk):
    # block: d f16 | 64 qs | 8 qh | 32 sign bytes | 4 scales
    d = _f16_at(blk, 0)
    qs = blk[..., 2:66]
    qh = blk[..., 66:74]
    sb = blk[..., 74:106]
    sc = blk[..., 106:110]
    s4 = (sc[..., None] >> np.array([0, 4], np.uint8)) & 0x0F  # (...,4,2)
    db = d[..., None, None] * (1 + 2 * s4.astype(np.float32))
    db = db.reshape(*blk.shape[:-1], 8, 1, 1)
    hi = (qh[..., None] >> np.arange(8, dtype=np.uint8)) & 0x01
    gi = qs.astype(np.uint16) | (hi.reshape(*qs.shape).astype(np.uint16) << 8)
    vals = _iqgrid("IQ3_S", gi.astype(np.int64), 4)  # (...,64,4)
    signs = _sign_bytes(sb)  # (...,32,8)
    y = db * vals.reshape(*blk.shape[:-1], 8, 4, 8) \
        * signs.reshape(*blk.shape[:-1], 8, 4, 8)
    return y.reshape(*blk.shape[:-1], 256)


_IQ1_DELTA = np.float32(0.125)


def _dq_iq1_s(blk):
    # block: d f16 | 32 qs | 16 x u16 qh (3x3b grid hi + 3b scale + sign bit)
    d = _f16_at(blk, 0)
    qs = blk[..., 2:34]
    qh = _u16cols(blk[..., 34:50])  # (..., 8)
    dl = d[..., None] * (2 * ((qh >> 12) & 7).astype(np.float32) + 1)
    delta = np.where((qh & 0x8000) == 0, _IQ1_DELTA, -_IQ1_DELTA)
    hi = (qh[..., None] >> np.array([0, 3, 6, 9], np.uint16)) & 7  # (...,8,4)
    gi = qs.astype(np.uint16) | (hi.reshape(*qs.shape).astype(np.uint16) << 8)
    vals = _iqgrid("IQ1_S", gi.astype(np.int64), 8)  # (...,32,8)
    y = dl[..., None, None] * (vals.reshape(*blk.shape[:-1], 8, 4, 8)
                               + delta[..., None, None])
    return y.reshape(*blk.shape[:-1], 256)


def _dq_iq1_m(blk):
    # block: 32 qs | 16 qh (2x3b grid hi + delta signs) | 8 scale bytes;
    # the f16 super-scale hides in the scale words' top nibbles
    qs = blk[..., 0:32]
    qh = blk[..., 32:48]
    sw = _u16cols(blk[..., 48:56])  # (..., 4) scale words
    dbits = (sw & 0xF000) >> np.array([12, 8, 4, 0], np.uint16)
    du16 = dbits[..., 0] | dbits[..., 1] | dbits[..., 2] | dbits[..., 3]
    d = np.ascontiguousarray(du16).view(np.float16).astype(np.float32)
    d = d.reshape(du16.shape)
    s3 = (sw[..., None] >> np.array([0, 3, 6, 9], np.uint16)) & 0x07
    dl = d[..., None, None] * (2 * s3.astype(np.float32).reshape(
        *blk.shape[:-1], 8, 2) + 1)  # (...,8,2)
    hi = (qh[..., None] >> np.array([0, 4], np.uint8)) & 0x07  # (...,16,2)
    gi = qs.astype(np.uint16) | (hi.reshape(*qs.shape).astype(np.uint16) << 8)
    sgn = (qh[..., None] >> np.array([0, 4], np.uint8)) & 0x08
    delta = np.where(sgn == 0, _IQ1_DELTA, -_IQ1_DELTA)  # (...,16,2)
    vals = _iqgrid("IQ1_M", gi.astype(np.int64), 8)  # (...,32,8)
    y = dl.reshape(*blk.shape[:-1], 8, 2, 1, 1) \
        * (vals.reshape(*blk.shape[:-1], 8, 2, 2, 8)
           + delta.reshape(*blk.shape[:-1], 8, 2, 2, 1))
    return y.reshape(*blk.shape[:-1], 256)


_DEQUANT = {
    GGMLType.Q4_0: _dq_q4_0,
    GGMLType.Q4_1: _dq_q4_1,
    GGMLType.Q5_0: _dq_q5_0,
    GGMLType.Q5_1: _dq_q5_1,
    GGMLType.Q8_0: _dq_q8_0,
    GGMLType.Q8_1: _dq_q8_1,
    GGMLType.Q2_K: _dq_q2_K,
    GGMLType.Q3_K: _dq_q3_K,
    GGMLType.Q4_K: _dq_q4_K,
    GGMLType.Q5_K: _dq_q5_K,
    GGMLType.Q6_K: _dq_q6_K,
    GGMLType.Q8_K: _dq_q8_K,
    GGMLType.IQ4_NL: _dq_iq4_nl,
    GGMLType.IQ4_XS: _dq_iq4_xs,
    GGMLType.MXFP4: _dq_mxfp4,
    GGMLType.TQ2_0: _dq_tq2_0,
    GGMLType.TQ1_0: _dq_tq1_0,
    GGMLType.NVFP4: _dq_nvfp4,
    GGMLType.IQ2_XXS: _dq_iq2_xxs,
    GGMLType.IQ2_XS: _dq_iq2_xs,
    GGMLType.IQ2_S: _dq_iq2_s,
    GGMLType.IQ3_XXS: _dq_iq3_xxs,
    GGMLType.IQ3_S: _dq_iq3_s,
    GGMLType.IQ1_S: _dq_iq1_s,
    GGMLType.IQ1_M: _dq_iq1_m,
}


def dequant_supported() -> set[GGMLType]:
    return set(_DEQUANT) | {GGMLType.F32, GGMLType.F16, GGMLType.BF16}


def dequantize(data: np.ndarray, qtype: GGMLType) -> np.ndarray:
    """(..., row_bytes) uint8 -> (..., n_elements) float32, bit-exact."""
    qtype = GGMLType(qtype)
    if qtype == GGMLType.F32:
        return np.ascontiguousarray(data).view(np.float32).reshape(*data.shape[:-1], -1)
    if qtype == GGMLType.F16:
        return (
            np.ascontiguousarray(data)
            .view(np.float16)
            .astype(np.float32)
            .reshape(*data.shape[:-1], -1)
        )
    if qtype == GGMLType.BF16:
        u = np.ascontiguousarray(data).view(np.uint16).astype(np.uint32) << 16
        return u.view(np.float32).reshape(*data.shape[:-1], -1)
    blk = _blocks(np.ascontiguousarray(data), qtype)
    y = _DEQUANT[qtype](blk)
    return y.reshape(*data.shape[:-1], -1)


# ============================ quantize ============================


def _signed_absmax(x: np.ndarray):
    """(value-at-first-abs-max, abs-max) along last axis, C tie semantics."""
    idx = np.argmax(np.abs(x), axis=-1)
    mx = np.take_along_axis(x, idx[..., None], axis=-1)[..., 0]
    return mx, np.abs(mx)


def _q_q4_0(x):
    x = x.reshape(-1, 32)
    mx, amax = _signed_absmax(x)
    d = mx / -8.0
    idd = np.where(d != 0, np.float32(1.0) / d, 0.0).astype(np.float32)
    d16 = _f16(d)
    xi = np.minimum(15, np.trunc(x * idd[:, None] + 8.5).astype(np.int32)).astype(np.uint8)
    qs = xi[:, :16] | (xi[:, 16:] << 4)
    out = np.zeros((x.shape[0], 18), np.uint8)
    _store_f16(out, 0, d)
    out[:, 2:18] = qs
    return out


def _q_q4_1(x):
    x = x.reshape(-1, 32)
    mn = x.min(axis=-1)
    mx = x.max(axis=-1)
    d = (mx - mn) / 15.0
    idd = np.where(d != 0, np.float32(1.0) / d, 0.0).astype(np.float32)
    xi = np.minimum(
        15, np.trunc((x - mn[:, None]) * idd[:, None] + 0.5).astype(np.int32)
    ).astype(np.uint8)
    out = np.zeros((x.shape[0], 20), np.uint8)
    _store_f16(out, 0, d)
    _store_f16(out, 2, mn)
    out[:, 4:20] = xi[:, :16] | (xi[:, 16:] << 4)
    return out


def _pack_qh(xi: np.ndarray) -> np.ndarray:
    """(N, 32) 5-bit values -> (N, 4) qh bytes, bit j = 5th bit of element j."""
    bits = ((xi >> 4) & 1).astype(np.uint32)
    qh = (bits << np.arange(32, dtype=np.uint32)).sum(axis=-1, dtype=np.uint64).astype(np.uint32)
    out = np.zeros((xi.shape[0], 4), np.uint8)
    for b in range(4):
        out[:, b] = (qh >> (8 * b)).astype(np.uint8)
    return out


def _q_q5_0(x):
    x = x.reshape(-1, 32)
    mx, _ = _signed_absmax(x)
    d = mx / -16.0
    idd = np.where(d != 0, np.float32(1.0) / d, 0.0).astype(np.float32)
    xi = np.minimum(31, np.trunc(x * idd[:, None] + 16.5).astype(np.int32)).astype(np.uint8)
    out = np.zeros((x.shape[0], 22), np.uint8)
    _store_f16(out, 0, d)
    out[:, 2:6] = _pack_qh(xi)
    out[:, 6:22] = (xi[:, :16] & 0xF) | ((xi[:, 16:] & 0xF) << 4)
    return out


def _q_q5_1(x):
    x = x.reshape(-1, 32)
    mn = x.min(axis=-1)
    mx = x.max(axis=-1)
    d = (mx - mn) / 31.0
    idd = np.where(d != 0, np.float32(1.0) / d, 0.0).astype(np.float32)
    xi = np.trunc((x - mn[:, None]) * idd[:, None] + 0.5).astype(np.int32).astype(np.uint8)
    out = np.zeros((x.shape[0], 24), np.uint8)
    _store_f16(out, 0, d)
    _store_f16(out, 2, mn)
    out[:, 4:8] = _pack_qh(xi)
    out[:, 8:24] = (xi[:, :16] & 0xF) | ((xi[:, 16:] & 0xF) << 4)
    return out


def _q_q8_0(x):
    x = x.reshape(-1, 32)
    amax = np.abs(x).max(axis=-1)
    d = amax / 127.0
    idd = np.where(d != 0, np.float32(1.0) / d, 0.0).astype(np.float32)
    q = _rint(x * idd[:, None]).astype(np.int8)
    out = np.zeros((x.shape[0], 34), np.uint8)
    _store_f16(out, 0, d)
    out[:, 2:34] = q.view(np.uint8)
    return out


def _q_q8_1(x):
    x = x.reshape(-1, 32)
    amax = np.abs(x).max(axis=-1)
    d = amax / 127.0
    idd = np.where(d != 0, np.float32(1.0) / d, 0.0).astype(np.float32)
    q = _rint(x * idd[:, None]).astype(np.int32)
    s = _f16(d) * q.sum(axis=-1).astype(np.float32)
    out = np.zeros((x.shape[0], 40), np.uint8)
    _store_f16(out, 0, d)
    _store_f16(out, 2, s)
    out[:, 4:36] = q.astype(np.int8).view(np.uint8)
    return out


def _q_q8_K(x):
    x = x.reshape(-1, 256).astype(np.float32)
    mx, amax = _signed_absmax(x)
    nz = amax != 0
    iscale = np.where(nz, np.float32(-127.0) / np.where(nz, mx, 1.0), 0.0).astype(np.float32)
    q = np.minimum(127, _rint(iscale[:, None] * x)).astype(np.int32)
    q = np.where(nz[:, None], q, 0)
    d = np.where(nz, np.float32(1.0) / np.where(iscale != 0, iscale, 1.0), 0.0).astype(np.float32)
    bsums = q.reshape(-1, 16, 16).sum(axis=-1).astype(np.int16)
    out = np.zeros((x.shape[0], 292), np.uint8)
    out[:, 0:4] = d.astype(np.float32).view(np.uint8).reshape(-1, 4)
    out[:, 4:260] = q.astype(np.int8).view(np.uint8)
    out[:, 260:292] = bsums.view(np.uint8).reshape(-1, 32)
    return out


def _q_mxfp4(x):
    x = x.reshape(-1, 32).astype(np.float32)
    amax = np.abs(x).max(axis=-1)
    e = np.where(
        amax > 0, (np.floor(np.log2(amax, where=amax > 0, out=np.zeros_like(amax))) - 2 + 127), 0
    ).astype(np.uint8)
    d = _e8m0_half(e)
    err = np.abs(KVALUES_MXFP4[None, None, :] * d[:, None, None] - x[:, :, None])
    xi = err.argmin(axis=-1).astype(np.uint8)
    out = np.zeros((x.shape[0], 17), np.uint8)
    out[:, 0] = e
    out[:, 1:17] = xi[:, :16] | (xi[:, 16:] << 4)
    return out


def _q_bf16(x):
    x32 = np.asarray(x, np.float32).reshape(-1)
    u = x32.view(np.uint32)
    # round-to-nearest-even on the truncated 16 bits
    r = ((u >> 16) & 1) + 0x7FFF
    out = ((u + r) >> 16).astype(np.uint16)
    out = np.where(np.isnan(x32), np.uint16(0x7FC0) | (u >> 16).astype(np.uint16) & 0x8000, out)
    return out.view(np.uint8).reshape(x32.shape[0], 2).reshape(-1)


# --- K-quant scale search (make_qx_quants / make_qkx2_quants, vectorized) ---


def _make_qx_quants(x: np.ndarray, nmax: int, qw: np.ndarray | None = None):
    """x: (N, n). Returns (scale (N,), L (N, n) int offset +nmax).

    rmse_type=1 semantics (weights = x^2) unless qw given; includes the
    ±9 iscale grid search.
    """
    N, n = x.shape
    mx, amax = _signed_absmax(x)
    zero = amax < GROUP_MAX_EPS
    safe_mx = np.where(zero, 1.0, mx)
    w = qw if qw is not None else x * x

    def trial(iscale):
        l = np.clip(_rint(iscale[:, None] * x), -nmax, nmax - 1)
        sumlx = (w * x * l).sum(axis=-1)
        suml2 = (w * l * l).sum(axis=-1)
        return l, sumlx, suml2

    iscale = -nmax / safe_mx
    L, sumlx, suml2 = trial(iscale)
    scale = np.where(suml2 != 0, sumlx / np.where(suml2 != 0, suml2, 1), 0.0)
    best = scale * sumlx
    for is_ in range(-9, 10):
        if is_ == 0:
            continue
        isc = -(nmax + 0.1 * is_) / safe_mx
        l2, slx, sl2 = trial(isc)
        better = (sl2 > 0) & (slx * slx > best * sl2)
        if better.any():
            L = np.where(better[:, None], l2, L)
            new_scale = slx / np.where(sl2 != 0, sl2, 1)
            scale = np.where(better, new_scale, scale)
            best = np.where(better, new_scale * slx, best)
    L = (L + nmax).astype(np.int32)
    L = np.where(zero[:, None], 0, L)
    scale = np.where(zero, 0.0, scale)
    return scale.astype(np.float32), L


def _make_qkx2_quants(
    x: np.ndarray,
    weights: np.ndarray,
    nmax: int,
    rmin: float,
    rdelta: float,
    nstep: int,
    use_mad: bool,
):
    """x, weights: (N, n). Returns (scale (N,), the_min (N,), L (N, n))."""
    N, n = x.shape
    mn = np.minimum(x.min(axis=-1), 0.0)
    mx = x.max(axis=-1)
    sum_w = weights.sum(axis=-1)
    sum_x = (weights * x).sum(axis=-1)
    flat = mx == mn
    rng = np.where(flat, 1.0, mx - mn)

    iscale = nmax / rng
    scale = 1.0 / iscale
    L = np.clip(_rint(iscale[:, None] * (x - mn[:, None])), 0, nmax)
    diff = scale[:, None] * L + mn[:, None] - x
    diff = np.abs(diff) if use_mad else diff * diff
    best_err = (weights * diff).sum(axis=-1)
    min_ = mn.copy()

    for is_ in range(nstep + 1):
        isc = (rmin + rdelta * is_ + nmax) / rng
        laux = np.clip(_rint(isc[:, None] * (x - mn[:, None])), 0, nmax)
        sum_l = (weights * laux).sum(axis=-1)
        sum_l2 = (weights * laux * laux).sum(axis=-1)
        sum_xl = (weights * laux * x).sum(axis=-1)
        D = sum_w * sum_l2 - sum_l * sum_l
        pos = D > 0
        Ds = np.where(pos, D, 1.0)
        this_scale = (sum_w * sum_xl - sum_x * sum_l) / Ds
        this_min = (sum_l2 * sum_x - sum_l * sum_xl) / Ds
        min_pos = this_min > 0
        this_scale = np.where(
            min_pos, sum_xl / np.where(sum_l2 != 0, sum_l2, 1.0), this_scale
        )
        this_min = np.where(min_pos, 0.0, this_min)
        diff = this_scale[:, None] * laux + this_min[:, None] - x
        diff = np.abs(diff) if use_mad else diff * diff
        cur_err = (weights * diff).sum(axis=-1)
        better = pos & (cur_err < best_err)
        if better.any():
            L = np.where(better[:, None], laux, L)
            best_err = np.where(better, cur_err, best_err)
            scale = np.where(better, this_scale, scale)
            min_ = np.where(better, this_min, min_)

    L = np.where(flat[:, None], 0, L).astype(np.int32)
    scale = np.where(flat, 0.0, scale)
    the_min = np.where(flat, -mn, -min_)
    return scale.astype(np.float32), the_min.astype(np.float32), L


def _q_q4_K(x, qw=None):
    x = x.reshape(-1, 256).astype(np.float32)
    N = x.shape[0]
    xb = x.reshape(N * 8, 32)
    if qw is not None:
        # imatrix weighting (quantize_row_qK_impl with quant_weights):
        # w = qw * sqrt(sigma2 + x^2), sigma2 = 2*sum(x^2)/QK_K per superblock
        sigma2 = 2.0 * (x * x).sum(axis=-1, keepdims=True) / 256.0
        w = (np.broadcast_to(qw[None, :], x.shape)
             * np.sqrt(sigma2 + x * x)).reshape(N * 8, 32)
    else:
        av = np.sqrt((xb * xb).mean(axis=-1))
        w = av[:, None] + np.abs(xb)
    scales, mins, L = _make_qkx2_quants(xb, w, 15, -1.0, 0.1, 20, False)
    scales = scales.reshape(N, 8)
    mins = mins.reshape(N, 8)
    L = L.reshape(N, 256)
    max_scale = scales.max(axis=-1)
    max_min = mins.max(axis=-1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = np.minimum(63, _rint(inv_scale[:, None] * scales).astype(np.int32)).astype(np.uint8)
    lm = np.minimum(63, _rint(inv_min[:, None] * mins).astype(np.int32)).astype(np.uint8)
    scb = _pack_k4_scales(ls, lm)
    d = _f16(max_scale / 63.0)
    dmin = _f16(max_min / 63.0)
    # requantize with the packed (lossless 6-bit) scales
    dd = d[:, None] * ls.astype(np.float32)  # (N, 8)
    dm = dmin[:, None] * lm.astype(np.float32)
    dd32 = np.repeat(dd, 32, axis=-1)
    dm32 = np.repeat(dm, 32, axis=-1)
    Lq = np.clip(_rint((x + dm32) / np.where(dd32 != 0, dd32, 1)), 0, 15).astype(np.int32)
    L = np.where(dd32 != 0, Lq, L)
    out = np.zeros((N, 144), np.uint8)
    _store_f16(out, 0, max_scale / 63.0)
    _store_f16(out, 2, max_min / 63.0)
    out[:, 4:16] = scb
    Lg = L.reshape(N, 4, 64)
    out[:, 16:144] = (Lg[..., :32] | (Lg[..., 32:] << 4)).astype(np.uint8).reshape(N, 128)
    return out


def _pack_k4_scales(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """(N,8),(N,8) 6-bit -> (N,12) packed bytes (block_q4_K/q5_K layout)."""
    N = ls.shape[0]
    scb = np.zeros((N, 12), np.uint8)
    scb[:, 0:4] = ls[:, 0:4] & 63
    scb[:, 4:8] = lm[:, 0:4] & 63
    scb[:, 8:12] = (ls[:, 4:8] & 0xF) | ((lm[:, 4:8] & 0xF) << 4)
    scb[:, 0:4] |= (ls[:, 4:8] >> 4) << 6
    scb[:, 4:8] |= (lm[:, 4:8] >> 4) << 6
    return scb


def _q_q5_K(x, qw=None):
    x = x.reshape(-1, 256).astype(np.float32)
    N = x.shape[0]
    xb = x.reshape(N * 8, 32)
    if qw is not None:
        # imatrix weighting (quantize_row_qK_impl with quant_weights):
        # w = qw * sqrt(sigma2 + x^2), sigma2 = 2*sum(x^2)/QK_K per superblock
        sigma2 = 2.0 * (x * x).sum(axis=-1, keepdims=True) / 256.0
        w = (np.broadcast_to(qw[None, :], x.shape)
             * np.sqrt(sigma2 + x * x)).reshape(N * 8, 32)
    else:
        av = np.sqrt((xb * xb).mean(axis=-1))
        w = av[:, None] + np.abs(xb)
    scales, mins, L = _make_qkx2_quants(xb, w, 31, -0.5, 0.1, 15, False)
    scales = scales.reshape(N, 8)
    mins = mins.reshape(N, 8)
    L = L.reshape(N, 256)
    max_scale = scales.max(axis=-1)
    max_min = mins.max(axis=-1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = np.minimum(63, _rint(inv_scale[:, None] * scales).astype(np.int32)).astype(np.uint8)
    lm = np.minimum(63, _rint(inv_min[:, None] * mins).astype(np.int32)).astype(np.uint8)
    scb = _pack_k4_scales(ls, lm)
    d = _f16(max_scale / 63.0)
    dmin = _f16(max_min / 63.0)
    dd = d[:, None] * ls.astype(np.float32)
    dm = dmin[:, None] * lm.astype(np.float32)
    dd32 = np.repeat(dd, 32, axis=-1)
    dm32 = np.repeat(dm, 32, axis=-1)
    Lq = np.clip(_rint((x + dm32) / np.where(dd32 != 0, dd32, 1)), 0, 31).astype(np.int32)
    L = np.where(dd32 != 0, Lq, L)
    out = np.zeros((N, 176), np.uint8)
    _store_f16(out, 0, max_scale / 63.0)
    _store_f16(out, 2, max_min / 63.0)
    out[:, 4:16] = scb
    Lg = L.reshape(N, 4, 64)
    l1 = Lg[..., :32]
    l2 = Lg[..., 32:]
    out[:, 48:176] = ((l1 & 0xF) | ((l2 & 0xF) << 4)).astype(np.uint8).reshape(N, 128)
    qh = np.zeros((N, 32), np.uint8)
    for g in range(4):
        qh |= ((l1[:, g, :] >> 4) << (2 * g)).astype(np.uint8)
        qh |= ((l2[:, g, :] >> 4) << (2 * g + 1)).astype(np.uint8)
    out[:, 16:48] = qh
    return out


def _q_q6_K(x, qw=None):
    x = x.reshape(-1, 256).astype(np.float32)
    N = x.shape[0]
    xb = x.reshape(N * 16, 16)
    qwb = None
    if qw is not None:
        sigma2 = 2.0 * (x * x).sum(axis=-1, keepdims=True) / 256.0
        qwb = (np.broadcast_to(qw[None, :], x.shape)
               * np.sqrt(sigma2 + x * x)).reshape(N * 16, 16)
    scales, _L = _make_qx_quants(xb, 32, qw=qwb)
    scales = scales.reshape(N, 16)
    aidx = np.abs(scales).argmax(axis=-1)
    max_scale = np.take_along_axis(scales, aidx[:, None], axis=-1)[:, 0]
    max_abs = np.abs(max_scale)
    zero = max_abs < GROUP_MAX_EPS
    safe = np.where(zero, 1.0, max_scale)
    iscale = -128.0 / safe
    d = _f16(1.0 / iscale)
    sc = np.minimum(127, _rint(iscale[:, None] * scales).astype(np.int32)).astype(np.int8)
    dd = d[:, None] * sc.astype(np.float32)  # (N, 16)
    dd16 = np.repeat(dd, 16, axis=-1)
    L = np.clip(_rint(x / np.where(dd16 != 0, dd16, 1)), -32, 31).astype(np.int32) + 32
    L = np.where(dd16 != 0, L, 0)
    L = np.where(zero[:, None], 0, L)
    sc = np.where(zero[:, None], 0, sc)
    d = np.where(zero, 0.0, d)
    out = np.zeros((N, 210), np.uint8)
    Lh = L.reshape(N, 2, 128)
    a = Lh[..., 0:32]
    b = Lh[..., 32:64]
    c = Lh[..., 64:96]
    e = Lh[..., 96:128]
    ql = np.concatenate([(a & 0xF) | ((c & 0xF) << 4), (b & 0xF) | ((e & 0xF) << 4)], axis=-1)
    qh = (a >> 4) | ((b >> 4) << 2) | ((c >> 4) << 4) | ((e >> 4) << 6)
    out[:, 0:128] = ql.astype(np.uint8).reshape(N, 128)
    out[:, 128:192] = qh.astype(np.uint8).reshape(N, 64)
    out[:, 192:208] = sc.view(np.uint8)
    _store_f16(out, 208, np.where(zero, 0.0, 1.0 / iscale))
    return out


def _q_q2_K(x):
    x = x.reshape(-1, 256).astype(np.float32)
    N = x.shape[0]
    xb = x.reshape(N * 16, 16)
    w = np.abs(xb)
    scales, mins, L = _make_qkx2_quants(xb, w, 3, -0.5, 0.1, 15, True)
    scales = scales.reshape(N, 16)
    mins = mins.reshape(N, 16)
    L = L.reshape(N, 256)
    max_scale = scales.max(axis=-1)
    max_min = mins.max(axis=-1)
    sc4 = np.zeros((N, 16), np.uint8)
    pos_s = max_scale > 0
    isc = np.where(pos_s, 15.0 / np.where(pos_s, max_scale, 1), 0.0)
    sc4 = np.where(pos_s[:, None], _rint(isc[:, None] * scales).astype(np.int32), 0).astype(np.uint8)
    d = np.where(pos_s, _f16(max_scale / 15.0), 0.0).astype(np.float32)
    pos_m = max_min > 0
    ism = np.where(pos_m, 15.0 / np.where(pos_m, max_min, 1), 0.0)
    lm4 = np.where(pos_m[:, None], _rint(ism[:, None] * mins).astype(np.int32), 0).astype(np.uint8)
    dmin = np.where(pos_m, _f16(max_min / 15.0), 0.0).astype(np.float32)
    scb = sc4 | (lm4 << 4)
    dd = d[:, None] * (scb & 0xF).astype(np.float32)  # (N,16)
    dm = dmin[:, None] * (scb >> 4).astype(np.float32)
    dd16 = np.repeat(dd, 16, axis=-1)
    dm16 = np.repeat(dm, 16, axis=-1)
    Lq = np.clip(_rint((x + dm16) / np.where(dd16 != 0, dd16, 1)), 0, 3).astype(np.int32)
    L = np.where(dd16 != 0, Lq, L)
    out = np.zeros((N, 84), np.uint8)
    out[:, 0:16] = scb
    Lh = L.reshape(N, 2, 128)
    a, b, c, e = Lh[..., 0:32], Lh[..., 32:64], Lh[..., 64:96], Lh[..., 96:128]
    qs = a | (b << 2) | (c << 4) | (e << 6)
    out[:, 16:80] = qs.astype(np.uint8).reshape(N, 64)
    _store_f16(out, 80, np.where(pos_s, max_scale / 15.0, 0.0))
    _store_f16(out, 82, np.where(pos_m, max_min / 15.0, 0.0))
    return out


def _make_q3_quants(x: np.ndarray, nmax: int):
    """make_q3_quants(do_rmse=True): iterative per-element refinement."""
    N, n = x.shape
    mx, amax = _signed_absmax(x)
    zero = amax < GROUP_MAX_EPS
    safe = np.where(zero, 1.0, mx)
    iscale = -nmax / safe
    L = np.clip(_rint(iscale[:, None] * x), -nmax, nmax - 1)
    w = x * x
    sumlx = (w * x * L).sum(axis=-1)
    suml2 = (w * L * L).sum(axis=-1)
    for _ in range(5):
        n_changed = 0
        for i in range(n):
            wi = w[:, i]
            xi = x[:, i]
            Li = L[:, i]
            slx = sumlx - wi * xi * Li
            sl2 = suml2 - wi * Li * Li
            pos = slx > 0
            new_l = np.clip(_rint(xi * sl2 / np.where(slx != 0, slx, 1)), -nmax, nmax - 1)
            slx2 = slx + wi * xi * new_l
            sl22 = sl2 + wi * new_l * new_l
            improve = pos & (new_l != Li) & (sl22 > 0) & (slx2 * slx2 * suml2 > sumlx * sumlx * sl22)
            L[:, i] = np.where(improve, new_l, Li)
            sumlx = np.where(improve, slx2, sumlx)
            suml2 = np.where(improve, sl22, suml2)
            n_changed += int(improve.sum())
        if n_changed == 0:
            break
    L = (L + nmax).astype(np.int32)
    L = np.where(zero[:, None], 0, L)
    scale = np.where(suml2 > 0, sumlx / np.where(suml2 != 0, suml2, 1), 0.0)
    scale = np.where(zero, 0.0, scale)
    return scale.astype(np.float32), L


def _q_q3_K(x):
    x = x.reshape(-1, 256).astype(np.float32)
    N = x.shape[0]
    xb = x.reshape(N * 16, 16)
    scales, _ = _make_q3_quants(xb, 4)
    scales = scales.reshape(N, 16)
    aidx = np.abs(scales).argmax(axis=-1)
    max_scale = np.take_along_axis(scales, aidx[:, None], axis=-1)[:, 0]
    nz = max_scale != 0
    safe = np.where(nz, max_scale, 1.0)
    iscale = -32.0 / safe
    lq = np.clip(_rint(iscale[:, None] * scales), -32, 31).astype(np.int32) + 32
    lq = np.where(nz[:, None], lq, 0)
    # pack 16 6-bit scales into 12 bytes (block_q3_K layout)
    scb = np.zeros((N, 12), np.uint8)
    lo = (lq & 0xF).astype(np.uint8)
    hi = (lq >> 4).astype(np.uint8)
    scb[:, 0:8] = lo[:, 0:8] | (lo[:, 8:16] << 4)
    for j in range(16):
        scb[:, 8 + j % 4] |= hi[:, j] << (2 * (j // 4))
    d = np.where(nz, _f16(1.0 / iscale), 0.0).astype(np.float32)
    # re-extract (lossless) and requantize
    sc = (lq - 32).astype(np.float32)
    dd = d[:, None] * sc
    dd16 = np.repeat(dd, 16, axis=-1)
    L = np.clip(_rint(x / np.where(dd16 != 0, dd16, 1)), -4, 3).astype(np.int32) + 4
    L = np.where(dd16 != 0, L, 0)
    hbit = (L > 3).astype(np.uint8)
    Lf = np.where(L > 3, L - 4, L)
    out = np.zeros((N, 110), np.uint8)
    # hmask: element e -> byte e%32, bit e//32
    eb = hbit.reshape(N, 8, 32)
    hm = np.zeros((N, 32), np.uint8)
    for b in range(8):
        hm |= (eb[:, b, :] << b).astype(np.uint8)
    out[:, 0:32] = hm
    Lh = Lf.reshape(N, 2, 128)
    a, b, c, e = Lh[..., 0:32], Lh[..., 32:64], Lh[..., 64:96], Lh[..., 96:128]
    out[:, 32:96] = (a | (b << 2) | (c << 4) | (e << 6)).astype(np.uint8).reshape(N, 64)
    out[:, 96:108] = scb
    _store_f16(out, 108, np.where(nz, 1.0 / iscale, 0.0))
    return out


def _iq4_search(x, w, kv):
    """Weighted nearest-codebook scale search for the IQ4 non-linear
    table (quantize_row_iq4_nl_impl's role, ggml-quants.c): candidate
    scales around the signed-extreme anchor, each refined by one weighted
    least-squares (Lloyd) step. x/w (R, G); returns d (R,), idx (R, G)."""
    R, G = x.shape
    amax_i = np.abs(x).argmax(-1)
    mx = np.take_along_axis(x, amax_i[:, None], -1)[:, 0]
    base = np.where(mx != 0, mx / kv[0], 0.0).astype(np.float32)  # kv[0]=-127
    mids = (kv[1:] + kv[:-1]) / 2.0
    best_err = np.full(R, np.inf, np.float32)
    best_d = np.zeros(R, np.float32)
    best_idx = np.zeros((R, G), np.uint8)
    for t in np.linspace(0.7, 1.3, 13):
        d = (base * t).astype(np.float32)
        idd = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
        q = np.searchsorted(mids, x * idd[:, None]).astype(np.int64)
        kvq = kv[q].astype(np.float32)
        num = (w * x * kvq).sum(-1)
        den = (w * kvq * kvq).sum(-1)
        d2 = np.where(den > 0, num / np.where(den > 0, den, 1), d)
        for dc in (d, d2.astype(np.float32)):
            err = (w * (x - dc[:, None] * kvq) ** 2).sum(-1)
            upd = err < best_err
            best_err = np.where(upd, err, best_err)
            best_d = np.where(upd, dc, best_d)
            best_idx = np.where(upd[:, None], q, best_idx).astype(np.uint8)
    return best_d, best_idx


def _iq4_weights(x, qw):
    if qw is not None:
        return np.broadcast_to(np.asarray(qw, np.float32), x.shape)
    sigma2 = (x * x).mean(-1, keepdims=True)
    return np.sqrt(sigma2 + x * x)  # reference default importance proxy


def _q_iq4_nl(x, qw=None):
    x = x.reshape(-1, 32)
    if qw is not None:
        w = np.broadcast_to(np.asarray(qw, np.float32).reshape(1, 32),
                            x.shape)
    else:
        w = _iq4_weights(x, None)
    kv = KVALUES_IQ4NL.astype(np.float32)
    d, idx = _iq4_search(x, w, kv)
    out = np.zeros((x.shape[0], 18), np.uint8)
    _store_f16(out, 0, d)
    out[:, 2:18] = idx[:, :16] | (idx[:, 16:] << 4)
    return out


def _q_iq4_xs(x, qw=None):
    x = x.reshape(-1, 256)
    R = x.shape[0]
    xg = x.reshape(R * 8, 32)
    if qw is not None:
        wg = np.broadcast_to(
            np.asarray(qw, np.float32).reshape(8, 32)[None], (R, 8, 32)
        ).reshape(R * 8, 32)
    else:
        wg = _iq4_weights(xg, None)
    kv = KVALUES_IQ4NL.astype(np.float32)
    dg, _ = _iq4_search(xg, wg, kv)
    dg = dg.reshape(R, 8)
    # superblock scale so 6-bit signed subscales cover every group scale
    gmax_i = np.abs(dg).argmax(-1)
    gmx = np.take_along_axis(dg, gmax_i[:, None], -1)[:, 0]
    d = np.where(gmx != 0, gmx / -32.0, 0.0).astype(np.float32)
    idd = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    ls = np.clip(np.round(dg * idd[:, None]), -32, 31).astype(np.int32)
    # re-assign indices against the representable effective scale d*ls
    eff = (d[:, None] * ls.astype(np.float32)).reshape(R * 8)
    mids = (kv[1:] + kv[:-1]) / 2.0
    ie = np.where(eff != 0, 1.0 / np.where(eff != 0, eff, 1), 0.0)
    idx = np.searchsorted(mids, xg * ie[:, None]).astype(np.uint8)
    idx = idx.reshape(R, 8, 32)
    lsu = (ls + 32).astype(np.uint32)  # [0, 63]
    out = np.zeros((R, 136), np.uint8)
    _store_f16(out, 0, d)
    sh = np.zeros(R, np.uint32)
    for ib in range(8):
        sh |= ((lsu[:, ib] >> 4) & 3) << (2 * ib)
    out[:, 2] = sh & 0xFF
    out[:, 3] = (sh >> 8) & 0xFF
    for ib in range(8):
        out[:, 4 + ib // 2] |= ((lsu[:, ib] & 0xF) << (4 * (ib % 2))).astype(np.uint8)
    qs = idx[..., :16] | (idx[..., 16:] << 4)  # (R, 8, 16)
    out[:, 8:136] = qs.reshape(R, 128)
    return out


_QUANT = {
    GGMLType.Q4_0: _q_q4_0,
    GGMLType.Q4_1: _q_q4_1,
    GGMLType.Q5_0: _q_q5_0,
    GGMLType.Q5_1: _q_q5_1,
    GGMLType.Q8_0: _q_q8_0,
    GGMLType.Q8_1: _q_q8_1,
    GGMLType.Q8_K: _q_q8_K,
    GGMLType.Q2_K: _q_q2_K,
    GGMLType.Q3_K: _q_q3_K,
    GGMLType.Q4_K: _q_q4_K,
    GGMLType.Q5_K: _q_q5_K,
    GGMLType.Q6_K: _q_q6_K,
    GGMLType.MXFP4: _q_mxfp4,
    GGMLType.TQ2_0: _q_tq2_0,
    GGMLType.TQ1_0: _q_tq1_0,
    GGMLType.NVFP4: _q_nvfp4,
    GGMLType.IQ4_NL: _q_iq4_nl,
    GGMLType.IQ4_XS: _q_iq4_xs,
}


def _register_iq_quantizers():
    """i-quant grid-search encoders live in quant/iq_quantize.py (heavier
    machinery: codebook maps + neighbour shells); register lazily so plain
    K-quant use never pays their import."""
    from . import iq_quantize as iqq

    _QUANT.update({
        GGMLType.IQ1_S: iqq.q_iq1_s,
        GGMLType.IQ1_M: iqq.q_iq1_m,
        GGMLType.IQ2_XXS: iqq.q_iq2_xxs,
        GGMLType.IQ2_XS: iqq.q_iq2_xs,
        GGMLType.IQ2_S: iqq.q_iq2_s,
        GGMLType.IQ3_XXS: iqq.q_iq3_xxs,
        GGMLType.IQ3_S: iqq.q_iq3_s,
    })


_register_iq_quantizers()


def quant_supported() -> set[GGMLType]:
    return set(_QUANT) | {GGMLType.F32, GGMLType.F16, GGMLType.BF16}


_QUANT_WEIGHTED = None  # set below


def quantize(x: np.ndarray, qtype: GGMLType, imatrix=None) -> np.ndarray:
    """(..., n) float -> (..., row_bytes) uint8.

    imatrix: optional (n,) mean-x^2 activation weights (the importance
    matrix); supported by the K-quant scale searches (Q4_K/Q5_K/Q6_K),
    ignored for other types (matching the reference's per-type support).
    """
    qtype = GGMLType(qtype)
    x = np.asarray(x, np.float32)
    if qtype == GGMLType.F32:
        return x.view(np.uint8).reshape(*x.shape[:-1], -1)
    if qtype == GGMLType.F16:
        return x.astype(np.float16).view(np.uint8).reshape(*x.shape[:-1], -1)
    if qtype == GGMLType.BF16:
        return _q_bf16(x).reshape(*x.shape[:-1], -1)
    blk, bs = GGML_QUANT_SIZES[qtype]
    n = x.shape[-1]
    assert n % blk == 0, f"row length {n} not a multiple of block {blk}"
    fn = _QUANT[qtype]
    _IM_TYPES = (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
                 GGMLType.IQ4_NL, GGMLType.IQ4_XS,
                 GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
                 GGMLType.IQ3_XXS, GGMLType.IQ3_S,
                 GGMLType.IQ1_S, GGMLType.IQ1_M)
    if imatrix is not None and qtype in _IM_TYPES:
        im = np.asarray(imatrix, np.float32)
        assert im.shape == (n,), (im.shape, n)
        xr = x.reshape(-1, n)
        # per-block slice of the row-wide importance vector
        seg = blk
        outs = [fn(xr[:, j:j + seg], qw=im[j:j + seg])
                for j in range(0, n, seg)]
        out = np.concatenate(outs, axis=-1)
        return out.reshape(*x.shape[:-1], n // blk * bs)
    out = fn(x.reshape(-1, n))
    return out.reshape(*x.shape[:-1], n // blk * bs)
