"""Jittable XLA dequantization from planar arrays.

This is the reference compute path (dequantize whole tensor -> matmul) and the
correctness oracle for the fused Pallas kernels. Numerics are bit-exact vs
tpullm.quant.numpy_impl when dtype=float32 (same fp16-scale semantics as the
reference CPU backend, ggml/src/ggml-quants.c dequantize_row_*).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..quant.numpy_impl import KVALUES_IQ4NL, KVALUES_MXFP4


def _f32(d):
    """f16-stored scale -> f32 for arithmetic."""
    return d.astype(jnp.float32)


def _nibbles(qs, axis=-1):
    """uint8 (..., n) -> lo/hi int32 each (..., n)."""
    q = qs.astype(jnp.int32)
    return q & 0xF, q >> 4


def _dq_q4_0(p):
    lo, hi = _nibbles(p["qs"])
    q = jnp.concatenate([lo, hi], axis=-1) - 8
    return _f32(p["d"])[..., None] * q.astype(jnp.float32)


def _dq_q4_1(p):
    lo, hi = _nibbles(p["qs"])
    q = jnp.concatenate([lo, hi], axis=-1)
    return _f32(p["d"])[..., None] * q.astype(jnp.float32) + _f32(p["m"])[..., None]


def _qh_bits32(qh):
    """(..., 4) uint8 -> (..., 32) bits in element order."""
    q = (
        qh[..., 0].astype(jnp.uint32)
        | (qh[..., 1].astype(jnp.uint32) << 8)
        | (qh[..., 2].astype(jnp.uint32) << 16)
        | (qh[..., 3].astype(jnp.uint32) << 24)
    )
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return ((q[..., None] >> shifts) & 1).astype(jnp.int32)


def _dq_q5_0(p):
    lo, hi = _nibbles(p["qs"])
    bits = _qh_bits32(p["qh"])
    q = (jnp.concatenate([lo, hi], axis=-1) | (bits << 4)) - 16
    return _f32(p["d"])[..., None] * q.astype(jnp.float32)


def _dq_q5_1(p):
    lo, hi = _nibbles(p["qs"])
    bits = _qh_bits32(p["qh"])
    q = jnp.concatenate([lo, hi], axis=-1) | (bits << 4)
    return _f32(p["d"])[..., None] * q.astype(jnp.float32) + _f32(p["m"])[..., None]


def _dq_q8_0(p):
    return _f32(p["d"])[..., None] * p["qs"].astype(jnp.float32)


def _dq_q8_K(p):
    return p["d"][..., None] * p["qs"].astype(jnp.float32)


def _2bit_grid(qs):
    """(..., 64) uint8 -> (..., 256) 2-bit values in ggml element order."""
    q = qs.reshape(*qs.shape[:-1], 2, 32).astype(jnp.int32)
    parts = [(q >> s) & 3 for s in (0, 2, 4, 6)]
    return jnp.stack(parts, axis=-2).reshape(*qs.shape[:-1], 256)


def _dq_q2_K(p):
    bits = _2bit_grid(p["qs"]).astype(jnp.float32)
    sc = p["sc"].astype(jnp.int32)
    dl = _f32(p["d"])[..., None] * (sc & 0xF).astype(jnp.float32)
    ml = _f32(p["dmin"])[..., None] * (sc >> 4).astype(jnp.float32)
    return jnp.repeat(dl, 16, axis=-1) * bits - jnp.repeat(ml, 16, axis=-1)


def _dq_q3_K(p):
    bits = _2bit_grid(p["qs"])
    e = np.arange(256)
    hm = jnp.take(p["hmask"], jnp.asarray(e % 32), axis=-1).astype(jnp.int32)
    hbit = (hm >> jnp.asarray(e // 32)) & 1
    q = (bits - jnp.where(hbit == 1, 0, 4)).astype(jnp.float32)
    sc16 = jnp.repeat(p["sc"].astype(jnp.float32), 16, axis=-1)
    return _f32(p["d"])[..., None] * sc16 * q


def _4bit_groups(qs):
    """(..., 128) uint8 -> (..., 256) in ggml q4_K element order."""
    g = qs.reshape(*qs.shape[:-1], 4, 32).astype(jnp.int32)
    return jnp.concatenate([g & 0xF, g >> 4], axis=-1).reshape(*qs.shape[:-1], 256)


def _dq_q4_K(p):
    q = _4bit_groups(p["qs"]).astype(jnp.float32)
    d_sub = _f32(p["d"])[..., None] * p["sc"].astype(jnp.float32)
    m_sub = _f32(p["dmin"])[..., None] * p["mn"].astype(jnp.float32)
    return jnp.repeat(d_sub, 32, axis=-1) * q - jnp.repeat(m_sub, 32, axis=-1)


def _dq_q5_K(p):
    qs = p["qs"].reshape(*p["qs"].shape[:-1], 4, 32).astype(jnp.int32)
    qh = p["qh"].astype(jnp.int32)[..., None, :]  # (..., 1, 32)
    g = jnp.arange(4)[:, None]
    lob = (qh >> (2 * g)) & 1
    hib = (qh >> (2 * g + 1)) & 1
    q = jnp.concatenate(
        [(qs & 0xF) + 16 * lob, (qs >> 4) + 16 * hib], axis=-1
    ).reshape(*p["qs"].shape[:-1], 256).astype(jnp.float32)
    d_sub = _f32(p["d"])[..., None] * p["sc"].astype(jnp.float32)
    m_sub = _f32(p["dmin"])[..., None] * p["mn"].astype(jnp.float32)
    return jnp.repeat(d_sub, 32, axis=-1) * q - jnp.repeat(m_sub, 32, axis=-1)


def _dq_q6_K(p):
    ql = p["ql"].reshape(*p["ql"].shape[:-1], 2, 64).astype(jnp.int32)
    qh = p["qh"].reshape(*p["qh"].shape[:-1], 2, 32).astype(jnp.int32)
    l_lo, l2_lo = ql[..., :32] & 0xF, ql[..., 32:] & 0xF
    l_hi, l2_hi = ql[..., :32] >> 4, ql[..., 32:] >> 4
    q1 = (l_lo | ((qh & 3) << 4)) - 32
    q2 = (l2_lo | (((qh >> 2) & 3) << 4)) - 32
    q3 = (l_hi | (((qh >> 4) & 3) << 4)) - 32
    q4 = (l2_hi | (((qh >> 6) & 3) << 4)) - 32
    q = jnp.concatenate([q1, q2, q3, q4], axis=-1).reshape(*p["ql"].shape[:-1], 256)
    sc16 = jnp.repeat(p["sc"].astype(jnp.float32), 16, axis=-1)
    return _f32(p["d"])[..., None] * sc16 * q.astype(jnp.float32)


def _dq_iq4_nl(p):
    lut = jnp.asarray(KVALUES_IQ4NL)
    lo, hi = _nibbles(p["qs"])
    q = jnp.concatenate([lut[lo], lut[hi]], axis=-1)
    return _f32(p["d"])[..., None] * q


def _dq_iq4_xs(p):
    lut = jnp.asarray(KVALUES_IQ4NL)
    qs = p["qs"].reshape(*p["qs"].shape[:-1], 8, 16).astype(jnp.int32)
    q = jnp.concatenate([lut[qs & 0xF], lut[qs >> 4]], axis=-1)  # (..., 8, 32)
    dl = _f32(p["d"])[..., None] * p["sc"].astype(jnp.float32)  # (..., 8)
    return (dl[..., None] * q).reshape(*p["qs"].shape[:-1], 256)


def _dq_mxfp4(p):
    lut = jnp.asarray(KVALUES_MXFP4)
    e = p["e"].astype(jnp.uint32)
    bits = jnp.where(e < 2, jnp.uint32(0x00200000) << e, (e - 1) << 23)
    d = jax_bitcast_f32(bits)[..., None]
    lo, hi = _nibbles(p["qs"])
    return d * jnp.concatenate([lut[lo], lut[hi]], axis=-1)


def jax_bitcast_f32(u32):
    import jax.lax as lax

    return lax.bitcast_convert_type(u32, jnp.float32)


def _dq_tq2_0(p):
    q = p["qs"].reshape(*p["qs"].shape[:-1], 2, 32).astype(jnp.int32)
    parts = [((q >> s) & 3) - 1 for s in (0, 2, 4, 6)]
    grid = jnp.stack(parts, axis=-2).reshape(*p["qs"].shape[:-1], 256)
    return _f32(p["d"])[..., None] * grid.astype(jnp.float32)


_DEQUANT_JAX = {
    GGMLType.Q4_0: _dq_q4_0,
    GGMLType.Q4_1: _dq_q4_1,
    GGMLType.Q5_0: _dq_q5_0,
    GGMLType.Q5_1: _dq_q5_1,
    GGMLType.Q8_0: _dq_q8_0,
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
}


def dequant_jax(planar: dict, qtype: GGMLType, dtype=jnp.float32):
    """planar arrays (..., nb, ...) -> (..., nb*block) dense, in ``dtype``."""
    qtype = GGMLType(qtype)
    y = _DEQUANT_JAX[qtype](planar)
    y = y.reshape(*y.shape[:-2], y.shape[-2] * y.shape[-1])
    return y.astype(dtype)
