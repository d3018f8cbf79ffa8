"""K-major kernel layout: the TPU-native weight repack for fused dequant-matmul.

The reference CPU backend repacks quantized weights into interleaved row tiles
at load time (ggml/src/ggml-cpu/repack.cpp) so its SIMD dot kernels stream
them linearly. The TPU analogue, chosen for MXU/VPU geometry, is *transposed*
(K-major) storage with an affine per-group decomposition:

    W[n, k] = scale[n, k//gs] * grid[n, k] + bias[n, k//gs]          (affine)
    W[n, k] = scale[n, k//gs] * lut[grid[n, k]]                     (lut kinds)

stored as

    q : packed grid, (K/2, N) u8 two-nibble planes (kind "u4") or (K, N) i8
        (kind "i8"); for "u4" the planes are HALF-SPLIT: element k of column
        n lives in row k (lo nibble) for k < K/2, row k-K/2 (hi nibble)
        otherwise. For "i8", row k directly.
    sc: (K/gs, N) f32 combined scale   (e.g. d*sub_scale for K-quants)
    bi: (K/gs, N) f32 combined bias    (e.g. -dmin*min; absent if zero)

Why: the matmul contraction runs over K, so in-kernel scale expansion is a
*sublane* repeat (cheap register broadcast), and N sits on the 128-lane
axis. Half-split planes mean plane j of the activation is the contiguous
slice x[:, j*K/2:(j+1)*K/2] (a free static slice even for activations
produced inside a kernel), and plane j's scale groups are the contiguous
rows sc[j*G/2:(j+1)*G/2] — both essential for chaining several matmuls in
one Pallas program. Integer offsets fold into the bias
(sc*(u-off) + b == sc*u + (b - sc*off)), so packed nibbles stay unsigned.

Numerics match ggml dequantize_row_* (ggml/src/ggml-quants.c) with scales
combined in f32; see tests/test_qmm.py for the bit-exactness bounds.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..gguf.constants import GGMLType
from .numpy_impl import KVALUES_IQ4NL, KVALUES_MXFP4

# 16-entry dequant LUTs (ggml-common.h kvalues_mxfp4 / kvalues_iq4nl)
LUT_MXFP4 = tuple(float(v) for v in KVALUES_MXFP4)
LUT_IQ4NL = tuple(float(v) for v in KVALUES_IQ4NL)


@dataclass(frozen=True)
class KmSpec:
    kind: str  # "u4" | "i8"
    gs: int  # elements per scale group
    has_bias: bool
    lut: tuple | None = None  # 16-entry dequant LUT (kind "u4" only)


KM_SPECS: dict[GGMLType, KmSpec] = {
    GGMLType.Q4_0: KmSpec("u4", 32, True),
    GGMLType.Q4_1: KmSpec("u4", 32, True),
    GGMLType.Q5_0: KmSpec("i8", 32, True),
    GGMLType.Q5_1: KmSpec("i8", 32, True),
    GGMLType.Q8_0: KmSpec("i8", 32, False),
    GGMLType.Q2_K: KmSpec("i8", 16, True),
    GGMLType.Q3_K: KmSpec("i8", 16, False),
    GGMLType.Q4_K: KmSpec("u4", 32, True),
    GGMLType.Q5_K: KmSpec("i8", 32, True),
    GGMLType.Q6_K: KmSpec("i8", 16, False),
    GGMLType.IQ4_NL: KmSpec("u4", 32, False, LUT_IQ4NL),
    GGMLType.IQ4_XS: KmSpec("u4", 32, False, LUT_IQ4NL),
    GGMLType.MXFP4: KmSpec("u4", 32, False, LUT_MXFP4),
    GGMLType.TQ2_0: KmSpec("i8", 256, False),
}

KMAJOR_TYPES = frozenset(KM_SPECS)


def _f32(a):
    return np.asarray(a, np.float32)


def _nib(qs):
    return qs & 0xF, qs >> 4


def _grid_scale_bias(planar: dict, qtype: GGMLType):
    """planar (N-major, ggml element order) -> (grid (N,K) int, sc (N,G) f32,
    bi (N,G) f32 | None). grid values are the kernel's stored integers:
    unsigned nibble index for "u4" kinds, signed int8 value for "i8"."""
    t = GGMLType(qtype)
    if t in (GGMLType.Q4_0, GGMLType.Q4_1):
        lo, hi = _nib(planar["qs"])
        grid = np.concatenate([lo, hi], axis=-1)  # (N, nb, 32) unsigned 0..15
        d = _f32(planar["d"])
        bi = -8.0 * d if t == GGMLType.Q4_0 else _f32(planar["m"])
        return _fl(grid), _fl2(d), _fl2(bi)
    if t in (GGMLType.Q5_0, GGMLType.Q5_1):
        lo, hi = _nib(planar["qs"])
        bits = _qh_bits32(planar["qh"])
        grid = (np.concatenate([lo, hi], axis=-1) | (bits << 4)).astype(np.int16)
        d = _f32(planar["d"])
        bi = -16.0 * d if t == GGMLType.Q5_0 else _f32(planar["m"])
        return _fl(grid), _fl2(d), _fl2(bi)
    if t == GGMLType.Q8_0:
        return _fl(planar["qs"].astype(np.int16)), _fl2(_f32(planar["d"])), None
    if t == GGMLType.Q2_K:
        bits = _2bit_grid(planar["qs"])  # (N, nb, 256)
        scf = planar["sc"].astype(np.int16)  # (N, nb, 16)
        d = _f32(planar["d"])[..., None]
        dmin = _f32(planar["dmin"])[..., None]
        sc = d * (scf & 0xF)
        bi = -(dmin * (scf >> 4))
        return _fl(bits), _fl2(sc), _fl2(bi)
    if t == GGMLType.Q3_K:
        bits = _2bit_grid(planar["qs"]).astype(np.int16)
        e = np.arange(256)
        hm = planar["hmask"][..., e % 32].astype(np.int16)
        hbit = (hm >> (e // 32)) & 1
        grid = bits - np.where(hbit == 1, 0, 4)
        sc = _f32(planar["d"])[..., None] * planar["sc"].astype(np.float32)
        return _fl(grid), _fl2(sc), None
    if t == GGMLType.Q4_K:
        g = planar["qs"].reshape(*planar["qs"].shape[:-1], 4, 32)
        grid = np.concatenate([g & 0xF, g >> 4], axis=-1).reshape(
            *planar["qs"].shape[:-1], 256)
        d = _f32(planar["d"])[..., None]
        dmin = _f32(planar["dmin"])[..., None]
        sc = d * planar["sc"].astype(np.float32)
        bi = -(dmin * planar["mn"].astype(np.float32))
        return _fl(grid), _fl2(sc), _fl2(bi)
    if t == GGMLType.Q5_K:
        qs = planar["qs"].reshape(*planar["qs"].shape[:-1], 4, 32).astype(np.int16)
        qh = planar["qh"].astype(np.int16)[..., None, :]
        g = np.arange(4)[:, None]
        lob = (qh >> (2 * g)) & 1
        hib = (qh >> (2 * g + 1)) & 1
        grid = np.concatenate([(qs & 0xF) + 16 * lob, (qs >> 4) + 16 * hib], axis=-1)
        grid = grid.reshape(*planar["qs"].shape[:-1], 256)
        d = _f32(planar["d"])[..., None]
        dmin = _f32(planar["dmin"])[..., None]
        sc = d * planar["sc"].astype(np.float32)
        bi = -(dmin * planar["mn"].astype(np.float32))
        return _fl(grid), _fl2(sc), _fl2(bi)
    if t == GGMLType.Q6_K:
        ql = planar["ql"].reshape(*planar["ql"].shape[:-1], 2, 64).astype(np.int16)
        qh = planar["qh"].reshape(*planar["qh"].shape[:-1], 2, 32).astype(np.int16)
        q1 = ((ql[..., :32] & 0xF) | ((qh & 3) << 4)) - 32
        q2 = ((ql[..., 32:] & 0xF) | (((qh >> 2) & 3) << 4)) - 32
        q3 = ((ql[..., :32] >> 4) | (((qh >> 4) & 3) << 4)) - 32
        q4 = ((ql[..., 32:] >> 4) | (((qh >> 6) & 3) << 4)) - 32
        grid = np.concatenate([q1, q2, q3, q4], axis=-1).reshape(
            *planar["ql"].shape[:-1], 256)
        sc = _f32(planar["d"])[..., None] * planar["sc"].astype(np.float32)
        return _fl(grid), _fl2(sc), None
    if t == GGMLType.IQ4_NL:
        lo, hi = _nib(planar["qs"])
        grid = np.concatenate([lo, hi], axis=-1)
        return _fl(grid), _fl2(_f32(planar["d"])), None
    if t == GGMLType.IQ4_XS:
        qs = planar["qs"].reshape(*planar["qs"].shape[:-1], 8, 16)
        grid = np.concatenate([qs & 0xF, qs >> 4], axis=-1).reshape(
            *planar["qs"].shape[:-1], 256)
        sc = _f32(planar["d"])[..., None] * planar["sc"].astype(np.float32)
        return _fl(grid), _fl2(sc), None
    if t == GGMLType.TQ2_0:
        q = planar["qs"].reshape(*planar["qs"].shape[:-1], 2, 32).astype(np.int16)
        parts = [((q >> s) & 3) - 1 for s in (0, 2, 4, 6)]
        grid = np.stack(parts, axis=-2).reshape(*planar["qs"].shape[:-1], 256)
        return _fl(grid), _fl2(_f32(planar["d"])), None
    if t == GGMLType.MXFP4:
        lo, hi = _nib(planar["qs"])
        grid = np.concatenate([lo, hi], axis=-1)
        e = planar["e"].astype(np.uint32)
        bits = np.where(e < 2, np.uint32(0x00200000) << e, (e - 1) << 23)
        d = bits.view(np.float32).reshape(e.shape)
        return _fl(grid), _fl2(d), None
    raise NotImplementedError(f"kmajor layout for {t.name}")


def _fl(a):
    """(N, nb, blk) -> (N, K) keeping element order."""
    return np.ascontiguousarray(a.reshape(a.shape[0], -1))


def _fl2(a):
    """(N, nb[, sub]) -> (N, G) f32."""
    return np.ascontiguousarray(np.asarray(a, np.float32).reshape(a.shape[0], -1))


def _qh_bits32(qh):
    q = (
        qh[..., 0].astype(np.uint32)
        | (qh[..., 1].astype(np.uint32) << 8)
        | (qh[..., 2].astype(np.uint32) << 16)
        | (qh[..., 3].astype(np.uint32) << 24)
    )
    shifts = np.arange(32, dtype=np.uint32)
    return ((q[..., None] >> shifts) & 1).astype(np.uint8)


def _2bit_grid(qs):
    q = qs.reshape(*qs.shape[:-1], 2, 32)
    parts = [(q >> s) & 3 for s in (0, 2, 4, 6)]
    return np.stack(parts, axis=-2).reshape(*qs.shape[:-1], 256)


def pack_kmajor(planar: dict, qtype: GGMLType, n_pad_to: int = 256) -> dict[str, np.ndarray]:
    """Planar (N-major) arrays -> K-major kernel dict {q, sc[, bi]}.

    N is zero-padded to a multiple of ``n_pad_to`` (padded columns have zero
    scale so they dequantize to exactly 0 even for LUT kinds).
    """
    spec = KM_SPECS[GGMLType(qtype)]
    grid, sc, bi = _grid_scale_bias(planar, qtype)
    N, K = grid.shape
    npad = (-N) % n_pad_to
    if npad:
        grid = np.pad(grid, ((0, npad), (0, 0)))
        sc = np.pad(sc, ((0, npad), (0, 0)))
        if bi is not None:
            bi = np.pad(bi, ((0, npad), (0, 0)))
    q = _pack_transposed(grid, spec.kind)
    out = {"q": q, "sc": _t_f32(sc)}
    if bi is not None:
        out["bi"] = _t_f32(bi)
    return out


def _native_repack():
    from ..utils.native import load_native

    return load_native("repack", ("-fopenmp",))


def _pack_transposed(grid: np.ndarray, kind: str) -> np.ndarray:
    """(Npad, K) int grid -> packed (K/2, Npad) u8 or (K, Npad) i8.

    Uses the native fused transpose+pack (native/repack.cpp) when available
    — the numpy strided transpose costs seconds per large tensor."""
    import ctypes

    N, K = grid.shape
    lib = _native_repack()
    if lib is not None:
        if kind == "u4":
            g8 = np.ascontiguousarray(grid.astype(np.uint8))
            out = np.empty((K // 2, N), np.uint8)
            lib.tpr_pack_u4(g8.ctypes.data_as(ctypes.c_void_p),
                            ctypes.c_int64(N), ctypes.c_int64(K),
                            out.ctypes.data_as(ctypes.c_void_p))
            return out
        g8 = np.ascontiguousarray(grid.astype(np.int8))
        out = np.empty((K, N), np.int8)
        lib.tpr_pack_i8(g8.ctypes.data_as(ctypes.c_void_p),
                        ctypes.c_int64(N), ctypes.c_int64(K),
                        out.ctypes.data_as(ctypes.c_void_p))
        return out
    gt = np.ascontiguousarray(grid.T)
    if kind == "u4":
        return (gt[: K // 2] | (gt[K // 2:] << 4)).astype(np.uint8)
    return gt.astype(np.int8)


def _t_f32(a: np.ndarray) -> np.ndarray:
    import ctypes

    a = np.ascontiguousarray(a, np.float32)
    N, G = a.shape
    lib = _native_repack()
    if lib is not None:
        out = np.empty((G, N), np.float32)
        lib.tpr_transpose_f32(a.ctypes.data_as(ctypes.c_void_p),
                              ctypes.c_int64(N), ctypes.c_int64(G),
                              out.ctypes.data_as(ctypes.c_void_p))
        return out
    return np.ascontiguousarray(a.T)


def unpack_grid_jnp(q, kind: str):
    """Packed kernel quants -> integer grid (K, Npad) int32, jnp."""
    import jax.numpy as jnp

    qi = q.astype(jnp.int32)
    if kind == "u4":
        # half-split planes: rows [0, K/2) = lo nibbles, [K/2, K) = hi
        return jnp.concatenate([qi & 0xF, qi >> 4], axis=0)
    return qi


def dequant_kmajor_jnp(data: dict, qtype: GGMLType, dtype):
    """Kernel arrays -> dense (Npad, K) weight, jnp (oracle/XLA fallback)."""
    import jax.numpy as jnp

    spec = KM_SPECS[GGMLType(qtype)]
    grid = unpack_grid_jnp(data["q"], spec.kind)  # (K, Npad) i32
    K = grid.shape[0]
    if spec.lut is not None:
        lut = jnp.asarray(spec.lut, jnp.float32)
        val = lut[grid]
    else:
        val = grid.astype(jnp.float32)
    sc = jnp.repeat(data["sc"], spec.gs, axis=0)
    w = val * sc
    if "bi" in data:
        w = w + jnp.repeat(data["bi"], spec.gs, axis=0)
    return w.T.astype(dtype)  # (Npad, K)
