"""K-major kernel layout: the TPU-native weight repack for fused dequant-matmul.

The reference CPU backend repacks quantized weights into interleaved row tiles
at load time (ggml/src/ggml-cpu/repack.cpp) so its SIMD dot kernels stream
them linearly. The TPU analogue, chosen for MXU/VPU geometry, is *transposed*
(K-major) storage with an affine per-group decomposition:

    W[n, k] = scale[n, k//gs] * (grid[n, k] + off) + bias[n, k//gs]  (affine)
    W[n, k] = scale[n, k//gs] * lut[grid[n, k]]                     (lut kinds)

stored COMPACTLY (the round-2 bandwidth fix — scales are the decode
bottleneck's metadata tax, so they stream at source density):

    q : packed grid, (K/2, N) u8 two-nibble planes (kind "u4") or (K, N) i8
        (kind "i8"); for "u4" the planes are HALF-SPLIT: element k of column
        n lives in row k (lo nibble) for k < K/2, row k-K/2 (hi nibble)
        otherwise. For "i8", row k directly.
    d   : (K/dstore, N) f32 superblock scale, stored one row per
          dstore = min(superblock, 128) elements (repeated 2x from per-256
          so K-tile metadata blocks stay sublane-legal; see KmSpec.dstore)
    s8  : (K/gs, N) i8 sub-scales (K-quants; scale = s8 * repeat(d))
    m8  : (K/gs, N) i8 sub-mins + dmin (K/dstore, N) f32 (affine K-quants;
          bias = -m8 * repeat(dmin))
    bm  : (K/gs, N) f32 direct bias (legacy Q4_1/Q5_1 'm')

Constant integer offsets (Q4_0's -8, Q5_0's -16) are applied in-kernel via
spec.off — matching the reference's (q - 8)*d evaluation order exactly
(ggml-quants.c dequantize_row_q4_0) instead of folding -8d into a bias row.

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
    """Compact kernel layout descriptor.

    The dequant decomposition is
        scale_rows = s8 * repeat(d)   (sb set: int8 sub-scales x f32 super-d)
                   = d                (sb None: d IS the per-gs f32 scale)
        bias_rows  = -m8 * repeat(dmin)   (bias "i8d": K-quant affine)
                   = bm                   (bias "f32": legacy Q4_1/Q5_1 m)
        W[k, n] = (grid[k, n] + off) * scale_rows[k//gs, n] + bias_rows

    Storing sub-scales as int8 and the f16-exact super-scale as one f32 row
    per superblock cuts the streamed metadata from ~1.5 extra bits/weight
    (round-1 f32-per-group layout) to ~0.5: Q4_K drops 6.0 -> 4.75 bpw,
    within 6% of the reference's own 4.5 (ggml-common.h block_q4_K).
    Numerics stay bit-exact: d/dmin are exact f32 images of the stored f16,
    s8/m8 are the exact 4/6-bit integers, and the kernel combines them in
    f32 exactly like dequantize_row_q4_K (ggml/src/ggml-quants.c)."""

    kind: str  # "u4" | "i8"
    gs: int  # elements per scale group
    sb: int | None = None  # superblock size for d (None: d is per-gs)
    bias: str = "none"  # "none" | "f32" (bm plane) | "i8d" (m8 x dmin)
    off: float = 0.0  # constant integer offset folded in-kernel
    lut: tuple | None = None  # 16-entry dequant LUT (kind "u4" only)

    @property
    def dgs(self) -> int:
        return self.sb or self.gs

    @property
    def dstore(self) -> int:
        """Preferred storage granularity of d/dmin rows. Superblock scales
        are stored repeated to one row per 128 elements: Mosaic requires
        block sublane dims divisible by 8, so per-256 rows would force
        4096-wide K-tiles (impossible for K=14336); per-128 keeps tk=2048
        legal at +0.125 bit/weight. Use dstore_for(spec, K) — small K falls
        back to per-gs rows so kq=8*gs tiles stay legal."""
        return min(self.sb, 128) if self.sb else self.gs


def dstore_for(spec: "KmSpec", K: int) -> int:
    """Actual d/dmin row granularity for a tensor with contraction dim K."""
    P = 2 if spec.kind == "u4" else 1
    ds = spec.dstore
    if (K // P) % (8 * ds):
        ds = spec.gs
    return ds


KM_SPECS: dict[GGMLType, KmSpec] = {
    GGMLType.Q4_0: KmSpec("u4", 32, off=-8),
    GGMLType.Q4_1: KmSpec("u4", 32, bias="f32"),
    GGMLType.Q5_0: KmSpec("i8", 32, off=-16),
    GGMLType.Q5_1: KmSpec("i8", 32, bias="f32"),
    GGMLType.Q8_0: KmSpec("i8", 32),
    GGMLType.Q2_K: KmSpec("i8", 16, sb=256, bias="i8d"),
    GGMLType.Q3_K: KmSpec("i8", 16, sb=256),
    GGMLType.Q4_K: KmSpec("u4", 32, sb=256, bias="i8d"),
    GGMLType.Q5_K: KmSpec("i8", 32, sb=256, bias="i8d"),
    GGMLType.Q6_K: KmSpec("i8", 16, sb=256),
    GGMLType.IQ4_NL: KmSpec("u4", 32, lut=LUT_IQ4NL),
    GGMLType.IQ4_XS: KmSpec("u4", 32, sb=256, lut=LUT_IQ4NL),
    GGMLType.MXFP4: KmSpec("u4", 32, lut=LUT_MXFP4),
    GGMLType.TQ2_0: KmSpec("i8", 256),
}

KMAJOR_TYPES = frozenset(KM_SPECS)


def _f32(a):
    return np.asarray(a, np.float32)


def _nib(qs):
    return qs & 0xF, qs >> 4


def _grid_fields(planar: dict, qtype: GGMLType):
    """planar (N-major, ggml element order) -> (grid (N,K) int, fields).

    grid values are the kernel's stored integers: unsigned nibble index for
    "u4" kinds, signed int8 value for "i8". fields is the compact metadata
    {d f32 (N, K/dgs) [, s8 i8 (N, K/gs), m8 i8, dmin f32, bm f32]}."""
    t = GGMLType(qtype)
    if t in (GGMLType.Q4_0, GGMLType.Q4_1):
        lo, hi = _nib(planar["qs"])
        grid = np.concatenate([lo, hi], axis=-1)  # (N, nb, 32) unsigned 0..15
        f = {"d": _f32(planar["d"])}
        if t == GGMLType.Q4_1:
            f["bm"] = _f32(planar["m"])
        return _fl(grid), f
    if t in (GGMLType.Q5_0, GGMLType.Q5_1):
        lo, hi = _nib(planar["qs"])
        bits = _qh_bits32(planar["qh"])
        grid = (np.concatenate([lo, hi], axis=-1) | (bits << 4)).astype(np.int16)
        f = {"d": _f32(planar["d"])}
        if t == GGMLType.Q5_1:
            f["bm"] = _f32(planar["m"])
        return _fl(grid), f
    if t == GGMLType.Q8_0:
        return _fl(planar["qs"].astype(np.int16)), {"d": _f32(planar["d"])}
    if t == GGMLType.Q2_K:
        bits = _2bit_grid(planar["qs"])  # (N, nb, 256)
        scf = planar["sc"]  # (N, nb, 16) u8: lo nibble scale, hi nibble min
        return _fl(bits), {
            "d": _f32(planar["d"]), "dmin": _f32(planar["dmin"]),
            "s8": (scf & 0xF).astype(np.int8), "m8": (scf >> 4).astype(np.int8)}
    if t == GGMLType.Q3_K:
        bits = _2bit_grid(planar["qs"]).astype(np.int16)
        e = np.arange(256)
        hm = planar["hmask"][..., e % 32].astype(np.int16)
        hbit = (hm >> (e // 32)) & 1
        grid = bits - np.where(hbit == 1, 0, 4)
        return _fl(grid), {"d": _f32(planar["d"]),
                           "s8": planar["sc"].astype(np.int8)}
    if t == GGMLType.Q4_K:
        g = planar["qs"].reshape(*planar["qs"].shape[:-1], 4, 32)
        grid = np.concatenate([g & 0xF, g >> 4], axis=-1).reshape(
            *planar["qs"].shape[:-1], 256)
        return _fl(grid), {
            "d": _f32(planar["d"]), "dmin": _f32(planar["dmin"]),
            "s8": planar["sc"].astype(np.int8), "m8": planar["mn"].astype(np.int8)}
    if t == GGMLType.Q5_K:
        qs = planar["qs"].reshape(*planar["qs"].shape[:-1], 4, 32).astype(np.int16)
        qh = planar["qh"].astype(np.int16)[..., None, :]
        g = np.arange(4)[:, None]
        lob = (qh >> (2 * g)) & 1
        hib = (qh >> (2 * g + 1)) & 1
        grid = np.concatenate([(qs & 0xF) + 16 * lob, (qs >> 4) + 16 * hib], axis=-1)
        grid = grid.reshape(*planar["qs"].shape[:-1], 256)
        return _fl(grid), {
            "d": _f32(planar["d"]), "dmin": _f32(planar["dmin"]),
            "s8": planar["sc"].astype(np.int8), "m8": planar["mn"].astype(np.int8)}
    if t == GGMLType.Q6_K:
        ql = planar["ql"].reshape(*planar["ql"].shape[:-1], 2, 64).astype(np.int16)
        qh = planar["qh"].reshape(*planar["qh"].shape[:-1], 2, 32).astype(np.int16)
        q1 = ((ql[..., :32] & 0xF) | ((qh & 3) << 4)) - 32
        q2 = ((ql[..., 32:] & 0xF) | (((qh >> 2) & 3) << 4)) - 32
        q3 = ((ql[..., :32] >> 4) | (((qh >> 4) & 3) << 4)) - 32
        q4 = ((ql[..., 32:] >> 4) | (((qh >> 6) & 3) << 4)) - 32
        grid = np.concatenate([q1, q2, q3, q4], axis=-1).reshape(
            *planar["ql"].shape[:-1], 256)
        return _fl(grid), {"d": _f32(planar["d"]),
                           "s8": planar["sc"].astype(np.int8)}
    if t == GGMLType.IQ4_NL:
        lo, hi = _nib(planar["qs"])
        grid = np.concatenate([lo, hi], axis=-1)
        return _fl(grid), {"d": _f32(planar["d"])}
    if t == GGMLType.IQ4_XS:
        qs = planar["qs"].reshape(*planar["qs"].shape[:-1], 8, 16)
        grid = np.concatenate([qs & 0xF, qs >> 4], axis=-1).reshape(
            *planar["qs"].shape[:-1], 256)
        return _fl(grid), {"d": _f32(planar["d"]),
                           "s8": planar["sc"].astype(np.int8)}
    if t == GGMLType.TQ2_0:
        q = planar["qs"].reshape(*planar["qs"].shape[:-1], 2, 32).astype(np.int16)
        parts = [((q >> s) & 3) - 1 for s in (0, 2, 4, 6)]
        grid = np.stack(parts, axis=-2).reshape(*planar["qs"].shape[:-1], 256)
        return _fl(grid), {"d": _f32(planar["d"])}
    if t == GGMLType.MXFP4:
        lo, hi = _nib(planar["qs"])
        grid = np.concatenate([lo, hi], axis=-1)
        e = planar["e"].astype(np.uint32)
        bits = np.where(e < 2, np.uint32(0x00200000) << e, (e - 1) << 23)
        d = bits.view(np.float32).reshape(e.shape)
        return _fl(grid), {"d": _f32(d)}
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
    """Planar (N-major) arrays -> compact K-major kernel dict
    {q, d[, s8, m8, dmin, bm]} (see KmSpec for the decomposition).

    N is zero-padded to a multiple of ``n_pad_to`` (padded columns have zero
    scale so they dequantize to exactly 0 even for LUT kinds)."""
    spec = KM_SPECS[GGMLType(qtype)]
    grid, fields = _grid_fields(planar, qtype)
    N, K = grid.shape
    npad = (-N) % n_pad_to
    if npad:
        grid = np.pad(grid, ((0, npad), (0, 0)))
        fields = {k: np.pad(v.reshape(N, -1), ((0, npad), (0, 0)))
                  for k, v in fields.items()}
    ds = dstore_for(spec, K)
    out = {"q": _pack_transposed(grid, spec.kind)}
    for k, v in fields.items():
        v2 = np.asarray(v).reshape(v.shape[0], -1)
        if k in ("d", "dmin") and spec.dgs != ds:
            v2 = np.repeat(v2, spec.dgs // ds, axis=-1)
        if v2.dtype == np.int8:
            out[k] = _t_i8(v2)
        else:
            out[k] = _t_f32(v2)
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


def _t_i8(a: np.ndarray) -> np.ndarray:
    """(N, G) int8 -> (G, N) int8 (native i8 transpose via the pack path)."""
    import ctypes

    a = np.ascontiguousarray(a, np.int8)
    N, G = a.shape
    lib = _native_repack()
    if lib is not None:
        out = np.empty((G, N), np.int8)
        lib.tpr_pack_i8(a.ctypes.data_as(ctypes.c_void_p),
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


def scale_rows_jnp(data: dict, spec: KmSpec):
    """Compact metadata -> (scale (K/gs, N) f32, bias (K/gs, N) f32 | None).

    The f32 combination d*s8 / -dmin*m8 reproduces the reference's
    dequantize_row_* scale math exactly (d, dmin are exact f32 images of the
    stored f16; s8/m8 the exact packed integers)."""
    import jax.numpy as jnp

    if spec.sb is not None:
        # d granularity inferred from the arrays (dstore_for at pack time)
        rep = data["s8"].shape[-2] // data["d"].shape[-2]
        scale = data["s8"].astype(jnp.float32) * jnp.repeat(data["d"], rep, axis=-2)
    else:
        scale = data["d"]
    bias = None
    if spec.bias == "i8d":
        rep = data["m8"].shape[-2] // data["dmin"].shape[-2]
        bias = -(data["m8"].astype(jnp.float32)
                 * jnp.repeat(data["dmin"], rep, axis=-2))
    elif spec.bias == "f32":
        bias = data["bm"]
    return scale, bias


def dequant_kmajor_jnp(data: dict, qtype: GGMLType, dtype):
    """Kernel arrays -> dense (Npad, K) weight, jnp (oracle/XLA fallback)."""
    import jax.numpy as jnp

    spec = KM_SPECS[GGMLType(qtype)]
    grid = unpack_grid_jnp(data["q"], spec.kind)  # (K, Npad) i32
    if spec.lut is not None:
        lut = jnp.asarray(spec.lut, jnp.float32)
        val = lut[grid]
    else:
        val = grid.astype(jnp.float32)
        if spec.off:
            val = val + spec.off
    scale, bias = scale_rows_jnp(data, spec)
    w = val * jnp.repeat(scale, spec.gs, axis=0)
    if bias is not None:
        w = w + jnp.repeat(bias, spec.gs, axis=0)
    return w.T.astype(dtype)  # (Npad, K)
