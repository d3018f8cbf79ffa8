"""Fused dequant-matmul Pallas kernel over K-major quantized weights.

This replaces the reference's per-arch SIMD vec_dot / MMQ kernels
(ggml/src/ggml-cpu/arch/*/quants.c, ggml/src/ggml-cuda/mmq.cuh) with ONE
generic TPU kernel: packed quants stream HBM->VMEM at quantized density,
nibble planes are unpacked on the VPU, per-group scales expand along
sublanes, and the dequantized bf16 tile feeds the MXU. Decode (M<=16) is
HBM-bound at ~0.5x dense-bf16 stream rate but moves ~4x fewer bytes; prefill
amortizes dequant across the M tile.

Grid: (nM, nN, nK) with K innermost accumulating into a f32 VMEM scratch
(the CUDA mmq tiling analogue, but the compiler double-buffers the streams).

The kernel expects the layout produced by tpullm.quant.kmajor.pack_kmajor;
`qmm()` is the public entry and falls back to dequant+dot off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf.constants import GGMLType
from ..quant.kmajor import KM_SPECS, KmSpec

DEF_TILE_N = 256
DEF_TILE_K = 2048


def _pick_tile(total: int, candidates) -> int:
    for c in candidates:
        if total % c == 0:
            return c
    return 0


def _lut_select(u, lut):
    """16-entry LUT lookup as a binary select tree (VPU; no gather needed)."""
    vals = [float(v) for v in lut]
    b0 = (u & 1) == 1
    lvl = [jnp.where(b0, vals[2 * i + 1], vals[2 * i]) for i in range(8)]
    for bit in (1, 2, 3):
        b = (u & (1 << bit)) != 0
        lvl = [jnp.where(b, lvl[2 * i + 1], lvl[2 * i]) for i in range(len(lvl) // 2)]
    return lvl[0]


def _make_kernel(spec: KmSpec, nK: int, out_dtype):
    n_planes = 2 if spec.kind == "u4" else 1

    def kernel(*refs):
        if spec.has_bias:
            xp_ref, q_ref, sc_ref, bi_ref, o_ref, acc_ref = refs
        else:
            xp_ref, q_ref, sc_ref, o_ref, acc_ref = refs
            bi_ref = None

        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        q = q_ref[...].astype(jnp.int32)
        rep = spec.gs // n_planes
        sc = jnp.repeat(sc_ref[...], rep, axis=0)
        bi = jnp.repeat(bi_ref[...], rep, axis=0) if bi_ref is not None else None
        for j in range(n_planes):
            u = (q >> (4 * j)) & 0xF if spec.kind == "u4" else q
            if spec.lut is not None:
                val = _lut_select(u, spec.lut)
            else:
                val = u.astype(jnp.float32)
            w = val * sc
            if bi is not None:
                w = w + bi
            acc_ref[...] += jax.lax.dot_general(
                xp_ref[j], w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(pl.program_id(2) == nK - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_qmm(qtype: GGMLType, M_pad: int, N: int, K: int, has_bias: bool,
               tile_m: int, tile_n: int, tile_k: int, out_dtype_name: str,
               interpret: bool):
    spec = KM_SPECS[qtype]
    out_dtype = jnp.dtype(out_dtype_name)
    nM, nN, nK = M_pad // tile_m, N // tile_n, K // tile_k
    n_planes = 2 if spec.kind == "u4" else 1
    kq = tile_k // n_planes  # rows of the packed quant tile
    gp = tile_k // spec.gs

    in_specs = [
        pl.BlockSpec((n_planes, tile_m, kq), lambda m, i, k: (0, m, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kq, tile_n), lambda m, i, k: (k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((gp, tile_n), lambda m, i, k: (k, i), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((gp, tile_n), lambda m, i, k: (k, i), memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nM, nN, nK),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda m, i, k: (m, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
    )
    qbytes = N * K // (2 if spec.kind == "u4" else 1) + \
        (2 if has_bias else 1) * N * (K // spec.gs) * 4
    return pl.pallas_call(
        _make_kernel(spec, nK, out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_pad * N * K, bytes_accessed=int(qbytes), transcendentals=0),
        interpret=interpret,
    )


def qmm_supported(qtype: GGMLType, K: int) -> bool:
    t = GGMLType(qtype)
    if t not in KM_SPECS:
        return False
    spec = KM_SPECS[t]
    min_k = 8 * spec.gs  # scale tile needs >=8 sublanes
    return K % min_k == 0


def qmm_kmajor(x, data: dict, qtype: GGMLType, n_logical: int,
               out_dtype=jnp.bfloat16, interpret: bool = False,
               tile_n: int | None = None, tile_k: int | None = None):
    """x (..., K) @ W^T for K-major kernel arrays; returns (..., n_logical).

    Jit-traceable: shapes are static; the pallas_call is cached per signature.
    """
    qtype = GGMLType(qtype)
    spec = KM_SPECS[qtype]
    lead = x.shape[:-1]
    K = x.shape[-1]
    M = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    Npad = data["q"].shape[1]

    M_pad = max(16, int(2 ** np.ceil(np.log2(M))) if M > 16 else 16)
    if M_pad % 16:
        M_pad += 16 - M_pad % 16
    tm = min(M_pad, 256)
    tn = tile_n or _pick_tile(Npad, (DEF_TILE_N, 512, 128))
    tk = tile_k or _pick_tile(K, (DEF_TILE_K, 1024, 512, 256, 128))
    if tk < 8 * spec.gs:
        tk = 0
    if not tn or not tk:
        raise ValueError(f"qmm: no tile for N={Npad} K={K} {qtype.name}")

    if spec.kind == "u4":
        xp = jnp.stack([x2[:, 0::2], x2[:, 1::2]])  # (2, M, K/2)
    else:
        xp = x2[None]
    if M_pad != M:
        xp = jnp.pad(xp, ((0, 0), (0, M_pad - M), (0, 0)))

    fn = _build_qmm(qtype, M_pad, Npad, K, "bi" in data, tm, tn, tk,
                    jnp.dtype(out_dtype).name, interpret)
    args = (xp, data["q"], data["sc"]) + ((data["bi"],) if "bi" in data else ())
    y = fn(*args)
    return y[:M, :n_logical].reshape(*lead, n_logical)


def use_pallas() -> bool:
    """Kernel path is on only when the trace-time default backend is TPU."""
    import os

    if os.environ.get("TPULLM_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def qmm(x, qt, out_dtype=jnp.bfloat16, interpret: bool = False):
    """x (..., n_in) @ W^T for a QTensor W (n_out, n_in); fused kernel when
    the weight is in kmajor layout on TPU, else dequant-then-dot (the
    reference path: full dequant + cuBLAS, ggml-cuda convert.cu)."""
    if (
        qt.is_quantized
        and qt.layout == "kmajor"
        and qt.data["q"].ndim == 2
        and (interpret or use_pallas())
    ):
        return qmm_kmajor(x, qt.data, qt.qtype, qt.n_out, out_dtype, interpret)
    w = qt.dequant(out_dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
