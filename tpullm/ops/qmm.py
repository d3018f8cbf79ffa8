"""Fused dequant-matmul Pallas kernel over K-major quantized weights.

This replaces the reference's per-arch SIMD vec_dot / MMQ kernels
(ggml/src/ggml-cpu/arch/*/quants.c, ggml/src/ggml-cuda/mmq.cuh) with ONE
generic TPU kernel: packed quants stream HBM->VMEM at quantized density,
nibble planes are unpacked on the VPU, per-group scales expand along
sublanes, and the dequantized bf16 tile feeds the MXU. Decode (M<=16) is
HBM-bound; prefill amortizes dequant across the M tile.

Layer-stacked weights are indexed INSIDE the kernel via scalar prefetch
(PrefetchScalarGridSpec): the block index_map offsets into the stacked HBM
array, so a lax.scan over layers passes only a layer id and XLA never
materializes a per-layer slice copy. Measured on one v5e: 422 GB/s effective
(vs 211 GB/s when XLA slice-copies each layer, 712 GB/s dense-bf16 ceiling).

Grid: (nM, nN, nK) with K innermost accumulating into a f32 VMEM scratch
(the CUDA mmq tiling analogue, but the compiler double-buffers the streams).

The kernel expects the layout from tpullm.quant.kmajor.pack_kmajor; `qmm()`
is the public entry and falls back to dequant+dot off-TPU.
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


def _make_kernel(spec: KmSpec, nK: int, out_dtype, stacked: bool):
    n_planes = 2 if spec.kind == "u4" else 1

    def kernel(*refs):
        if stacked:
            refs = refs[1:]  # drop the scalar-prefetch layer-id ref
        if spec.has_bias:
            xp_ref, q_ref, sc_ref, bi_ref, o_ref, acc_ref = refs
        else:
            xp_ref, q_ref, sc_ref, o_ref, acc_ref = refs
            bi_ref = None

        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        q = (q_ref[0] if stacked else q_ref[...]).astype(jnp.int32)
        rep = spec.gs // n_planes
        sc = jnp.repeat(sc_ref[0] if stacked else sc_ref[...], rep, axis=0)
        bi = None
        if bi_ref is not None:
            bi = jnp.repeat(bi_ref[0] if stacked else bi_ref[...], rep, axis=0)
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
               stacked: bool, interpret: bool):
    spec = KM_SPECS[qtype]
    out_dtype = jnp.dtype(out_dtype_name)
    nM, nN, nK = M_pad // tile_m, N // tile_n, K // tile_k
    n_planes = 2 if spec.kind == "u4" else 1
    kq = tile_k // n_planes  # rows of the packed quant tile
    gp = tile_k // spec.gs

    if stacked:
        def w_spec(rows):
            return pl.BlockSpec((1, rows, tile_n), lambda m, i, k, lr: (lr[0], k, i),
                                memory_space=pltpu.VMEM)

        x_spec = pl.BlockSpec((n_planes, tile_m, kq), lambda m, i, k, lr: (0, m, k),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((tile_m, tile_n), lambda m, i, k, lr: (m, i),
                              memory_space=pltpu.VMEM)
    else:
        def w_spec(rows):
            return pl.BlockSpec((rows, tile_n), lambda m, i, k: (k, i),
                                memory_space=pltpu.VMEM)

        x_spec = pl.BlockSpec((n_planes, tile_m, kq), lambda m, i, k: (0, m, k),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((tile_m, tile_n), lambda m, i, k: (m, i),
                              memory_space=pltpu.VMEM)

    in_specs = [x_spec, w_spec(kq), w_spec(gp)]
    if has_bias:
        in_specs.append(w_spec(gp))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if stacked else 0,
        grid=(nM, nN, nK),
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
    )
    qbytes = N * K // (2 if spec.kind == "u4" else 1) + \
        (2 if has_bias else 1) * N * (K // spec.gs) * 4
    return pl.pallas_call(
        _make_kernel(spec, nK, out_dtype, stacked),
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
               layer=None, tile_n: int | None = None, tile_k: int | None = None):
    """x (..., K) @ W^T for K-major kernel arrays; returns (..., n_logical).

    With ``layer`` (a traced int32 scalar) the arrays are layer-stacked
    (L, ...) and the kernel indexes the layer in its block index_map.
    Jit-traceable: shapes are static; the pallas_call is cached per signature.
    """
    qtype = GGMLType(qtype)
    spec = KM_SPECS[qtype]
    stacked = layer is not None
    lead = x.shape[:-1]
    K = x.shape[-1]
    M = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    Npad = data["q"].shape[-1]

    M_pad = M if M >= 16 else 16
    if M_pad % 16:
        M_pad += 16 - M_pad % 16
    if M_pad > 256 and M_pad % 256:
        M_pad += 256 - M_pad % 256
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
                    jnp.dtype(out_dtype).name, stacked, interpret)
    args = (xp, data["q"], data["sc"]) + ((data["bi"],) if "bi" in data else ())
    if stacked:
        lid = jnp.asarray(layer, jnp.int32).reshape(1)
        y = fn(lid, *args)
    else:
        y = fn(*args)
    return y[:M, :n_logical].reshape(*lead, n_logical)


def use_pallas() -> bool:
    """Kernel path is on only when the trace-time default backend is TPU."""
    import os

    if os.environ.get("TPULLM_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def qmm(x, qt, out_dtype=jnp.bfloat16, layer=None, interpret: bool = False):
    """x (..., n_in) @ W^T for a QTensor W (n_out, n_in); fused kernel when
    the weight is in kmajor layout on TPU, else dequant-then-dot (the
    reference path: full dequant + cuBLAS, ggml-cuda convert.cu).

    ``layer``: traced layer index for layer-stacked (L, n_out, n_in) weights
    closed over a lax.scan — avoids materializing per-layer slices.
    """
    data = qt.data
    wdim = next(iter(data.values())).ndim
    if (
        qt.is_quantized
        and qt.layout == "kmajor"
        and (wdim == 2 if layer is None else wdim == 3)
        and (interpret or use_pallas())
    ):
        return qmm_kmajor(x, data, qt.qtype, qt.n_out, out_dtype, interpret, layer)
    if layer is not None:
        data = {k: jax.lax.dynamic_index_in_dim(v, layer, 0, keepdims=False)
                for k, v in data.items()}
        qt = type(qt)(qt.qtype, qt.shape[1:], data)
    w = qt.dequant(out_dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)