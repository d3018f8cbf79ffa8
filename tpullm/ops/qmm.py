"""Fused dequant-matmul Pallas kernel over K-major quantized weights.

This replaces the reference's per-arch SIMD vec_dot / MMQ kernels
(ggml/src/ggml-cpu/arch/*/quants.c, ggml/src/ggml-cuda/mmq.cuh) with ONE
generic TPU kernel: packed quants stream HBM->VMEM at quantized density,
nibble planes are unpacked on the VPU, per-group scales expand along
sublanes, and the dequantized bf16 tile feeds the MXU.

Key layout facts (tpullm.quant.kmajor): weights are K-major; 4-bit planes
are half-split (plane j = contiguous elements [j*K/2, (j+1)*K/2)), so the
activation operand of plane j is a static contiguous slice and plane j's
scales are contiguous scale rows — this keeps the glue free and lets several
matmuls chain inside one Pallas program (program switches on this TPU cost
~25-80us each, which dominated decode before).

Two kernel shapes:
- split-K (decode, M<=32): fully-parallel grid (nS, nN); each step writes a
  partial product slab, XLA sums the nS slabs. No sequential grid dim ->
  Mosaic pipelines freely (~1.5-2x over K-innermost accumulation).
- K-accumulating (prefill): grid (nM, nN, nK), f32 scratch accumulator (the
  CUDA mmq tiling analogue).

Layer-stacked weights are indexed INSIDE the kernel via scalar prefetch:
a lax.scan over layers passes a layer id; XLA never materializes per-layer
weight slices (another ~2x for decode).
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


def _n_planes(spec: KmSpec) -> int:
    return 2 if spec.kind == "u4" else 1


def _plane_tile(spec: KmSpec, q, sc, bi, j):
    """Dequantize plane j of a packed tile -> bf16 weight tile.

    q: (tkp, tn) packed tile; sc/bi: (gpp, tn) plane-j scale rows."""
    u = (q >> (4 * j)) & 0xF if spec.kind == "u4" else q
    if spec.lut is not None:
        val = _lut_select(u, spec.lut)
    else:
        val = u.astype(jnp.float32)
    w = val * jnp.repeat(sc, spec.gs, axis=0)
    if bi is not None:
        w = w + jnp.repeat(bi, spec.gs, axis=0)
    return w.astype(jnp.bfloat16)


def _wspecs(spec: KmSpec, nK: int, tile_n: int, tile_k: int, has_bias: bool,
            stacked: bool, idx):
    """BlockSpecs for [q, sc_0..P-1, (bi_0..P-1)].

    `idx(grid_indices...) -> (k, i)` gives the k-tile and n-tile for a step.
    Plane j's scale rows for k-tile k live at row-block j*nK + k.
    """
    P = _n_planes(spec)
    kq = tile_k // P
    gpp = kq // spec.gs

    def blk(shape, imap):
        if stacked:
            return pl.BlockSpec((1,) + shape,
                                lambda *a: (a[-1][0],) + imap(*a[:-1]),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    specs = [blk((kq, tile_n), lambda *g: idx(*g))]
    for j in range(P):
        specs.append(blk((gpp, tile_n),
                         lambda *g, j=j: (j * nK + idx(*g)[0], idx(*g)[1])))
    if has_bias:
        for j in range(P):
            specs.append(blk((gpp, tile_n),
                             lambda *g, j=j: (j * nK + idx(*g)[0], idx(*g)[1])))
    return specs


def _split_refs(spec: KmSpec, has_bias: bool, refs, stacked: bool):
    P = _n_planes(spec)
    q_ref, rest = refs[0], refs[1:]
    scs = rest[:P]
    bis = rest[P: 2 * P] if has_bias else [None] * P

    def rd(r):
        if r is None:
            return None
        return r[0] if stacked else r[...]

    return rd(q_ref), [rd(r) for r in scs], [rd(r) for r in bis]


@functools.lru_cache(maxsize=None)
def _build_qmm_splitk(qtype: GGMLType, M_pad: int, N: int, K: int,
                      has_bias: bool, tile_n: int, tile_k: int,
                      stacked: bool, interpret: bool):
    spec = KM_SPECS[qtype]
    P = _n_planes(spec)
    nS, nN = K // tile_k, N // tile_n
    kq = tile_k // P

    def kernel(*refs):
        if stacked:
            refs = refs[1:]
        xp_ref = refs[0]
        q, scs, bis = _split_refs(spec, has_bias, refs[1:-1], stacked)
        q = q.astype(jnp.int32)
        acc = jnp.zeros((M_pad, tile_n), jnp.float32)
        for j in range(P):
            w = _plane_tile(spec, q, scs[j], bis[j], j)
            acc += jax.lax.dot_general(
                xp_ref[j], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        refs[-1][0] = acc

    def idx(s, i):
        return (s, i)

    if stacked:
        x_spec = pl.BlockSpec((P, M_pad, kq), lambda s, i, lr: (0, 0, s),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((1, M_pad, tile_n), lambda s, i, lr: (s, 0, i),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((P, M_pad, kq), lambda s, i: (0, 0, s),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((1, M_pad, tile_n), lambda s, i: (s, 0, i),
                              memory_space=pltpu.VMEM)

    in_specs = [x_spec] + _wspecs(spec, nS, tile_n, tile_k, has_bias, stacked, idx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if stacked else 0,
        grid=(nS, nN),
        in_specs=in_specs,
        out_specs=o_spec,
    )
    qbytes = N * K // (2 if spec.kind == "u4" else 1) + \
        (2 if has_bias else 1) * N * (K // spec.gs) * 4
    return pl.pallas_call(
        _named(kernel, f"qmm_splitk_{qtype.name}"),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nS, M_pad, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_pad * N * K, bytes_accessed=int(qbytes), transcendentals=0),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _build_qmm(qtype: GGMLType, M_pad: int, N: int, K: int, has_bias: bool,
               tile_m: int, tile_n: int, tile_k: int, out_dtype_name: str,
               stacked: bool, interpret: bool):
    spec = KM_SPECS[qtype]
    P = _n_planes(spec)
    out_dtype = jnp.dtype(out_dtype_name)
    nM, nN, nK = M_pad // tile_m, N // tile_n, K // tile_k
    kq = tile_k // P

    def kernel(*refs):
        if stacked:
            refs = refs[1:]
        xp_ref = refs[0]
        o_ref, acc_ref = refs[-2], refs[-1]
        q, scs, bis = _split_refs(spec, has_bias, refs[1:-2], stacked)

        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        q = q.astype(jnp.int32)
        for j in range(P):
            w = _plane_tile(spec, q, scs[j], bis[j], j)
            acc_ref[...] += jax.lax.dot_general(
                xp_ref[j], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(2) == nK - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    def idx(m, i, k):
        return (k, i)

    if stacked:
        x_spec = pl.BlockSpec((P, tile_m, kq), lambda m, i, k, lr: (0, m, k),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((tile_m, tile_n), lambda m, i, k, lr: (m, i),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((P, tile_m, kq), lambda m, i, k: (0, m, k),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((tile_m, tile_n), lambda m, i, k: (m, i),
                              memory_space=pltpu.VMEM)

    in_specs = [x_spec] + _wspecs(spec, nK, tile_n, tile_k, has_bias, stacked, idx)
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
        _named(kernel, f"qmm_{qtype.name}"),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_pad * N * K, bytes_accessed=int(qbytes), transcendentals=0),
        interpret=interpret,
    )


def _named(fn, name):
    fn.__name__ = name
    return fn


def min_tile_k(qtype: GGMLType) -> int:
    spec = KM_SPECS[qtype]
    # per-plane scale block needs >=8 sublanes
    return 8 * spec.gs * _n_planes(spec)


def qmm_supported(qtype: GGMLType, K: int) -> bool:
    t = GGMLType(qtype)
    if t not in KM_SPECS:
        return False
    return K % min_tile_k(t) == 0


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
    P = _n_planes(spec)
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
    splitk = M_pad <= 32  # decode regime: fully-parallel split-K grid
    tn = tile_n or _pick_tile(Npad, (512, DEF_TILE_N, 128) if splitk
                              else (DEF_TILE_N, 512, 128))
    tk = tile_k or _pick_tile(K, (DEF_TILE_K, 1024, 512, 256, 128))
    if tk < min_tile_k(qtype):
        tk = 0
    if not tn or not tk:
        raise ValueError(f"qmm: no tile for N={Npad} K={K} {qtype.name}")

    if P == 2:
        xp = jnp.stack([x2[:, : K // 2], x2[:, K // 2:]])  # half-split planes
    else:
        xp = x2[None]
    if M_pad != M:
        xp = jnp.pad(xp, ((0, 0), (0, M_pad - M), (0, 0)))

    wargs = (data["q"],) + (data["sc"],) * P + \
        ((data["bi"],) * P if "bi" in data else ())
    lid = (jnp.asarray(layer, jnp.int32).reshape(1),) if stacked else ()
    if splitk:
        fn = _build_qmm_splitk(qtype, M_pad, Npad, K, "bi" in data, tn, tk,
                               stacked, interpret)
        y = fn(*lid, xp, *wargs).sum(axis=0).astype(out_dtype)
    else:
        fn = _build_qmm(qtype, M_pad, Npad, K, "bi" in data, tm, tn, tk,
                        jnp.dtype(out_dtype).name, stacked, interpret)
        y = fn(*lid, xp, *wargs)
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
        and _pick_tile(data["q"].shape[-1], (512, DEF_TILE_N, 128))
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
