"""Grouped (ragged) dequant-GEMM over routed experts — the MUL_MAT_ID
prefill kernel (megablocks-style).

The dense-masked MoE prefill evaluates every expert on every token
(n_expert/n_used x wasted FLOPs). Here tokens are SORTED by routed expert
and padded per expert to TM-row tiles; each grid tile then multiplies its
rows against exactly ONE expert's weights, streamed at quantized density
through the same compact kmajor dequant chain as ops/qmm.py. Total work
is sum_e round_up(count_e, TM) rows — proportional to actual assignments.

Reference contract: GGML_OP_MUL_MAT_ID (ggml/include/ggml.h:507), the
CUDA grouped path in ggml-cuda/mmq.cuh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf.constants import GGMLType
from ..quant.kmajor import KM_SPECS, dstore_for
from .qmm import (_md_keys, _md_rows, _n_planes, _pick_tile, _plane_tile,
                  pick_tile_k)

TM = 128  # token-tile rows (one expert per tile)


@functools.lru_cache(maxsize=None)
def _build_gmm(qtype: GGMLType, Mp: int, N: int, K: int,
               tile_n: int, tile_k: int, layered: bool, interpret: bool):
    """Grid (nM, nN, nK): xs tile (TM, kq) x expert-selected weight block.

    Scalar prefetch: [layer?] + tile_expert (nM,). Weight arrays carry
    leading (L?, E) axes; block index maps read the tile's expert id."""
    spec = KM_SPECS[qtype]
    P = _n_planes(spec)
    nM, nN, nK = Mp // TM, N // tile_n, K // tile_k
    kq = tile_k // P
    ds = dstore_for(spec, K)

    def wblk(shape, imap):
        if layered:
            return pl.BlockSpec(
                (1, 1) + shape,
                lambda m, i, k, lr, te: (lr[0], te[m]) + imap(m, i, k),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (1,) + shape,
            lambda m, i, k, te: (te[m],) + imap(m, i, k),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((P, TM, kq),
                     (lambda m, i, k, lr, te: (0, m, k)) if layered
                     else (lambda m, i, k, te: (0, m, k)),
                     memory_space=pltpu.VMEM),
        wblk((kq, tile_n), lambda m, i, k: (k, i)),
    ]
    for key in _md_keys(spec):
        rows = _md_rows(spec, key, kq, ds)
        for j in range(P):
            in_specs.append(wblk((rows, tile_n),
                                 lambda m, i, k, j=j: (j * nK + k, i)))
    o_spec = pl.BlockSpec(
        (TM, tile_n),
        (lambda m, i, k, lr, te: (m, i)) if layered
        else (lambda m, i, k, te: (m, i)),
        memory_space=pltpu.VMEM)

    def kernel(*refs):
        refs = refs[2 if layered else 1:]  # drop prefetch refs
        xp_ref = refs[0]
        o_ref, acc_ref = refs[-2], refs[-1]
        wrefs = refs[1:-2]

        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        nd = 2 if layered else 1
        q = wrefs[0][(0,) * nd].astype(jnp.int32)
        pos = 1
        mds = [dict() for _ in range(P)]
        for key in _md_keys(spec):
            for j in range(P):
                mds[j][key] = wrefs[pos][(0,) * nd]
                pos += 1
        for j in range(P):
            w = _plane_tile(spec, q, mds[j], j)
            acc_ref[...] += jax.lax.dot_general(
                xp_ref[j], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(2) == nK - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if layered else 1,
        grid=(nM, nN, nK),
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((TM, tile_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + N * K // 2, transcendentals=0),
        interpret=interpret,
    )


def grouped_qmm(xs_pad, tile_expert, qt, n_logical: int, layer=None,
                interpret: bool = False):
    """xs_pad (Mp, K) bf16 expert-sorted/padded rows; tile_expert (Mp/TM,)
    int32 expert of each TM-row tile; qt a kmajor QTensor with leading
    (L?, E) axes. Returns (Mp, n_logical) bf16."""
    data = qt.data
    qtype = GGMLType(qt.qtype)
    spec = KM_SPECS[qtype]
    P = _n_planes(spec)
    Mp, K = xs_pad.shape
    Npad = data["q"].shape[-1]
    layered = layer is not None
    tn = _pick_tile(Npad, (512, 256, 128))
    tk = pick_tile_k(qtype, K, cap=2048)
    fn = _build_gmm(qtype, Mp, Npad, K, tn, tk, layered, interpret)
    if P == 2:
        xp = jnp.stack([xs_pad[:, : K // 2], xs_pad[:, K // 2:]])
    else:
        xp = xs_pad[None]
    wargs = (data["q"],)
    for key in _md_keys(spec):
        wargs += (data[key],) * P
    pre = ()
    if layered:
        pre = (jnp.asarray(layer, jnp.int32).reshape(1),)
    out = fn(*pre, tile_expert.astype(jnp.int32), xp, *wargs)
    return out[:, :n_logical]


def gmm_supported(qt, K: int) -> bool:
    if qt.layout != "kmajor":
        return False
    qtype = GGMLType(qt.qtype)
    return (qtype in KM_SPECS and pick_tile_k(qtype, K, cap=2048) > 0
            and _pick_tile(qt.data["q"].shape[-1], (512, 256, 128)) > 0)


def sort_by_expert(top_i, n_expert: int, n_rows: int):
    """top_i (M, used) -> ragged layout bookkeeping.

    Returns (order (A,) source assignment per sorted position, dest (A,)
    padded row of each sorted assignment, tile_expert (nM,), Mp). A =
    M*used; Mp = ceil(A/TM)*TM + E*TM (static worst-case padding)."""
    M, used = top_i.shape
    A = M * used
    E = n_expert
    Mp = (-(-A // TM) + E) * TM
    ef = top_i.reshape(-1)
    order = jnp.argsort(ef, stable=True)
    ef_s = ef[order]
    counts = jnp.bincount(ef, length=E)
    padded = -(-counts // TM) * TM
    off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(padded).astype(jnp.int32)])
    start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(counts).astype(jnp.int32)])
    dest = off[ef_s] + (jnp.arange(A, dtype=jnp.int32) - start[ef_s])
    # tile t (rows [t*TM, (t+1)*TM)) belongs to the expert whose padded
    # range contains it; tiles past the live range clamp to the last expert
    nM = Mp // TM
    tile_expert = jnp.clip(
        jnp.searchsorted(off[1:], jnp.arange(nM, dtype=jnp.int32) * TM,
                         side="right"), 0, E - 1)
    return order, dest, tile_expert, Mp
