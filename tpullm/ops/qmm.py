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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf.constants import GGMLType
from ..quant.kmajor import KM_SPECS, KmSpec, dstore_for

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


# metadata keys in fixed arg order; rows-per-element divisor per key
_MD_KEYS = ("d", "s8", "m8", "dmin", "bm")


def _md_keys(spec: KmSpec, lite: bool = False):
    """lite: the affine bias term is evaluated OUTSIDE the kernel (see
    qmm_kmajor: y += group_sums(x) @ bias_rows — exact, since the bias is
    constant within each gs-group), so the kernel skips m8/dmin entirely.
    Cuts the per-weight VPU dequant chain by ~1/3 for affine K-quants."""
    keys = ["d"]
    if spec.sb is not None:
        keys.append("s8")
    if spec.bias == "i8d" and not lite:
        keys += ["m8", "dmin"]
    elif spec.bias == "f32" and not lite:
        keys.append("bm")
    return keys


def _md_rows(spec: KmSpec, key: str, kq: int, ds: int) -> int:
    """rows of metadata `key` covering kq contraction elements."""
    return kq // (ds if key in ("d", "dmin") else spec.gs)


def _plane_tile(spec: KmSpec, q, md, j, lite: bool = False):
    """Dequantize plane j of a packed tile -> bf16 weight tile.

    q: (kq, tn) packed tile; md: {key: plane-j metadata rows}. Combines the
    compact scales in f32 exactly as the reference dequantizers do
    (ggml-quants.c dequantize_row_*)."""
    u = (q >> (4 * j)) & 0xF if spec.kind == "u4" else q
    if spec.lut is not None:
        val = _lut_select(u, spec.lut)
    else:
        val = u.astype(jnp.float32)
        if spec.off:
            val = val + spec.off
    if spec.sb is not None:
        rep = md["s8"].shape[-2] // md["d"].shape[-2]
        scf = (md["s8"].astype(jnp.int32).astype(jnp.float32)
               * (jnp.repeat(md["d"], rep, axis=-2) if rep > 1 else md["d"]))
    else:
        scf = md["d"]
    # measured dead ends (8B Q4_K decode, same-session A/B): an all-bf16
    # chain (i32->bf16 convert + bf16 multiply) is ~23% SLOWER than the f32
    # chain, and a sublane-split 3D broadcast is byte-identical in speed to
    # jnp.repeat — Mosaic already lowers the repeat as a broadcast.
    w = val * jnp.repeat(scf, spec.gs, axis=0)
    if lite:
        return w.astype(jnp.bfloat16)
    if spec.bias == "i8d":
        rep = md["m8"].shape[-2] // md["dmin"].shape[-2]
        bif = -(md["m8"].astype(jnp.int32).astype(jnp.float32)
                * (jnp.repeat(md["dmin"], rep, axis=-2) if rep > 1
                   else md["dmin"]))
        w = w + jnp.repeat(bif, spec.gs, axis=0)
    elif spec.bias == "f32":
        w = w + jnp.repeat(md["bm"], spec.gs, axis=0)
    return w.astype(jnp.bfloat16)


def _wspecs(spec: KmSpec, nK: int, tile_n: int, tile_k: int, ds: int,
            stacked: bool, idx, lite: bool = False):
    """BlockSpecs for [q] + per-plane compact metadata blocks.

    `idx(grid_indices...) -> (k, i)` gives the k-tile and n-tile for a step.
    Plane j's metadata rows for k-tile k live at row-block j*nK + k (the
    half-split layout keeps each plane's rows contiguous)."""
    P = _n_planes(spec)
    kq = tile_k // P

    def blk(shape, imap):
        if stacked:
            return pl.BlockSpec((1,) + shape,
                                lambda *a: (a[-1][0],) + imap(*a[:-1]),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    specs = [blk((kq, tile_n), lambda *g: idx(*g))]
    for key in _md_keys(spec, lite):
        rows = _md_rows(spec, key, kq, ds)
        for j in range(P):
            specs.append(blk((rows, tile_n),
                             lambda *g, j=j: (j * nK + idx(*g)[0], idx(*g)[1])))
    return specs


def _split_refs(spec: KmSpec, refs, stacked: bool, lite: bool = False):
    """-> (q_ref_value, [per-plane metadata dicts])."""
    P = _n_planes(spec)

    def rd(r):
        return r[0] if stacked else r[...]

    q = rd(refs[0])
    mds = [dict() for _ in range(P)]
    pos = 1
    for key in _md_keys(spec, lite):
        for j in range(P):
            mds[j][key] = rd(refs[pos])
            pos += 1
    return q, mds, pos


def _md_bytes(spec: KmSpec, N: int, K: int) -> int:
    b = 0
    ds = dstore_for(spec, K)
    for key in _md_keys(spec):
        rows = K // (ds if key in ("d", "dmin") else spec.gs)
        b += rows * N * (1 if key in ("s8", "m8") else 4)
    return b


@functools.lru_cache(maxsize=None)
def _build_qmm_splitk(qtype: GGMLType, M_pad: int, N: int, K: int,
                      tile_n: int, tile_k: int,
                      stacked: bool, interpret: bool, lite: bool = False):
    spec = KM_SPECS[qtype]
    P = _n_planes(spec)
    nS, nN = K // tile_k, N // tile_n
    kq = tile_k // P

    def kernel(*refs):
        if stacked:
            refs = refs[1:]
        xp_ref = refs[0]
        q, mds, _ = _split_refs(spec, refs[1:-1], stacked, lite)
        q = q.astype(jnp.int32)
        acc = jnp.zeros((M_pad, tile_n), jnp.float32)
        for j in range(P):
            w = _plane_tile(spec, q, mds[j], j, lite)
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

    in_specs = [x_spec] + _wspecs(spec, nS, tile_n, tile_k,
                                  dstore_for(spec, K), stacked, idx, lite)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if stacked else 0,
        grid=(nS, nN),
        in_specs=in_specs,
        out_specs=o_spec,
    )
    qbytes = N * K // (2 if spec.kind == "u4" else 1) + _md_bytes(spec, N, K)
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
def _build_qmm(qtype: GGMLType, M_pad: int, N: int, K: int,
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
        q, mds, _ = _split_refs(spec, refs[1:-2], stacked)

        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        q = q.astype(jnp.int32)
        for j in range(P):
            w = _plane_tile(spec, q, mds[j], j)
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

    in_specs = [x_spec] + _wspecs(spec, nK, tile_n, tile_k,
                                  dstore_for(spec, K), stacked, idx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if stacked else 0,
        grid=(nM, nN, nK),
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
    )
    qbytes = N * K // (2 if spec.kind == "u4" else 1) + _md_bytes(spec, N, K)
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


def tile_k_ok(qtype: GGMLType, tk: int, K: int) -> bool:
    """Is tk a legal K-tile for a tensor with contraction dim K: per-plane
    q rows and every metadata block's row count must be multiples of 8
    (Mosaic sublane rule). d granularity matches dstore_for(spec, K)."""
    spec = KM_SPECS[GGMLType(qtype)]
    P = _n_planes(spec)
    ds = dstore_for(spec, K)
    kq = tk // P
    if tk % P or kq % 8 or kq % ds or kq % spec.gs:
        return False
    return (kq // spec.gs) % 8 == 0 and (kq // ds) % 8 == 0


def min_tile_k(qtype: GGMLType, K: int | None = None) -> int:
    spec = KM_SPECS[GGMLType(qtype)]
    ds = dstore_for(spec, K) if K is not None else spec.dstore
    return _n_planes(spec) * 8 * max(ds, spec.gs)


def pick_tile_k(qtype: GGMLType, K: int, cap: int = DEF_TILE_K) -> int:
    """Largest legal K-tile dividing K under cap (0 if none)."""
    best = 0
    mt = min_tile_k(qtype, K)
    t = mt
    while t <= min(K, cap):
        if K % t == 0 and tile_k_ok(qtype, t, K):
            best = t
        t += mt
    return best


def qmm_supported(qtype: GGMLType, K: int) -> bool:
    t = GGMLType(qtype)
    if t not in KM_SPECS:
        return False
    return pick_tile_k(t, K) > 0


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
    if splitk:
        # tuned on v5e (tools/sweep_qmm, compact layout): tk=4096 beats
        # 2048 by ~15%; tn=512 is the stable pick across pool shapes
        tn = tile_n or _pick_tile(Npad, (512, DEF_TILE_N, 128))
        tk = tile_k or pick_tile_k(qtype, K, cap=4096)
    else:
        tn = tile_n or _pick_tile(Npad, (DEF_TILE_N, 512, 128))
        tk = tile_k or pick_tile_k(qtype, K)
    if not tn or not tk:
        raise ValueError(f"qmm: no tile for N={Npad} K={K} {qtype.name}")

    if P == 2:
        xp = jnp.stack([x2[:, : K // 2], x2[:, K // 2:]])  # half-split planes
    else:
        xp = x2[None]
    if M_pad != M:
        xp = jnp.pad(xp, ((0, 0), (0, M_pad - M), (0, 0)))

    # decode path: evaluate the affine bias term OUTSIDE the kernel — it is
    # constant within each gs-group, so y += group_sums(x) @ bias_rows is
    # exact and removes the bias stream + per-weight add from the VPU chain
    lite = splitk and spec.bias in ("i8d", "f32")
    lid = (jnp.asarray(layer, jnp.int32).reshape(1),) if stacked else ()
    wargs = (data["q"],)
    for key in _md_keys(spec, lite):
        wargs += (data[key],) * P
    if splitk:
        fn = _build_qmm_splitk(qtype, M_pad, Npad, K, tn, tk,
                               stacked, interpret, lite)
        y = fn(*lid, xp, *wargs).sum(axis=0)
        if lite:
            if spec.bias == "i8d":
                m8, dmin = data["m8"], data["dmin"]
                if stacked:
                    li = jnp.asarray(layer, jnp.int32)
                    m8 = jax.lax.dynamic_index_in_dim(m8, li, 0, keepdims=False)
                    dmin = jax.lax.dynamic_index_in_dim(dmin, li, 0, keepdims=False)
                rep = m8.shape[-2] // dmin.shape[-2]
                bif = -(m8.astype(jnp.float32)
                        * (jnp.repeat(dmin, rep, axis=-2) if rep > 1 else dmin))
            else:
                bif = data["bm"]
                if stacked:
                    bif = jax.lax.dynamic_index_in_dim(
                        bif, jnp.asarray(layer, jnp.int32), 0, keepdims=False)
            xg = x2.astype(jnp.float32).reshape(M, K // spec.gs, spec.gs).sum(-1)
            if M_pad != M:
                xg = jnp.pad(xg, ((0, M_pad - M), (0, 0)))
            y = y + jax.lax.dot_general(
                xg, bif, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = y.astype(out_dtype)
    else:
        fn = _build_qmm(qtype, M_pad, Npad, K, tm, tn, tk,
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
