"""Fused decode layer-block kernel: wo + residual + rmsnorm + gate/up + act
+ down + residual in ONE Pallas program.

Why: on this TPU each distinct Pallas executable costs ~25-80us to swap in;
a decode layer that launches 4 programs pays ~0.3ms/layer in swaps alone —
more than its HBM stream time. This program covers 3 of the 4 matmuls
(~85% of layer bytes); with scalar-prefetch layer indexing the SAME
executable serves every layer, so a full 32-layer decode step runs ~2
programs (qkv + this) instead of 128.

Mechanics: a 1-D "arbitrary" grid walks the concatenated tile streams of the
three weight pools (wo | gateup | down, k-innermost per pool). Each pool's
BlockSpec index_map clamps outside its phase to its last (or first) block —
Pallas skips re-fetch when the block index repeats, so foreign phases cost
no DMA. Intermediate activations live in VMEM scratch; phase boundaries
(residual + rmsnorm, activation) run under @pl.when at the transition steps.
Half-split nibble planes (quant/kmajor.py) make the in-kernel activation
plane slices static and contiguous.

Reference counterpart: the per-layer ffn graph section built by build_ffn
(src/llama-graph.h:780+) — here compiled into a single resident TPU program.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf.constants import GGMLType
from ..quant.kmajor import KM_SPECS, KmSpec, dstore_for
from .qmm import _md_keys, _md_rows, _pick_tile, _plane_tile, tile_k_ok

DEF_TK = 2048


def _best_tk(K: int, qtype, cap: int) -> int:
    """Largest legal K-tile dividing K under the cap. Non-power-of-two
    tiles are fine (14336 -> 7168 when legal) — only divisibility and the
    Mosaic sublane rules (qmm.tile_k_ok) matter to the index maps."""
    best = 0
    t = 128
    while t <= min(K, cap):
        if K % t == 0 and tile_k_ok(qtype, t, K):
            best = t
        t += 128
    return best


class _Pool:
    """One weight pool's static tiling + spec/ref bookkeeping (compact
    metadata layout: q + per-plane d/s8/m8/dmin/bm blocks)."""

    def __init__(self, name, qtype, K, Npad, has_bias, start, tile_n, tile_k):
        self.name = name
        self.qtype = qtype
        self.spec: KmSpec = KM_SPECS[qtype]
        self.P = 2 if self.spec.kind == "u4" else 1
        self.K, self.Npad, self.has_bias = K, Npad, has_bias
        self.tn, self.tk = tile_n, tile_k
        self.nN, self.nK = Npad // tile_n, K // tile_k
        self.steps = self.nN * self.nK
        self.start = start
        self.end = start + self.steps
        self.kq = tile_k // self.P
        self.ds = dstore_for(self.spec, K)
        self.md_keys = _md_keys(self.spec)

    def local(self, s):
        ls = jnp.clip(s, self.start, self.end - 1) - self.start
        return ls // self.nK, ls % self.nK  # (i, k)

    def in_specs(self, loff: int = 0, lmax: int = 1 << 30):
        """[q] + per-plane metadata block specs, layer-stacked,
        phase-clamped.

        loff: layer-index offset (the folded next-layer QKV pool uses +1,
        clamped to the last layer)."""
        def lidx(lr):
            return jnp.minimum(lr[0] + loff, lmax - 1) if loff else lr[0]

        def blk(shape, imap):
            return pl.BlockSpec((1,) + shape, lambda s, lr: (lidx(lr),) + imap(s),
                                memory_space=pltpu.VMEM)

        specs = [blk((self.kq, self.tn), lambda s: _swap(self.local(s)))]
        for key in self.md_keys:
            rows = _md_rows(self.spec, key, self.kq, self.ds)
            for j in range(self.P):
                specs.append(blk((rows, self.tn),
                                 lambda s, j=j: _sc_idx(self.local(s), j, self.nK)))
        return specs

    def n_refs(self):
        return 1 + self.P * len(self.md_keys)

    def args(self, qt):
        """Pallas call args for this pool from a QTensor's data dict."""
        out = [qt.data["q"]]
        for key in self.md_keys:
            out.extend([qt.data[key]] * self.P)
        return out

    @property
    def hoist(self):
        """Hoist the (linear-in-x) bias term out of the per-element dequant
        chain: w+b contributes b_g * sum_{k in g} x_k, a tiny per-step
        (M, groups) x (groups, tn) MXU matmul instead of a per-element
        VPU repeat+add over the whole tile."""
        return (self.spec.bias != "none"
                and os.environ.get("TPULLM_MEGA_HOIST", "1") == "1")

    def _md(self, refs, j):
        md = {}
        pos = 1
        for key in self.md_keys:
            md[key] = refs[pos + j][0]
            pos += self.P
        return md

    def tile(self, refs, j):
        """Dequant plane j of the current tile -> (kq, tn) bf16."""
        q = refs[0][0].astype(jnp.int32)
        return _plane_tile(self.spec, q, self._md(refs, j), j,
                           lite=self.hoist)

    def bias_tile(self, refs, j):
        """Plane j's per-group bias rows (kq/gs, tn) f32 for the hoist."""
        md = self._md(refs, j)
        if self.spec.bias == "i8d":
            rep = md["m8"].shape[-2] // md["dmin"].shape[-2]
            dmin = (jnp.repeat(md["dmin"], rep, axis=-2) if rep > 1
                    else md["dmin"])
            return -(md["m8"].astype(jnp.int32).astype(jnp.float32) * dmin)
        return md["bm"]


def _wargs(qt):
    """Pallas args for one pool: q + per-plane compact metadata."""
    spec = KM_SPECS[qt.qtype]
    P = 2 if spec.kind == "u4" else 1
    out = [qt.data["q"]]
    for key in _md_keys(spec):
        out.extend([qt.data[key]] * P)
    return out


def _swap(ik):
    i, k = ik
    return (k, i)


def _sc_idx(ik, j, nK):
    i, k = ik
    return (j * nK + k, i)


def _act(name, g, u):
    gf = g.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    if name == "silu":
        return (jax.nn.silu(gf) * uf).astype(jnp.bfloat16)
    if name == "gelu":
        return (jax.nn.gelu(gf, approximate=True) * uf).astype(jnp.bfloat16)
    if name == "swiglu_oai":
        gf = jnp.clip(gf, None, 7.0)
        uf = jnp.clip(uf, -7.0, 7.0)
        return (gf * jax.nn.sigmoid(1.702 * gf) * (uf + 1.0)).astype(jnp.bfloat16)
    raise ValueError(name)


def _pad256(n):
    return (n + 255) // 256 * 256


@functools.lru_cache(maxsize=None)
def _build(M_pad: int, D: int, Hd: int, n_ff: int,
           wo_t: GGMLType, wo_bias: bool, wo_np: int,
           gu_t: GGMLType, gu_bias: bool, gu_np: int,
           dn_t: GGMLType, dn_bias: bool, dn_np: int,
           act_fn: str, rms_eps: float, interpret: bool,
           qk: tuple | None = None, n_layer: int = 0):
    """qk = (qtype, has_bias, Npad) folds the NEXT layer's fused QKV matmul
    (+ its attn rmsnorm) as a 4th phase, making the whole decode layer ONE
    resident program (the attention between layers runs in XLA on the
    carried qkv output)."""
    fold = qk is not None
    npads = [wo_np, gu_np, dn_np] + ([qk[2]] if fold else [])
    # Step-boundary stalls on the sequential ("arbitrary") grid dominate at
    # small tiles, so prefer the LARGEST tiles that divide the shapes: fewer
    # grid steps = fewer pipeline flushes (measured ~2x stream-rate on 8B).
    # tn=2048 vs 1024: equal throughput (387 vs 380 GB/s on-chip A/B,
    # scratch/probe_real_mega) but ~3x faster Mosaic compile (36s vs 102s
    # for the full folded program) — fewer grid steps to schedule.
    tn_cap = int(os.environ.get("TPULLM_MEGA_TN", "2048"))
    tn = _pick_tile(math.gcd(*npads), (tn_cap, 1024, 512, 256))
    assert tn, npads
    tk_cap = int(os.environ.get("TPULLM_MEGA_TK_CAP", "8192"))
    pools = []
    start = 0
    defs = [
        ("wo", wo_t, Hd, wo_np, wo_bias),
        ("gu", gu_t, D, gu_np, gu_bias),
        ("dn", dn_t, n_ff, dn_np, dn_bias),
    ]
    if fold:
        defs.append(("qk", qk[0], D, qk[2], qk[1]))
    for name, qtype, K, Npad, hb in defs:
        tk = _best_tk(K, qtype, tk_cap)
        assert tk, (name, K, qtype)
        p = _Pool(name, qtype, K, Npad, hb, start, tn, tk)
        pools.append(p)
        start = p.end
    wo, gu, dn = pools[:3]
    qkp = pools[3] if fold else None
    total = start
    nffp = _pad256(n_ff)
    # group-aggregation matrices for the bias hoist: Mosaic cannot split
    # the lane dim of x, so group sums run as xj @ A with a 0/1 constant
    # built once into VMEM scratch (one per distinct (kq, gs))
    combos = sorted({(p.kq, p.spec.gs) for p in pools if p.hoist})

    def kernel(lr, att_ref, res_ref, nrm_ref, *refs):
        # split weight refs per pool
        o = 0
        prefs = []
        for p in pools:
            prefs.append(refs[o: o + p.n_refs()])
            o += p.n_refs()
        # pallas arg order: inputs, outputs, scratch
        if fold:
            (anrm_ref, o_ref, qkv_o, x2_ref, h2_ref, gu_acc, hmid_ref,
             d_acc, hq_ref, qk_acc) = refs[o: o + 10]
            o += 10
        else:
            o_ref, x2_ref, h2_ref, gu_acc, hmid_ref, d_acc = refs[o: o + 6]
            o += 6
        a_refs = dict(zip(combos, refs[o: o + len(combos)]))
        s = pl.program_id(0)

        def pool_dot(p_, refs_, xj, j):
            """x-tile x dequantized plane (+ hoisted bias correction)."""
            w = p_.tile(refs_, j)
            acc = jax.lax.dot_general(xj, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            if p_.hoist:
                corr = p_.bias_tile(refs_, j)
                A = a_refs[(p_.kq, p_.spec.gs)][...]
                xg = jax.lax.dot_general(
                    xj, A, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    xg, corr, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return acc

        @pl.when(s == 0)
        def _():
            d_acc[...] = jnp.zeros_like(d_acc)
            for (kq_, gs_), ar in a_refs.items():
                r = jax.lax.broadcasted_iota(jnp.int32, ar.shape, 0)
                c = jax.lax.broadcasted_iota(jnp.int32, ar.shape, 1)
                ar[...] = (r // gs_ == c).astype(ar.dtype)

        # ---- phase boundaries ------------------------------------------
        @pl.when(s == wo.end)
        def _():
            x2 = res_ref[...].astype(jnp.float32) + d_acc[:, :D]
            x2_ref[...] = x2
            var = jnp.mean(x2 * x2, axis=1, keepdims=True)
            h2 = (x2 * jax.lax.rsqrt(var + rms_eps)
                  * nrm_ref[...][None, :].astype(jnp.float32)).astype(jnp.bfloat16)
            h2_ref[...] = h2
            gu_acc[...] = jnp.zeros_like(gu_acc)

        @pl.when(s == gu.end)
        def _():
            g = gu_acc[:, :n_ff]
            u = gu_acc[:, nffp: nffp + n_ff]
            hmid_ref[...] = _act(act_fn, g, u)
            d_acc[...] = jnp.zeros_like(d_acc)

        # ---- phase compute ---------------------------------------------
        @pl.when(s < wo.end)
        def _():
            i, k = wo.local(s)
            acc = jnp.zeros((M_pad, tn), jnp.float32)
            for j in range(wo.P):
                xj = att_ref[j, :, pl.ds(k * wo.kq, wo.kq)]
                acc += pool_dot(wo, prefs[0], xj, j)
            d_acc[:, pl.ds(i * tn, tn)] += acc

        @pl.when((s >= gu.start) & (s < gu.end))
        def _():
            i, k = gu.local(s)
            acc = jnp.zeros((M_pad, tn), jnp.float32)
            for j in range(gu.P):
                off = j * (D // gu.P) + k * gu.kq
                xj = h2_ref[:, pl.ds(off, gu.kq)]
                acc += pool_dot(gu, prefs[1], xj, j)
            gu_acc[:, pl.ds(i * tn, tn)] += acc

        @pl.when((s >= dn.start) & (s < dn.end))
        def _():
            i, k = dn.local(s)
            acc = jnp.zeros((M_pad, tn), jnp.float32)
            for j in range(dn.P):
                off = j * (n_ff // dn.P) + k * dn.kq
                xj = hmid_ref[:, pl.ds(off, dn.kq)]
                acc += pool_dot(dn, prefs[2], xj, j)
            d_acc[:, pl.ds(i * tn, tn)] += acc

        if not fold:
            @pl.when(s == total - 1)
            def _():
                o_ref[...] = (x2_ref[...] + d_acc[:, :D]).astype(o_ref.dtype)
        else:
            @pl.when(s == dn.end)
            def _():
                x_out = x2_ref[...] + d_acc[:, :D]
                o_ref[...] = x_out.astype(o_ref.dtype)
                var = jnp.mean(x_out * x_out, axis=1, keepdims=True)
                nxt = jnp.minimum(lr[0] + 1, n_layer - 1)
                hq = (x_out * jax.lax.rsqrt(var + rms_eps)
                      * anrm_ref[nxt][None, :].astype(jnp.float32))
                hq_ref[...] = hq.astype(jnp.bfloat16)
                qk_acc[...] = jnp.zeros_like(qk_acc)

            @pl.when(s >= qkp.start)
            def _():
                i, k = qkp.local(s)
                acc = jnp.zeros((M_pad, tn), jnp.float32)
                for j in range(qkp.P):
                    off = j * (D // qkp.P) + k * qkp.kq
                    xj = hq_ref[:, pl.ds(off, qkp.kq)]
                    acc += pool_dot(qkp, prefs[3], xj, j)
                qk_acc[:, pl.ds(i * tn, tn)] += acc

            @pl.when(s == total - 1)
            def _():
                qkv_o[...] = qk_acc[...].astype(qkv_o.dtype)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # att planes (2, M_pad, Hd/2)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # resid (M_pad, D)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ffn_norm weight (D,)
    ]
    for i, p in enumerate(pools):
        in_specs.extend(p.in_specs(loff=1 if (fold and i == 3) else 0,
                                   lmax=n_layer or (1 << 30)))
    if fold:  # next layer's attn_norm (stacked (L, D)): whole array in
        # VMEM, row-indexed inside the kernel (a (1, D) block would violate
        # Mosaic's sublane-divisibility rule)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    scratch = [
        pltpu.VMEM((M_pad, D), jnp.float32),      # x2
        pltpu.VMEM((M_pad, D), jnp.bfloat16),     # h2
        pltpu.VMEM((M_pad, 2 * nffp), jnp.float32),  # gu acc
        pltpu.VMEM((M_pad, n_ff), jnp.bfloat16),  # hmid
        pltpu.VMEM((M_pad, wo_np), jnp.float32),  # d acc (wo/down out)
    ]
    if fold:
        scratch += [
            pltpu.VMEM((M_pad, D), jnp.bfloat16),     # hq (next attn input)
            pltpu.VMEM((M_pad, qk[2]), jnp.float32),  # qkv acc
        ]
        out_shape = (jax.ShapeDtypeStruct((M_pad, D), jnp.bfloat16),
                     jax.ShapeDtypeStruct((M_pad, qk[2]), jnp.bfloat16))
        out_specs = (pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM))
    else:
        out_shape = jax.ShapeDtypeStruct((M_pad, D), jnp.bfloat16)
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
    scratch += [pltpu.VMEM((kq_, kq_ // gs_), jnp.bfloat16)
                for kq_, gs_ in combos]  # bias-hoist group aggregators

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    from .qmm import _md_bytes

    bytes_acc = sum(
        p.Npad * p.K // (2 if p.spec.kind == "u4" else 1)
        + _md_bytes(p.spec, p.Npad, p.K)
        for p in pools)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_pad * sum(p.Npad * p.K for p in pools),
            bytes_accessed=int(bytes_acc), transcendentals=M_pad * n_ff),
        interpret=interpret,
    )


def supported(cfg, qw) -> bool:
    """Structural gate: llama-style sequential residual FFN block."""
    if not all(k in qw for k in ("wo", "ffn_gateup", "ffn_down")):
        return False
    if cfg.n_expert or cfg.parallel_residual or cfg.post_norms:
        return False
    if cfg.norm_type != "rmsnorm":
        return False
    # kernel computes a plain silu/gelu gated MLP + ungated attention
    if cfg.act_fn == "xielu" or cfg.attn_gate_proj or cfg.moe_dense_parallel:
        return False
    for k in ("wo", "ffn_gateup", "ffn_down"):
        if qw[k].layout != "kmajor":
            return False
        K = qw[k].shape[-1]
        tk = _best_tk(K, qw[k].qtype, 8192)
        if not tk or K % tk:
            return False
    return True


def ffn_block(att, resid, ffn_norm, qw, layer, cfg, interpret: bool = False):
    """att (B, T, Hd), resid (B, T, D) -> layer output (B, T, D).

    Decode path (B*T <= 16). qw holds stacked kmajor wo / ffn_gateup /
    ffn_down; ffn_norm is the stacked (L, D) rmsnorm weight.
    """
    B, T, D = resid.shape
    M = B * T
    M_pad = 16
    wo, gu, dn = qw["wo"], qw["ffn_gateup"], qw["ffn_down"]
    n_ff = cfg.n_ff
    Hd = att.shape[-1]

    att2 = att.reshape(M, Hd).astype(jnp.bfloat16)
    if KM_SPECS[wo.qtype].kind == "u4":
        attp = jnp.stack([att2[:, : Hd // 2], att2[:, Hd // 2:]])
    else:
        attp = att2[None]
    res2 = resid.reshape(M, D).astype(jnp.bfloat16)
    if M < M_pad:
        attp = jnp.pad(attp, ((0, 0), (0, M_pad - M), (0, 0)))
        res2 = jnp.pad(res2, ((0, M_pad - M), (0, 0)))

    fn = _build(
        M_pad, D, Hd, n_ff,
        wo.qtype, False, wo.data["q"].shape[-1],
        gu.qtype, False, gu.data["q"].shape[-1],
        dn.qtype, False, dn.data["q"].shape[-1],
        cfg.act_fn, cfg.rms_eps, interpret,
    )
    args = []
    for qt in (wo, gu, dn):
        args.extend(_wargs(qt))
    lid = jnp.asarray(layer, jnp.int32).reshape(1)
    y = fn(lid, attp, res2, ffn_norm, *args)
    return y[:M, :D].reshape(B, T, D)


def ffn_block_qkv(att, resid, ffn_norm, attn_norm, qw, layer, cfg,
                  interpret: bool = False):
    """Folded variant: returns (layer output (B,T,D), NEXT layer's fused
    qkv (B,T,Nqkv_pad)). One resident program covers wo+ffn+norm+qkv, so a
    full decode layer costs a single executable swap."""
    B, T, D = resid.shape
    M = B * T
    M_pad = 16
    wo, gu, dn, qk = (qw["wo"], qw["ffn_gateup"], qw["ffn_down"], qw["wqkv"])
    n_ff = cfg.n_ff
    Hd = att.shape[-1]
    L = wo.data["q"].shape[0]

    att2 = att.reshape(M, Hd).astype(jnp.bfloat16)
    if KM_SPECS[wo.qtype].kind == "u4":
        attp = jnp.stack([att2[:, : Hd // 2], att2[:, Hd // 2:]])
    else:
        attp = att2[None]
    res2 = resid.reshape(M, D).astype(jnp.bfloat16)
    if M < M_pad:
        attp = jnp.pad(attp, ((0, 0), (0, M_pad - M), (0, 0)))
        res2 = jnp.pad(res2, ((0, M_pad - M), (0, 0)))

    qk_np = qk.data["q"].shape[-1]
    fn = _build(
        M_pad, D, Hd, n_ff,
        wo.qtype, False, wo.data["q"].shape[-1],
        gu.qtype, False, gu.data["q"].shape[-1],
        dn.qtype, False, dn.data["q"].shape[-1],
        cfg.act_fn, cfg.rms_eps, interpret,
        qk=(qk.qtype, False, qk_np), n_layer=L,
    )
    args = []
    for qt in (wo, gu, dn, qk):
        args.extend(_wargs(qt))
    lid = jnp.asarray(layer, jnp.int32).reshape(1)
    x_out, qkv = fn(lid, attp, res2, ffn_norm, *args, attn_norm)
    return (x_out[:M, :D].reshape(B, T, D),
            qkv[:M].reshape(B, T, qk_np))
