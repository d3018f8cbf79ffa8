"""Flash attention (online-softmax) Pallas kernel for prefill.

Replaces the O(T*S) materialized-scores XLA attention for large T: K/V
stream through VMEM in tiles with the running {max, sum, acc} merge the
reference's chunked CPU flash-attn uses (ggml-cpu/ops.cpp:8740-8796) and the
FLASH_ATTN_EXT contract (ggml.h:2388, SURVEY A.2): GQA broadcast, slot-based
causal masking (valid_from window), optional sliding window and logit
softcap.

Grid: (B*H, nTq, nS) with the KV dimension innermost ("arbitrary");
fully-future KV tiles are skipped via the causal bound. Layouts are
head-major ((B, H, T, D)) so blocks keep (rows, lanes) = (tile, head_dim).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


@functools.lru_cache(maxsize=None)
def _build(B: int, H: int, Hkv: int, T: int, S: int, Dk: int, Dv: int,
           TQ: int, TS: int, scale: float, softcap: float, window: int,
           interpret: bool):
    G = H // Hkv
    nTq, nS = T // TQ, S // TS

    def kernel(q_ref, k_ref, v_ref, qs_ref, kvpos_ref, qpos_ref, vf_ref,
               o_ref, acc_ref, m_ref, l_ref):
        s = pl.program_id(2)

        @pl.when(s == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        qs = qs_ref[0]  # (TQ,) i32 slot of each query row
        # causal skip: this KV tile starts after every query slot -> no-op
        kv0 = s * TS

        @pl.when(kv0 <= jnp.max(qs))
        def _():
            q = q_ref[0, 0]  # (TQ, Dk)
            k = k_ref[0, 0]  # (TS, Dk)
            v = v_ref[0, 0]  # (TS, Dv)
            sc = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if softcap:
                sc = jnp.tanh(sc / softcap) * softcap
            kv_slot = kv0 + jax.lax.broadcasted_iota(jnp.int32, (TQ, TS), 1)
            qslot = qs[:, None]
            mask = (kv_slot <= qslot) & (kv_slot >= vf_ref[0, 0])
            if window:
                kvp = kvpos_ref[0][None, :]  # (1, TS) real positions
                qp = qpos_ref[0][:, None]
                mask = mask & (kvp > qp - window)
            sc = jnp.where(mask, sc, NEG_INF)

            m_prev = m_ref[...][:, :1]  # (TQ, 1)
            m_cur = jnp.max(sc, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(sc - m_new)  # (TQ, TS)
            alpha = jnp.exp(m_prev - m_new)  # (TQ, 1)
            l_new = alpha * l_ref[...][:, :1] + p.sum(axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha + pv
            m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(s == nS - 1)
        def _():
            l = l_ref[...][:, :1]
            norm = jnp.where(l > 0, 1.0 / jnp.where(l > 0, l, 1.0), 0.0)
            o_ref[0, 0] = (acc_ref[...] * norm).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B * H, nTq, nS),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, Dk),
                         lambda bh, tq, s: (bh // H, bh % H, tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS, Dk),
                         lambda bh, tq, s: (bh // H, (bh % H) // G, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS, Dv),
                         lambda bh, tq, s: (bh // H, (bh % H) // G, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ), lambda bh, tq, s: (bh // H, tq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS), lambda bh, tq, s: (bh // H, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ), lambda bh, tq, s: (bh // H, tq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bh, tq, s: (bh // H, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, Dv),
                               lambda bh, tq, s: (bh // H, bh % H, tq, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TQ, Dv), jnp.float32),
            pltpu.VMEM((TQ, 128), jnp.float32),
            pltpu.VMEM((TQ, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dv), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * Dk,
            bytes_accessed=B * (H * T * Dk + Hkv * S * (Dk + Dv)) * 2,
            transcendentals=B * H * T * S),
        interpret=interpret,
    )


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(q, k_all, v_all, q_slots, kv_positions, positions,
                    valid_from, cfg, layer_is_swa: bool = False,
                    interpret: bool = False):
    """Same contract as models.llama.attention: q (B,T,H,Dk),
    k/v HEAD-MAJOR (B,Hkv,S,D*) -> (B,T,H,Dv). The head-major cache layout
    means K/V stream into the kernel exactly as stored — no per-call
    transpose copies."""
    B, T, H, Dk = q.shape
    Hkv = k_all.shape[1]
    S = k_all.shape[2]
    Dv = v_all.shape[-1]
    scale = cfg.attn_scale if cfg.attn_scale else 1.0 / float(np.sqrt(cfg.head_dim))
    window = cfg.sliding_window if layer_is_swa else 0

    TQ = 256 if T % 256 == 0 else (128 if T % 128 == 0 else 0)
    TS = 512 if S % 512 == 0 else (256 if S % 256 == 0 else 0)
    assert TQ and TS, (T, S)

    qh = q.transpose(0, 2, 1, 3).astype(jnp.bfloat16)  # (B, H, T, Dk)
    kh = k_all.astype(jnp.bfloat16)
    vh = v_all.astype(jnp.bfloat16)

    fn = _build(B, H, Hkv, T, S, Dk, Dv, TQ, TS, float(scale),
                float(cfg.attn_logit_softcap), int(window), interpret)
    out = fn(qh, kh, vh, q_slots.astype(jnp.int32),
             kv_positions.astype(jnp.int32), positions.astype(jnp.int32),
             valid_from.astype(jnp.int32).reshape(B, 1))
    return out.transpose(0, 2, 1, 3)  # (B, T, H, Dv)


def flash_supported(T: int, S: int, Dk: int, Dv: int) -> bool:
    return (T % 128 == 0 and S % 256 == 0 and Dk % 128 == 0 and Dv % 128 == 0
            and T >= 128)
