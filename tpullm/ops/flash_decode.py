"""Decode-depth flash attention: online-softmax over the KV cache at T<=8.

The reference CPU path runs flash attention at ANY kv depth with chunked
partial-max/sum reduction (ggml/src/ggml-cpu/ops.cpp:8740-8796); the repo's
prefill kernel (ops/flash_attention.py) requires T>=128, so decode attention
previously materialized (T, S_max) scores in XLA over the FULL padded cache.
This kernel is the decode-side analogue, shaped for TPU decode reality:

- rows = H*T query rows (T<=8: decode + short speculative verify bursts) —
  far below the MXU's M, so every matmul runs all heads at once against ONE
  kv head's tile and a static row mask selects the rows that belong to it
  (GQA without head replication, and no block-diagonal relayouts).
- the KV cache is HEAD-MAJOR (B, Hkv, S, D) so each head's (TS, D) tile is
  a contiguous HBM stream and a free outer-dim slice in VMEM; tiles past
  the newest written slot are neither fetched (clamped index_map repeats
  the previous block -> no DMA) nor computed (@pl.when) — a decode step at
  position p reads ceil(p/TS) tiles, not S_max/TS. This is what keeps
  tg32@d32768 from collapsing (BASELINE.md mac-m2-ultra depth rows).
- masking is slot-based like models.llama.attention: valid_from <= slot <=
  q_slot, with optional sliding window on real positions, logit softcap,
  and per-head attention sinks (gpt-oss) joining the final denominator.

Supports the quantized (int8 + per-row scale) KV cache natively: K's scale
folds into the score columns AFTER the matmul (one (rows, TS) multiply
instead of dequantizing the (TS, Hkv*D) tile); V is converted per tile.
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
           TS: int, R: int, scale: float, softcap: float, window: int,
           chunked: bool, has_sinks: bool, kv_quant: bool, interpret: bool):
    """R = padded query-row count (rows are (h, t) pairs, r = h*T + t)."""
    G = H // Hkv
    nS = S // TS
    rows = H * T

    def kernel(ptile, q_ref, qs_ref, qp_ref, vf_ref, sk_ref, *rest):
        if kv_quant:
            k_ref, v_ref, ks_ref, vs_ref = rest[:4]
            rest = rest[4:]
        else:
            k_ref, v_ref = rest[:2]
            rest = rest[2:]
        o_ref, acc_ref, m_ref, l_ref = rest
        b, s = pl.program_id(0), pl.program_id(1)

        @pl.when(s == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        @pl.when(s <= ptile[b])
        def _():
            q = q_ref[0]  # (R, Dk)
            kv0 = s * TS
            # scores for ALL query rows vs each kv head's tile; static row
            # masks pick the owning rows (r // T == h*G .. (h+1)*G)
            sc = jnp.zeros((R, TS), jnp.float32)
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            for h in range(Hkv):
                kh = k_ref[0, h].astype(jnp.bfloat16)  # (TS, Dk)
                sh = jax.lax.dot_general(
                    q, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                rm = (rows_i // (G * T)) == h  # (R, 1)
                sc = jnp.where(rm, sh, sc)
            if kv_quant:
                # K row scales fold into score columns (per kv head)
                ks_sel = jnp.zeros((R, TS), jnp.float32)
                for h in range(Hkv):
                    rm = (rows_i // (G * T)) == h
                    ks_sel = jnp.where(rm, ks_ref[0, h][None, :], ks_sel)
                sc = sc * ks_sel
            sc = sc * scale
            if softcap:
                sc = jnp.tanh(sc / softcap) * softcap
            kv_slot = kv0 + jax.lax.broadcasted_iota(jnp.int32, (R, TS), 1)
            qslot = qs_ref[0][:, None]  # (R, 1) slot of each query row
            vf = vf_ref[0, 0]
            mask = (kv_slot <= qslot) & (kv_slot >= vf)
            if window:
                kv_pos = kv_slot - vf  # slot-to-position (engine layout)
                q_pos = qp_ref[0][:, None]
                if chunked:
                    mask = mask & (kv_pos >= (q_pos // window) * window)
                else:
                    mask = mask & (kv_pos > q_pos - window)
            sc = jnp.where(mask, sc, NEG_INF)

            m_prev = m_ref[...][:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
            p = jnp.exp(sc - m_new)
            p = jnp.where(mask, p, 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[...] = jnp.broadcast_to(
                alpha * l_ref[...][:, :1] + p.sum(axis=-1, keepdims=True),
                l_ref.shape)
            m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
            pv = jnp.zeros((R, Dv), jnp.float32)
            for h in range(Hkv):
                rm = (rows_i // (G * T)) == h
                ph = jnp.where(rm, p, 0.0)
                if kv_quant:
                    ph = ph * vs_ref[0, h][None, :]
                vh = v_ref[0, h].astype(jnp.bfloat16)  # (TS, Dv)
                pv += jax.lax.dot_general(
                    ph.astype(jnp.bfloat16), vh,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha + pv

        @pl.when(s == nS - 1)
        def _():
            l = l_ref[...][:, :1]
            if has_sinks:
                # sink joins the softmax as a virtual key with no value row
                # (ggml_compute_forward_soft_max, ops.cpp:5369)
                sk = sk_ref[0][:, None]  # (R, 1) per-row sink logit
                m = m_ref[...][:, :1]
                m2 = jnp.maximum(m, sk)
                l = l * jnp.exp(m - m2) + jnp.exp(sk - m2)
                o = acc_ref[...] * jnp.exp(m - m2)
            else:
                o = acc_ref[...]
            norm = jnp.where(l > 0, 1.0 / jnp.where(l > 0, l, 1.0), 0.0)
            o_ref[0] = (o * norm).astype(o_ref.dtype)

    def clamp(s, b, pt):
        return jnp.minimum(s, pt[b])

    kv_dt = jnp.int8 if kv_quant else jnp.bfloat16
    in_specs = [
        pl.BlockSpec((1, R, Dk), lambda b, s, pt: (b, 0, 0),
                     memory_space=pltpu.VMEM),      # q rows
        pl.BlockSpec((1, R), lambda b, s, pt: (b, 0),
                     memory_space=pltpu.VMEM),      # per-row q slot
        pl.BlockSpec((1, R), lambda b, s, pt: (b, 0),
                     memory_space=pltpu.VMEM),      # per-row q position
        pl.BlockSpec((1, 1), lambda b, s, pt: (b, 0),
                     memory_space=pltpu.SMEM),      # valid_from
        pl.BlockSpec((1, R), lambda b, s, pt: (b, 0),
                     memory_space=pltpu.VMEM),      # per-row sink logit
        pl.BlockSpec((1, Hkv, TS, Dk),
                     lambda b, s, pt: (b, 0, clamp(s, b, pt), 0),
                     memory_space=pltpu.VMEM),      # K tile (head-major)
        pl.BlockSpec((1, Hkv, TS, Dv),
                     lambda b, s, pt: (b, 0, clamp(s, b, pt), 0),
                     memory_space=pltpu.VMEM),      # V tile (head-major)
    ]
    if kv_quant:
        in_specs += [
            pl.BlockSpec((1, Hkv, TS), lambda b, s, pt: (b, 0, clamp(s, b, pt)),
                         memory_space=pltpu.VMEM),  # K row scales
            pl.BlockSpec((1, Hkv, TS), lambda b, s, pt: (b, 0, clamp(s, b, pt)),
                         memory_space=pltpu.VMEM),  # V row scales
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nS),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, Dv), lambda b, s, pt: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, Dv), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
        ],
    )
    kvb = 1 if kv_quant else 2
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R, Dv), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * rows * S * Dk,
            bytes_accessed=B * Hkv * S * (Dk + Dv) * kvb,
            transcendentals=B * rows * S),
        interpret=interpret,
    )


def flash_decode(q, k_all, v_all, q_slots, positions, valid_from, cfg,
                 window: int = 0, sinks=None, scale=None,
                 k_scales=None, v_scales=None, interpret: bool = False):
    """q (B,T,H,Dk), k/v HEAD-MAJOR (B,Hkv,S,D*) [+ (B,Hkv,S) scales when
    int8] -> (B,T,H,Dv). Same masking contract as models.llama.attention."""
    B, T, H, Dk = q.shape
    Hkv, S = k_all.shape[1], k_all.shape[2]
    Dv = v_all.shape[-1]
    if scale is None:
        scale = cfg.attn_scale if cfg.attn_scale else 1.0 / float(np.sqrt(cfg.head_dim))
    TS = 512 if S % 512 == 0 else 256
    rows = H * T
    R = max(16, -(-rows // 8) * 8)

    # row r = h*T + t
    qr = q.transpose(0, 2, 1, 3).reshape(B, rows, Dk)
    row_slots = jnp.broadcast_to(q_slots[:, None, :], (B, H, T)).reshape(B, rows)
    row_pos = jnp.broadcast_to(positions[:, None, :], (B, H, T)).reshape(B, rows)
    if sinks is not None:
        row_sinks = jnp.broadcast_to(
            sinks.astype(jnp.float32)[None, :, None], (B, H, T)).reshape(B, rows)
    else:
        row_sinks = jnp.zeros((B, rows), jnp.float32)
    if R != rows:
        qr = jnp.pad(qr, ((0, 0), (0, R - rows), (0, 0)))
        row_slots = jnp.pad(row_slots, ((0, 0), (0, R - rows)),
                            constant_values=-1)
        row_pos = jnp.pad(row_pos, ((0, 0), (0, R - rows)))
        row_sinks = jnp.pad(row_sinks, ((0, 0), (0, R - rows)))

    ptile = (jnp.max(q_slots, axis=1) // TS).astype(jnp.int32)  # (B,)
    kv_quant = k_scales is not None
    fn = _build(B, H, Hkv, T, S, Dk, Dv, TS, R, float(scale),
                float(cfg.attn_logit_softcap), int(window),
                bool(cfg.swa_chunked and window), sinks is not None,
                kv_quant, interpret)
    args = [qr.astype(jnp.bfloat16), row_slots.astype(jnp.int32),
            row_pos.astype(jnp.int32),
            valid_from.astype(jnp.int32).reshape(B, 1), row_sinks,
            k_all, v_all]
    if kv_quant:
        args += [k_scales.astype(jnp.float32), v_scales.astype(jnp.float32)]
    out = fn(ptile, *args)  # (B, R, Dv)
    return (out[:, :rows].reshape(B, H, T, Dv).transpose(0, 2, 1, 3))


def flash_decode_supported(B: int, T: int, S: int, Dk: int, Dv: int,
                           Hkv: int) -> bool:
    import os

    # OFF by default: on-chip A/B (8B Q4_K) measured the XLA attention over
    # the engine's BUCKETED kv view at ~2x this kernel's decode throughput
    # (tg32@d1024 48 vs 26 tok/s) — the per-tile all-head score compute
    # (Hkv x redundant rows) and per-step grid overhead outweigh the DMA
    # win. Set TPULLM_FLASH_DECODE=1 to re-enable for experiments.
    if not os.environ.get("TPULLM_FLASH_DECODE"):
        return False
    return (T <= 8 and S % 256 == 0 and Dk % 128 == 0 and Dv % 128 == 0
            and Dk <= 512 and Dv <= 512 and S >= 256)
