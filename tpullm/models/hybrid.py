"""Hybrid attention+recurrent models (Jamba family).

The reference composes a KV cache and a recurrent state bank behind one
memory interface (src/llama-memory-hybrid.{h,cpp}) and dispatches per layer
on n_head_kv(il)==0 (src/models/jamba.cpp:12,127). Here the loader's
signature-based depth segmentation already splits attention and mamba layers
into separate groups (different tensor sets), so the forward walks groups,
scanning each with its family's layer function against its slice of the
right state bank:

- attention layers: norm -> QKV -> attention WITHOUT rope (jamba.cpp "No
  RoPE :)") -> wo -> residual -> ffn_norm -> FFN/MoE -> residual, over a
  KVCache sized for ONLY the attention layers;
- mamba layers: the existing selective-SSM layer (models/mamba._layer) over
  a RecurrentState bank sized for ONLY the recurrent layers.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qtensor import QTensor
from .config import ModelConfig
from .llama import attention, ffn, moe_ffn, rms_norm
from .mamba import RecurrentState, _layer as mamba_layer, conv_channels


def is_hybrid(cfg: ModelConfig) -> bool:
    return bool(cfg.ssm_d_conv) and bool(cfg.kv_head_pattern) and any(
        h > 0 for h in cfg.kv_head_pattern)


def attn_layer_ids(cfg: ModelConfig) -> list[int]:
    return [i for i, h in enumerate(cfg.kv_head_pattern) if h > 0]


@jax.tree_util.register_pytree_node_class
@dataclass
class HybridState:
    """KV cache over attention layers + recurrent bank over mamba layers
    (the llama_memory_hybrid composition)."""

    k: Any  # head-major (L_attn, B, Hkv, S, Dk)
    v: Any
    conv: Any  # (L_rec, B, d_conv-1, C)
    ssm: Any   # (L_rec, B, ...) per mamba family

    def tree_flatten(self):
        return (self.k, self.v, self.conv, self.ssm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @staticmethod
    def create(cfg: ModelConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16):
        n_attn = len(attn_layer_ids(cfg))
        n_rec = cfg.n_layer - n_attn
        hkv = max(cfg.kv_head_pattern)
        k = jnp.zeros((n_attn, batch, hkv, max_len, cfg.head_dim), dtype)
        v = jnp.zeros((n_attn, batch, hkv, max_len, cfg.head_dim_v), dtype)
        rec = RecurrentState.create(
            ModelConfig(**{**cfg.__dict__, "n_layer": n_rec,
                           "raw_kv": {}}), batch)
        return HybridState(k, v, rec.conv, rec.ssm)


def forward(params, cfg: ModelConfig, tokens, positions, state: HybridState,
            cache_pos, valid_from, dtype=jnp.bfloat16, logits_idx=None,
            n_valid=None):
    """Returns (logits (B,T',V) f32, new HybridState).

    Layout contract matches llama.forward's batch-engine mode (uniform
    scalar cache_pos; left-padded rows share slot indices). Server mode:
    cache_pos may be (B,) per-row write positions, and n_valid (B,) counts
    real tokens per row — a row with n_valid=0 keeps its recurrent state
    untouched (inactive decode slots; KV writes for such rows land beyond
    the row's valid window and are never attended)."""
    B, T = tokens.shape
    x = params["tok_embd"].take_rows(tokens, dtype)
    S = state.max_len
    uniform = jnp.ndim(cache_pos) == 0
    cache_pos = jnp.broadcast_to(
        jnp.asarray(cache_pos, jnp.int32), (B,))
    q_slots = cache_pos[:, None] + jnp.arange(T)[None, :]  # (B, T)
    kv_positions = jnp.arange(S)[None, :] - valid_from[:, None]
    pad_mask = jnp.arange(T)[None, :] < valid_from[:, None]
    if n_valid is not None:
        pad_mask = pad_mask | (jnp.arange(T)[None, :] >= n_valid[:, None])

    layers = params["layers"]
    groups = layers.get("__groups__") or [layers]
    hkv = max(cfg.kv_head_pattern)

    def attn_block(x, p, qw, kv, li):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        from .llama import _mm

        q = _mm(h, qw["wq"], dtype, li).reshape(B, T, cfg.n_head, cfg.head_dim)
        k = _mm(h, qw["wk"], dtype, li).reshape(B, T, hkv, cfg.head_dim)
        v = _mm(h, qw["wv"], dtype, li).reshape(B, T, hkv, cfg.head_dim_v)
        k_cache, v_cache = kv  # head-major (B, Hkv, S, D)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        if uniform:  # all rows share one write offset: contiguous update
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, kt.astype(k_cache.dtype), (0, 0, cache_pos[0], 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, vt.astype(v_cache.dtype), (0, 0, cache_pos[0], 0))
        else:  # per-row slot positions (server decode)
            rows = jnp.arange(B)[:, None, None]
            hh = jnp.arange(hkv)[None, :, None]
            k_cache = k_cache.at[rows, hh, q_slots[:, None, :]].set(
                kt.astype(k_cache.dtype))
            v_cache = v_cache.at[rows, hh, q_slots[:, None, :]].set(
                vt.astype(v_cache.dtype))
        att = attention(q, k_cache.astype(dtype), v_cache.astype(dtype),
                        q_slots, kv_positions, positions, valid_from, cfg)
        att = att.reshape(B, T, cfg.n_head * cfg.head_dim_v)
        o = _mm(att, qw["wo"], dtype, li)
        x = x + o
        h2 = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        if cfg.n_expert > 0 and "moe_gate_inp" in qw:
            f = moe_ffn(h2, p, qw, li, cfg, dtype)
        else:
            f = ffn(h2, qw, li, cfg, dtype, p)
        return x + f, (k_cache, v_cache)

    a_off = r_off = 0
    new_k, new_v, new_conv, new_ssm = [], [], [], []
    for gl in groups:
        qw = {k: v for k, v in gl.items() if isinstance(v, QTensor)}
        fl = {k: v for k, v in gl.items() if not isinstance(v, QTensor)}
        L_g = next(iter(gl.values())).shape[0]
        recurrent = "ssm_in" in qw
        if recurrent:
            conv_g = jax.lax.dynamic_slice_in_dim(state.conv, r_off, L_g, 0)
            ssm_g = jax.lax.dynamic_slice_in_dim(state.ssm, r_off, L_g, 0)

            def step(x, inp, gl=gl):
                li, ct, ss = inp
                out, tail, ssm = mamba_layer(
                    x, li, gl, cfg, ct, ss, dtype, pad_mask, n_valid)
                return x + out, (tail, ssm)

            x, (tails, ssms) = jax.lax.scan(
                step, x, (jnp.arange(L_g), conv_g, ssm_g))
            new_conv.append(tails)
            new_ssm.append(ssms)
            r_off += L_g
        else:
            k_g = jax.lax.dynamic_slice_in_dim(state.k, a_off, L_g, 0)
            v_g = jax.lax.dynamic_slice_in_dim(state.v, a_off, L_g, 0)

            def astep(x, inp, qw=qw):
                li, kv0, kv1 = inp
                x, (k2, v2) = attn_block(x, fl, qw, (kv0, kv1), li)
                return x, (k2, v2)

            x, (ks, vs) = jax.lax.scan(
                astep, x, (jnp.arange(L_g), k_g, v_g))
            new_k.append(ks)
            new_v.append(vs)
            a_off += L_g

    def _cat(parts, old):
        if not parts:
            return old
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    new_state = HybridState(_cat(new_k, state.k), _cat(new_v, state.v),
                            _cat(new_conv, state.conv),
                            _cat(new_ssm, state.ssm))
    if logits_idx is not None:
        x = jax.lax.dynamic_slice_in_dim(
            x, jnp.asarray(logits_idx, jnp.int32), 1, axis=1)
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    from .llama import _mm

    logits = _mm(x, params["output"], dtype).astype(jnp.float32)
    return logits, new_state
