"""Hybrid attention+recurrent models (Jamba / Nemotron-H / Granite-hybrid /
Falcon-H1 families).

The reference composes a KV cache and a recurrent state bank behind one
memory interface (src/llama-memory-hybrid.{h,cpp}) and dispatches per layer
on hparams.is_recurrent(il). Here the loader's signature-based depth
segmentation already splits layer kinds into separate groups (different
tensor sets), so the forward walks groups, scanning each with its
component mix against its slice of the right state bank:

- attention: norm -> QKV (optionally roped) -> attention -> wo; Jamba runs
  NO rope (src/models/jamba.cpp "No RoPE :)"), Falcon-H1/granite-hybrid
  rope normally;
- recurrent: mamba-1 (models/mamba._layer) or mamba-2 (._layer2), chosen
  by the group's tensor set (mamba-2 has ssm_norm, no ssm_x/ssm_dt);
- FFN: applied after the mixer when the group has ffn tensors (Jamba,
  granite-hybrid, falcon-h1); Nemotron-H instead has FFN-ONLY layers
  (src/models/nemotron-h.cpp: a layer is exactly one of ssm/attn/ffn);
- Falcon-H1 runs attention AND mamba-2 in PARALLEL on the same norm and
  sums them before the residual (src/models/falcon-h1.cpp).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qtensor import QTensor
from .config import ModelConfig
from .gdn import gdn_layer, kda_layer
from .llama import attention, ffn, moe_ffn, rms_norm
from .mamba import (RecurrentState, _layer as mamba_layer,
                    _layer2 as mamba2_layer, _layer_plamo2 as plamo2_layer,
                    conv_channels, shortconv_layer)


def is_hybrid(cfg: ModelConfig) -> bool:
    if cfg.hybrid_parallel or cfg.hybrid_graph:
        return True
    return bool(cfg.ssm_d_conv) and bool(cfg.kv_head_pattern) and any(
        h > 0 for h in cfg.kv_head_pattern)


def attn_layer_ids(cfg: ModelConfig) -> list[int]:
    if cfg.hybrid_parallel:  # falcon-h1: every layer attends AND recurs
        return list(range(cfg.n_layer))
    return [i for i, h in enumerate(cfg.kv_head_pattern) if h > 0]


def recurrent_layer_count(cfg: ModelConfig) -> int:
    if cfg.hybrid_graph:  # deci/openelm: attention-only archs
        return 0
    if cfg.hybrid_parallel:
        return cfg.n_layer
    # nemotron-h has pure-FFN layers (ffn_only_layers): there a kv==0
    # layer with n_ff>0 is FFN-only, NOT recurrent; in jamba/granite-style
    # hybrids every layer carries an FFN, so kv==0 alone marks recurrence
    ffp = cfg.n_ff_pattern or ()
    n = 0
    for i, h in enumerate(cfg.kv_head_pattern):
        if h == 0 and (not cfg.ffn_only_layers or not ffp or ffp[i] == 0):
            n += 1
    return n


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
        n_rec = recurrent_layer_count(cfg)
        if cfg.kv_lora_rank:
            # MLA attention layers (kimi-linear): the cache holds the
            # compressed [c_kv; k_pe] as one MQA head (KVCache MLA branch)
            hkv, dk, dv = 1, cfg.kv_lora_rank + cfg.rope_dim, cfg.kv_lora_rank
        else:
            hkv = (cfg.n_head_kv if cfg.hybrid_parallel
                   else max(cfg.kv_head_pattern))
            dk, dv = cfg.head_dim, cfg.head_dim_v
        k = jnp.zeros((n_attn, batch, hkv, max_len, dk), dtype)
        v = jnp.zeros((n_attn, batch, hkv, max_len, dv), dtype)
        if n_rec == 0:  # deci/openelm: attention-only, dummy banks
            return HybridState(k, v, jnp.zeros((1, batch, 1, 1), dtype),
                               jnp.zeros((1, batch, 1, 1), jnp.float32))
        rec = RecurrentState.create(
            ModelConfig(**{**cfg.__dict__, "n_layer": max(n_rec, 1),
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
    if cfg.embedding_scale != 1.0:  # granite-hybrid f_embedding_scale
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(dtype)
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
    hkv = (cfg.n_head_kv if cfg.hybrid_parallel
           else max(cfg.kv_head_pattern))
    res_s = cfg.residual_scale or 1.0

    def attn_part(x, p, qw, kv, li):
        """norm -> qkv -> attention -> wo (+bias); no residual, no ffn.

        qwen3next extras (src/models/qwen3next.cpp build_layer_attn): the
        Q projection emits [query | output-gate] per head (attn_out_gate),
        and q/k get per-head RMS norms before rope (attn_qk_norm)."""
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        from .llama import _mm, apply_rope

        # per-GROUP head counts derived from the weight shapes (openelm/
        # deci vary n_head / n_head_kv by layer; uniform archs reduce to
        # the cfg values): wo's input is n_head*head_dim_v
        nh_g = qw["wo"].n_in // cfg.head_dim_v
        gate = None
        if "wqkv" in qw or "wqkv_cat" in qw:  # fused [q;k;v] (plamo2 GGUF)
            wf = qw.get("wqkv", qw.get("wqkv_cat"))
            nq = nh_g * cfg.head_dim
            hkv_g = (wf.n_out - nq) // (cfg.head_dim + cfg.head_dim_v)
            qkv = _mm(h, wf, dtype, li)
            q = qkv[..., :nq].reshape(B, T, nh_g, cfg.head_dim)
            k = qkv[..., nq:nq + hkv_g * cfg.head_dim].reshape(
                B, T, hkv_g, cfg.head_dim)
            v = qkv[..., nq + hkv_g * cfg.head_dim:].reshape(
                B, T, hkv_g, cfg.head_dim_v)
        else:
            hkv_g = qw["wk"].n_out // cfg.head_dim
            q = _mm(h, qw["wq"], dtype, li)
            if cfg.attn_out_gate:  # fused [q | gate] projection
                q = q.reshape(B, T, nh_g, 2 * cfg.head_dim)
                gate = q[..., cfg.head_dim:]
                q = q[..., :cfg.head_dim]
            else:
                q = q.reshape(B, T, nh_g, cfg.head_dim)
            k = _mm(h, qw["wk"], dtype, li).reshape(B, T, hkv_g, cfg.head_dim)
            v = _mm(h, qw["wv"], dtype, li).reshape(
                B, T, hkv_g, cfg.head_dim_v)
        if cfg.attn_qk_norm and "q_norm" in p:
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_eps)
        if cfg.hybrid_rope:  # falcon-h1/granite-hybrid rope; jamba: none
            from .llama import rope_cache

            cos, sin = rope_cache(cfg, positions)
            q = apply_rope(q, cos, sin, cfg.rope_type, cfg.rope_dim)
            k = apply_rope(k, cos, sin, cfg.rope_type, cfg.rope_dim)
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
            hh = jnp.arange(hkv_g)[None, :, None]
            k_cache = k_cache.at[rows, hh, q_slots[:, None, :]].set(
                kt.astype(k_cache.dtype))
            v_cache = v_cache.at[rows, hh, q_slots[:, None, :]].set(
                vt.astype(v_cache.dtype))
        att = attention(q, k_cache[:, :hkv_g].astype(dtype),
                        v_cache[:, :hkv_g].astype(dtype),
                        q_slots, kv_positions, positions, valid_from, cfg)
        if gate is not None:  # sigmoid output gate per head (qwen3next)
            att = att * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(
                att.dtype)
        att = att.reshape(B, T, nh_g * cfg.head_dim_v)
        o = _mm(att, qw["wo"], dtype, li)
        if "wo_b" in p:
            o = o + p["wo_b"].astype(o.dtype)
        return o, (k_cache, v_cache)

    def mla_part(x, p, qw, kv, li):
        """Ropeless absorbed-MQA MLA (kimi-linear MLA layers,
        src/models/kimi-linear.cpp:378-441): q (optionally q-lora'd) splits
        into nope/pe, nope absorbs through wk_b into the compressed space,
        the cache stores [c_kv; k_pe] as one MQA head, and wv_b lifts the
        attention output back out. No rope anywhere (rotary_emb=None)."""
        from .llama import _mm

        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        H = cfg.n_head
        lora, rd = cfg.kv_lora_rank, cfg.rope_dim
        nope = cfg.head_dim - rd
        if "wq_a" in qw:
            qa = rms_norm(_mm(h, qw["wq_a"], dtype, li), p["q_a_norm"],
                          cfg.rms_eps)
            q = _mm(qa, qw["wq_b"], dtype, li)
        else:
            q = _mm(h, qw["wq"], dtype, li)
        q = q.reshape(B, T, H, cfg.head_dim)
        q_nope, q_pe = q[..., :nope], q[..., nope:]
        ckv = _mm(h, qw["wkv_a"], dtype, li)  # (B,T,lora+rd)
        kv_c = rms_norm(ckv[..., :lora], p["kv_a_norm"], cfg.rms_eps)
        k_pe = ckv[..., lora:]
        # absorb: q_abs[l] = sum_n wk_b[h,l,n] q_nope[n]
        q_abs = jnp.einsum("bthn,hln->bthl",
                           q_nope.astype(jnp.float32),
                           p["wk_b"]).astype(dtype)
        qq = jnp.concatenate([q_abs, q_pe], axis=-1)  # (B,T,H,lora+rd)
        k_new = jnp.concatenate([kv_c, k_pe], -1).reshape(B, T, 1, lora + rd)
        v_new = kv_c.reshape(B, T, 1, lora)
        k_cache, v_cache = kv
        kt = k_new.transpose(0, 2, 1, 3)
        vt = v_new.transpose(0, 2, 1, 3)
        if uniform:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, kt.astype(k_cache.dtype), (0, 0, cache_pos[0], 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, vt.astype(v_cache.dtype), (0, 0, cache_pos[0], 0))
        else:
            rows = jnp.arange(B)[:, None, None]
            hh = jnp.arange(1)[None, :, None]
            k_cache = k_cache.at[rows, hh, q_slots[:, None, :]].set(
                kt.astype(k_cache.dtype))
            v_cache = v_cache.at[rows, hh, q_slots[:, None, :]].set(
                vt.astype(v_cache.dtype))
        import math as _math

        att = attention(qq, k_cache.astype(dtype), v_cache.astype(dtype),
                        q_slots, kv_positions, positions, valid_from, cfg,
                        scale=1.0 / _math.sqrt(cfg.head_dim))  # (B,T,H,lora)
        o = jnp.einsum("bthl,hvl->bthv", att.astype(jnp.float32),
                       p["wv_b"]).astype(dtype)
        o = _mm(o.reshape(B, T, H * cfg.head_dim_v), qw["wo"], dtype, li)
        return o, (k_cache, v_cache)

    def ffn_part(x, p, qw, li, norm_key):
        """norm -> FFN/MoE -> [post-norm] -> residual (granite scale)."""
        h2 = rms_norm(x, p[norm_key], cfg.rms_eps)
        if cfg.n_expert > 0 and "moe_gate_inp" in qw:
            f = moe_ffn(h2, p, qw, li, cfg, dtype)
        else:
            f = ffn(h2, qw, li, cfg, dtype, p)
        if cfg.post_norms and "post_ffn_norm" in p:  # plamo2 sandwich
            f = rms_norm(f, p["post_ffn_norm"], cfg.rms_eps)
        return x + f * res_s

    a_off = r_off = 0
    new_k, new_v, new_conv, new_ssm = [], [], [], []
    for gl in groups:
        if not gl:  # deci no-op layers (n_head==0 AND n_ff==0)
            continue
        qw = {k: v for k, v in gl.items() if isinstance(v, QTensor)}
        fl = {k: v for k, v in gl.items() if not isinstance(v, QTensor)}
        L_g = next(iter(gl.values())).shape[0]
        is_gdn = ("ssm_ba" in gl or "ssm_beta" in gl)  # gated delta net (qwen3next/qwen35)
        is_shortconv = "shortconv_in" in qw  # lfm2 conv mixer
        recurrent = "ssm_in" in qw or is_gdn or is_shortconv
        # gdn layers reuse the attn_qkv projection name for their packed
        # [q|k|v]; they are NOT attention layers
        has_attn = ("wq" in qw or "wq_a" in qw or "wqkv" in qw
                    or "wqkv_cat" in qw) and not is_gdn \
            and "ssm_f_a" not in gl
        has_ffn = ("ffn_up" in qw or "moe_gate_inp" in qw
                   or "ffn_up_exps" in qw)
        rec_fn = (shortconv_layer if is_shortconv
                  else kda_layer if "ssm_f_a" in gl
                  else gdn_layer if is_gdn
                  else plamo2_layer if recurrent and "ssm_dt_norm" in gl
                  else mamba2_layer if recurrent and "ssm_norm" in gl
                  else mamba_layer)
        # qwen3next norms the FFN input with attn_post_norm (the residual
        # is taken from BEFORE that norm — same shape as ffn_norm here);
        # plamo2's post_attn_norm is instead a sandwich norm on the mixer
        # OUTPUT (cfg.post_norms), so the ffn keeps its own pre-norm
        ffn_nk = ("post_attn_norm"
                  if "post_attn_norm" in fl and not cfg.post_norms
                  else "ffn_norm")
        if recurrent:
            conv_g = jax.lax.dynamic_slice_in_dim(state.conv, r_off, L_g, 0)
            ssm_g = jax.lax.dynamic_slice_in_dim(state.ssm, r_off, L_g, 0)
        if has_attn:
            k_g = jax.lax.dynamic_slice_in_dim(state.k, a_off, L_g, 0)
            v_g = jax.lax.dynamic_slice_in_dim(state.v, a_off, L_g, 0)

        def fl_at(li, fl=fl):
            # per-step slice of the group's stacked float tensors (norms,
            # biases); stacked QTensors index internally via _mm(..., li)
            return {k: v[li] for k, v in fl.items()}

        if recurrent and has_attn:  # falcon-h1: parallel mixers, shared norm
            def pstep(x, inp, gl=gl, qw=qw, fl_at=fl_at):
                li, ct, ss, kv0, kv1 = inp
                ssm_out, tail, ssm = rec_fn(
                    x, li, gl, cfg, ct, ss, dtype, pad_mask, n_valid)
                p = fl_at(li)
                attn_out, (k2, v2) = attn_part(x, p, qw, (kv0, kv1), li)
                x = x + (attn_out + ssm_out) * res_s
                if has_ffn:
                    x = ffn_part(x, p, qw, li, ffn_nk)
                return x, (tail, ssm, k2, v2)

            x, (tails, ssms, ks, vs) = jax.lax.scan(
                pstep, x, (jnp.arange(L_g), conv_g, ssm_g, k_g, v_g))
            new_conv.append(tails)
            new_ssm.append(ssms)
            new_k.append(ks)
            new_v.append(vs)
            r_off += L_g
            a_off += L_g
        elif recurrent:
            def step(x, inp, gl=gl, qw=qw, fl_at=fl_at):
                li, ct, ss = inp
                out, tail, ssm = rec_fn(
                    x, li, gl, cfg, ct, ss, dtype, pad_mask, n_valid)
                p = fl_at(li)
                if cfg.post_norms and "post_attn_norm" in p:  # plamo2
                    out = rms_norm(out, p["post_attn_norm"], cfg.rms_eps)
                x = x + out * res_s
                if has_ffn:  # jamba/granite-hybrid: FFN after the mixer
                    x = ffn_part(x, p, qw, li, ffn_nk)
                return x, (tail, ssm)

            x, (tails, ssms) = jax.lax.scan(
                step, x, (jnp.arange(L_g), conv_g, ssm_g))
            new_conv.append(tails)
            new_ssm.append(ssms)
            r_off += L_g
        elif has_attn:
            part = mla_part if "wkv_a" in qw else attn_part

            def astep(x, inp, qw=qw, fl_at=fl_at, part=part):
                li, kv0, kv1 = inp
                p = fl_at(li)  # incl. the dense wk_b/wv_b MLA banks
                o, (k2, v2) = part(x, p, qw, (kv0, kv1), li)
                if cfg.post_norms and "post_attn_norm" in p:  # plamo2
                    o = rms_norm(o, p["post_attn_norm"], cfg.rms_eps)
                x = x + o * res_s
                if has_ffn:
                    x = ffn_part(x, p, qw, li, ffn_nk)
                return x, (k2, v2)

            x, (ks, vs) = jax.lax.scan(
                astep, x, (jnp.arange(L_g), k_g, v_g))
            new_k.append(ks)
            new_v.append(vs)
            a_off += L_g
        elif "wo" in qw:  # deci "linear attention": norm -> wo, no KV
            def lstep(x, li, qw=qw, fl_at=fl_at):
                from .llama import _mm

                p = fl_at(li)
                o = _mm(rms_norm(x, p["attn_norm"], cfg.rms_eps),
                        qw["wo"], dtype, li)
                if "wo_b" in p:
                    o = o + p["wo_b"].astype(o.dtype)
                x = x + o * res_s
                if has_ffn:
                    x = ffn_part(x, p, qw, li, ffn_nk)
                return x, None

            x, _ = jax.lax.scan(lstep, x, jnp.arange(L_g))
        else:  # FFN-only layers: nemotron-h norms by attn_norm; deci's
            # attention-free layers carry only ffn_norm
            def fstep(x, li, qw=qw, fl_at=fl_at):
                nk = "attn_norm" if "attn_norm" in fl else "ffn_norm"
                return ffn_part(x, fl_at(li), qw, li, nk), None

            x, _ = jax.lax.scan(fstep, x, jnp.arange(L_g))

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
    if cfg.logit_scale != 1.0:  # granite f_logit_scale divides here
        logits = logits * cfg.logit_scale
    return logits, new_state
