"""BERT-family bidirectional encoders (embeddings + reranking).

Counterpart of the reference encoder graphs:
- the shared post-LN graph (src/models/bert.cpp:80-230) covering bert,
  nomic-bert(+moe), jina-bert-v2/v3 — token + type + (bert) position
  embeddings -> embed LayerNorm -> post-LN residual blocks,
- the pre-norm encoders modern-bert / neo-bert / eurobert /
  gemma-embedding (src/models/{modern-bert,neo-bert,eurobert,
  gemma-embedding}.cpp) — pre-LN blocks with rope, optional symmetric
  sliding windows and a final output norm,
- pooling (none / mean / cls / last / rank with the tanh-or-gelu
  classification head + cls_norm), src/llama-graph.cpp:2716 build_pooling.

TPU-first: the whole encoder is one jit — embedding lookup, a ``lax.scan``
over the stacked layer weights (quantized matmuls via the fused kmajor
kernel), padding-mask attention, and the pooling reduction all compile into
a single XLA program, so a batch of documents is one dispatch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qtensor import QTensor
from .config import ModelConfig
from .llama import _mm, alibi_slopes, apply_rope, rms_norm, rope_cache, swa_flags


def _layernorm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        y = y * w
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def _norm(x, w, b, cfg, eps):
    if cfg.norm_type == "layernorm":
        return _layernorm(x, w, b, eps)
    return rms_norm(x, w, cfg.rms_eps)


def _is_preln(cfg: ModelConfig) -> bool:
    return cfg.arch in ("modern-bert", "neo-bert", "eurobert",
                        "gemma-embedding")


def encode(params: dict, cfg: ModelConfig, tokens, n_real,
           dtype=jnp.bfloat16):
    """tokens (B, T) int32, n_real (B,) valid lengths -> hidden (B, T, D).

    Padding slots are masked out of attention (additive -inf bias on the
    key axis), matching the reference's non-causal KQ mask
    (build_attn_inp_no_cache, src/llama-graph.cpp).
    """
    B, T = tokens.shape
    eps = cfg.norm_eps or 1e-12
    preln = _is_preln(cfg)
    x = params["tok_embd"].take_rows(tokens, dtype)  # (B, T, D)
    if cfg.embedding_scale != 1.0:  # gemma-embedding sqrt(n_embd)
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(dtype)
    if "type_embd" in params:  # token types hardcoded to 0 ("sentence A")
        x = x + params["type_embd"][0].astype(dtype)
    if "pos_embd" in params:
        x = x + params["pos_embd"][:T].astype(dtype)
    if "tok_norm" in params:
        x = _layernorm(x, params["tok_norm"], params.get("tok_norm_b"), eps)

    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    valid = jnp.arange(T)[None, :] < n_real[:, None]  # (B, T)
    kq_bias = jnp.where(valid, 0.0, -jnp.inf)[:, None, None, :]  # (B,1,1,T)

    H, Hkv, Dk = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    Dv = cfg.head_dim_v
    G = H // max(Hkv, 1)
    scale = cfg.attn_scale or 1.0 / float(np.sqrt(Dk))
    use_rope = cfg.use_rope and cfg.arch not in ("bert", "jina-bert-v2")
    if use_rope:
        cos, sin = rope_cache(cfg, positions)
        if cfg.rope_base_swa and cfg.rope_base_swa != cfg.rope_base:
            import dataclasses

            cfg_swa = dataclasses.replace(cfg, rope_base=cfg.rope_base_swa)
            cos_s, sin_s = rope_cache(cfg_swa, positions)
        else:
            cos_s, sin_s = cos, sin
    if cfg.alibi_max_bias > 0:  # jina-bert-v2 (f_max_alibi_bias = 8)
        sl = jnp.asarray(alibi_slopes(H, cfg.alibi_max_bias))
        delta = (positions[:, None, :].astype(jnp.float32)
                 - positions[..., None].astype(jnp.float32))  # (B, Tq, Tk)
        # bidirectional ALiBi: bias by |distance| on both sides
        alibi = sl.reshape(1, Hkv, G, 1, 1) * -jnp.abs(delta)[:, None, None]
    else:
        alibi = None
    layer_swa = swa_flags(cfg)

    layers = params["layers"]
    groups = layers.get("__groups__") or [layers]

    def attend(x_in, li, p, swa_l):
        def mm(v, qt):
            return _mm(v, qt, dtype, layer=li)

        def bias(key):
            return p[key][li].astype(dtype) if key in p else 0.0

        if "wqkv_cat" in p:  # modern-bert fused [q;k;v]
            y = mm(x_in, p["wqkv_cat"])
            nq, nk = H * Dk, Hkv * Dk
            q, k, v = (y[..., :nq], y[..., nq:nq + nk],
                       y[..., nq + nk:nq + nk + Hkv * Dv])
        else:
            q = mm(x_in, p["wq"]) + bias("bq")
            k = mm(x_in, p["wk"]) + bias("bk")
            v = mm(x_in, p["wv"]) + bias("bv")
        if "q_norm" in p and cfg.attn_qk_norm_flat:
            # jina-bert-v2: LAYERNORM over the flat projection rows
            q = _layernorm(q, p["q_norm"][li],
                           p["q_norm_b"][li] if "q_norm_b" in p else None,
                           eps)
            k = _layernorm(k, p["k_norm"][li],
                           p["k_norm_b"][li] if "k_norm_b" in p else None,
                           eps)
        q = q.reshape(B, T, H, Dk)
        k = k.reshape(B, T, Hkv, Dk)
        v = v.reshape(B, T, Hkv, Dv)
        if "q_norm" in p and not cfg.attn_qk_norm_flat:
            # gemma-embedding: per-head RMS before rope
            q = rms_norm(q, p["q_norm"][li], cfg.rms_eps)
            k = rms_norm(k, p["k_norm"][li], cfg.rms_eps)
        if use_rope:
            c, s_ = (cos_s, sin_s) if swa_l else (cos, sin)
            q = apply_rope(q, c, s_, cfg.rope_type, cfg.rope_dim)
            k = apply_rope(k, c, s_, cfg.rope_type, cfg.rope_dim)
        qf = q.reshape(B, T, Hkv, G, Dk)
        scores = jnp.einsum("bthgd,bshd->bhgts", qf, k,
                            preferred_element_type=jnp.float32)
        scores = scores * scale + kq_bias[:, :, None]
        if alibi is not None:
            scores = scores + alibi
        if cfg.sliding_window and cfg.swa_pattern > 1:
            # symmetric local window on SWA layers (LLAMA_SWA_TYPE_SYMMETRIC)
            dist = jnp.abs(positions[:, None, :].astype(jnp.int32)
                           - positions[..., None].astype(jnp.int32))
            local = jnp.where(dist[:, None, None] < cfg.sliding_window,
                              0.0, -jnp.inf)
            scores = scores + jnp.where(swa_l, local, 0.0)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhgts,bshd->bthgd", probs.astype(dtype), v)
        o = o.reshape(B, T, H * Dv)
        return mm(o, p["wo"]) + bias("bo")

    def dense_ffn(h_in, li, p):
        def mm(v, qt):
            return _mm(v, qt, dtype, layer=li)

        def bias(key):
            return p[key][li].astype(dtype) if key in p else 0.0

        if cfg.arch in ("modern-bert", "neo-bert"):
            # fused [gate; up] GLU (ggml_geglu / ggml_swiglu split halves)
            y = mm(h_in, p["ffn_up"])
            g, u = y[..., : cfg.n_ff], y[..., cfg.n_ff: 2 * cfg.n_ff]
            gf = g.astype(jnp.float32)
            act = (jax.nn.gelu(gf, approximate=True)
                   if cfg.arch == "modern-bert" else jax.nn.silu(gf))
            h = act.astype(dtype) * u
        elif "ffn_gate" in p:
            g = mm(h_in, p["ffn_gate"])
            u = mm(h_in, p["ffn_up"]) + bias("ffn_up_b")
            gf = g.astype(jnp.float32)
            act = (jax.nn.gelu(gf, approximate=True)
                   if cfg.act_fn == "gelu" else jax.nn.silu(gf))
            h = act.astype(dtype) * u
        else:
            h = mm(h_in, p["ffn_up"]) + bias("ffn_up_b")
            h = jax.nn.gelu(h.astype(jnp.float32)).astype(dtype)
        return mm(h, p["ffn_down"]) + bias("ffn_down_b")

    def moe_ffn_enc(h_in, li, p):
        # nomic-bert-moe: ungated GELU experts, plain softmax weights
        # (build_moe_ffn GELU/norm_w=false branch, src/models/bert.cpp:181)
        router = _mm(h_in, p["moe_gate_inp"], dtype, layer=li)
        router = router[..., : cfg.n_expert].astype(jnp.float32)
        probs = jax.nn.softmax(router, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, cfg.n_expert_used)
        from .llama import _expert_mm

        out = jnp.zeros((B, T, cfg.n_embd), dtype)
        for e in range(cfg.n_expert):
            he = _expert_mm(h_in, p["moe_up_exps"], li, e, dtype)
            he = jax.nn.gelu(he.astype(jnp.float32),
                             approximate=True).astype(dtype)
            de = _expert_mm(he, p["moe_down_exps"], li, e, dtype)
            we = (top_p * (top_i == e)).sum(-1)
            out = out + de * we[..., None].astype(dtype)
        return out

    off = 0
    for p in groups:
        L_g = next(iter(p.values())).shape[0]
        is_moe_g = "moe_up_exps" in p
        for lrel in range(L_g):
            li = jnp.int32(lrel)
            gi = off + lrel  # global layer index (swa pattern / moe parity)
            swa_l = bool(layer_swa[gi]) if cfg.sliding_window else False
            if preln:
                # pre-norm block (modern/neo/euro/gemma-embedding)
                h = x
                if "attn_norm" in p:  # modern-bert layer 0 has no attn_norm
                    h = _norm(x, p["attn_norm"][li],
                              p["attn_norm_b"][li] if "attn_norm_b" in p
                              else None, cfg, eps)
                att = attend(h, li, p, swa_l)
                if cfg.post_norms and "post_attn_norm" in p:
                    att = _norm(att, p["post_attn_norm"][li], None, cfg, eps)
                x = x + att
                h2 = _norm(x, p["ffn_norm"][li],
                           p["ffn_norm_b"][li] if "ffn_norm_b" in p else None,
                           cfg, eps)
                f = dense_ffn(h2, li, p)
                if cfg.post_norms and "post_ffn_norm" in p:
                    f = _norm(f, p["post_ffn_norm"][li], None, cfg, eps)
                x = x + f
            else:
                # post-LN block (bert/nomic/jina)
                x_in = x
                att = attend(x, li, p, swa_l)
                x = _layernorm(x_in + att, p["attn_out_norm"][li],
                               p["attn_out_norm_b"][li], eps)
                if "attn_norm_2" in p:
                    # jina-v2: re-add the LAYER INPUT, then the second LN
                    # (src/models/bert.cpp attn_norm_2 branch)
                    x = _layernorm(
                        x + x_in, p["attn_norm_2"][li],
                        p["attn_norm_2_b"][li] if "attn_norm_2_b" in p
                        else None, eps)
                f = moe_ffn_enc(x, li, p) if is_moe_g else dense_ffn(x, li, p)
                x = _layernorm(x + f, p["layer_out_norm"][li],
                               p["layer_out_norm_b"][li], eps)
        off += L_g
    fin = params.get("output_norm",
                     params.get("output_norm_enc"))  # neo-bert enc. name
    if fin is not None and preln:  # pre-LN encoders: final norm
        x = _norm(x, fin, params.get("output_norm_b"), cfg, eps)
    return x


def pool(hidden, n_real, cfg: ModelConfig, params: dict,
         pooling: str = "mean"):
    """(B, T, D) -> pooled (B, D) f32 — or (B, n_cls_out) rank scores.

    Mirrors build_pooling (src/llama-graph.cpp:2716): rank takes the CLS
    position through the tanh (gelu for modern-bert) classification head
    (cls / cls_norm / cls.output)."""
    B, T, _ = hidden.shape
    h = hidden.astype(jnp.float32)
    if pooling == "none":
        return h
    if pooling == "mean":
        mask = (jnp.arange(T)[None, :] < n_real[:, None])[..., None]
        return (h * mask).sum(1) / jnp.maximum(n_real, 1)[:, None]
    if pooling == "cls":
        return h[:, 0]
    if pooling == "last":
        return h[jnp.arange(B), jnp.maximum(n_real - 1, 0)]
    if pooling == "rank":
        cur = h[:, 0]
        if "cls_w" in params:
            cur = cur @ params["cls_w"].T
            if "cls_b" in params:
                cur = cur + params["cls_b"]
            cur = (jax.nn.gelu(cur, approximate=True)
                   if cfg.arch == "modern-bert" else jnp.tanh(cur))
            if "cls_norm" in params:
                cur = _layernorm(cur, params["cls_norm"], None,
                                 cfg.norm_eps or 1e-12)
        if "cls_out_w" in params:
            cur = cur @ params["cls_out_w"].T
            if "cls_out_b" in params:
                cur = cur + params["cls_out_b"]
        return cur
    raise ValueError(f"unknown pooling {pooling!r}")


def embed_texts(params, cfg, tokens, n_real, pooling="mean",
                dtype=jnp.bfloat16, normalize=True):
    """One-shot jittable embedding step: encode + pool (+ L2 normalize)."""
    hidden = encode(params, cfg, tokens, n_real, dtype)
    out = pool(hidden, n_real, cfg, params, pooling)
    if normalize and pooling != "none":
        out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True),
                                1e-12)
    return out
