"""BERT-family bidirectional encoder (embeddings + reranking).

Counterpart of the reference encoder graph (src/models/bert.cpp:80-230 and
the pooling builder, src/llama-graph.cpp:2716): token + token-type(0) +
position embeddings -> embed LayerNorm -> post-LN residual blocks with
bidirectional masked attention and GELU FFN (biases everywhere) -> pooling
(none / mean / cls / last / rank with the tanh classification head).

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
from .llama import _mm


def _layernorm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * w + b
    return y.astype(x.dtype)


def encode(params: dict, cfg: ModelConfig, tokens, n_real,
           dtype=jnp.bfloat16):
    """tokens (B, T) int32, n_real (B,) valid lengths -> hidden (B, T, D).

    Padding slots are masked out of attention (additive -inf bias on the
    key axis), matching the reference's non-causal KQ mask
    (build_attn_inp_no_cache, src/llama-graph.cpp).
    """
    B, T = tokens.shape
    eps = cfg.norm_eps or 1e-12
    x = params["tok_embd"].take_rows(tokens, dtype)  # (B, T, D)
    if "type_embd" in params:  # token types hardcoded to 0 ("sentence A")
        x = x + params["type_embd"][0].astype(dtype)
    if "pos_embd" in params:
        x = x + params["pos_embd"][:T].astype(dtype)
    x = _layernorm(x, params["tok_norm"], params["tok_norm_b"], eps)

    valid = jnp.arange(T)[None, :] < n_real[:, None]  # (B, T)
    kq_bias = jnp.where(valid, 0.0, -jnp.inf)[:, None, None, :]  # (B,1,1,T)

    H, Hkv, Dk = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    Dv = cfg.head_dim_v
    G = H // max(Hkv, 1)
    scale = 1.0 / float(np.sqrt(Dk))

    layers = params["layers"]
    groups = layers.get("__groups__") or [layers]

    def layer(x, li, p):
        def mm(v, qt):
            return _mm(v, qt, dtype, layer=li)

        def bias(key):
            return p[key][li].astype(dtype) if key in p else 0.0

        q = (mm(x, p["wq"]) + bias("bq")).reshape(B, T, H, Dk)
        k = (mm(x, p["wk"]) + bias("bk")).reshape(B, T, Hkv, Dk)
        v = (mm(x, p["wv"]) + bias("bv")).reshape(B, T, Hkv, Dv)
        qf = q.reshape(B, T, Hkv, G, Dk)
        scores = jnp.einsum("bthgd,bshd->bhgts", qf, k,
                            preferred_element_type=jnp.float32)
        scores = scores * scale + kq_bias[:, :, None]
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhgts,bshd->bthgd", probs.astype(dtype), v)
        o = o.reshape(B, T, H * Dv)
        att = mm(o, p["wo"]) + bias("bo")
        x = _layernorm(x + att, p["attn_out_norm"][li],
                       p["attn_out_norm_b"][li], eps)

        h = mm(x, p["ffn_up"]) + bias("ffn_up_b")
        h = jax.nn.gelu(h.astype(jnp.float32)).astype(dtype)
        h = mm(h, p["ffn_down"]) + bias("ffn_down_b")
        return _layernorm(x + h, p["layer_out_norm"][li],
                          p["layer_out_norm_b"][li], eps)

    for p in groups:
        L_g = next(iter(p.values())).shape[0]

        def step(carry, li, p=p):
            return layer(carry, li, p), None

        x, _ = jax.lax.scan(step, x, jnp.arange(L_g))
    return x


def pool(hidden, n_real, cfg: ModelConfig, params: dict,
         pooling: str = "mean"):
    """(B, T, D) -> pooled (B, D) f32 — or (B, n_cls_out) rank scores.

    Mirrors build_pooling (src/llama-graph.cpp:2716): rank takes the CLS
    position through the tanh classification head (cls / cls.output)."""
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
            cur = jnp.tanh(cur)
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
