"""T5 encoder-decoder family (src/models/t5.cpp, t5encoder.cpp).

Structure: pre-RMSNorm everywhere, NO rope — relative position BUCKETS
(llama_relative_position_bucket, src/llama-graph.cpp:2904) feed a learned
per-head bias (attn_rel_b, layer 0's reused when a layer lacks its own),
attention scale 1.0; decoder layers add cross-attention over the encoder
output (no bias); FFN is gelu-gated when ffn_gate exists, relu otherwise.

TPU shape: the encoder runs once per request as one jitted forward; the
per-layer cross K/V are precomputed from the encoder output (they never
change during decode), and the decoder scans with a standard self-attention
KV cache. Tensors live under enc.blk.* / dec.blk.* in GGUF, loaded and
stacked here (load_t5)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFFile
from ..ops.qtensor import QTensor, qtensor_from_bytes
from .config import ModelConfig
from .llama import rms_norm, _mm


def is_t5(cfg: ModelConfig) -> bool:
    return cfg.arch in ("t5", "t5encoder")


# ---------------------------------------------------------------- loading

_ENC_SUFFIX = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_o.weight": "wo",
    "attn_rel_b.weight": "rel_b",
    "ffn_norm.weight": "ffn_norm",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
}
_DEC_SUFFIX = dict(_ENC_SUFFIX, **{
    "cross_attn_norm.weight": "cross_norm",
    "cross_attn_q.weight": "wq_x",
    "cross_attn_k.weight": "wk_x",
    "cross_attn_v.weight": "wv_x",
    "cross_attn_o.weight": "wo_x",
})
_FLOAT_KEYS = {"attn_norm", "ffn_norm", "cross_norm", "rel_b"}


def load_t5(g: GGUFFile, cfg: ModelConfig, device_put: bool = True):
    """GGUF -> params {tok_embd, output, enc_layers?, dec_layers?,
    enc_output_norm?, dec_output_norm?}."""
    from ..runtime.loader import _load_qtensor, _stack_qtensors, _to_float_array

    params: dict = {}
    params["tok_embd"] = _load_qtensor(g, "token_embd.weight", device_put=False)
    if "output.weight" in g.tensors:
        params["output"] = _load_qtensor(g, "output.weight", device_put=False)
    else:
        params["output"] = params["tok_embd"]
        cfg.tie_embeddings = True

    def collect(prefix, suffixes, n_layer):
        per: dict[str, list] = {}
        for i in range(n_layer):
            for sfx, key in suffixes.items():
                name = f"{prefix}.blk.{i}.{sfx}"
                if name not in g.tensors:
                    continue
                if key in _FLOAT_KEYS:
                    per.setdefault(key, []).append(_to_float_array(g, name))
                else:
                    per.setdefault(key, []).append(
                        _load_qtensor(g, name, device_put=False))
        out: dict = {}
        rel = per.pop("rel_b", None)
        for key, items in per.items():
            if isinstance(items[0], QTensor):
                out[key] = _stack_qtensors(items, device_put=False)
            else:
                out[key] = np.stack(items)
        # T5 checkpoints carry the bias table on layer 0 only; the reference
        # reuses layers[0].attn_rel_b everywhere (t5.cpp:159)
        return out, (rel[0] if rel else None)

    if "enc.output_norm.weight" in g.tensors:
        params["enc_layers"], rel = collect("enc", _ENC_SUFFIX, cfg.n_layer)
        params["enc_rel_b"] = rel
        params["enc_output_norm"] = _to_float_array(g, "enc.output_norm.weight")
    if "dec.output_norm.weight" in g.tensors:
        dec_n = int(cfg.raw_kv.get(f"{cfg.arch}.decoder_block_count",
                                   cfg.n_layer))
        params["dec_layers"], rel = collect("dec", _DEC_SUFFIX, dec_n)
        params["dec_rel_b"] = rel
        params["dec_output_norm"] = _to_float_array(g, "dec.output_norm.weight")

    if device_put:
        def up(v):
            if isinstance(v, QTensor):
                return QTensor(v.qtype, v.shape,
                               {k: jnp.asarray(a) for k, a in v.data.items()})
            if isinstance(v, dict):
                return {k: up(x) for k, x in v.items()}
            return jnp.asarray(v)
        params = {k: up(v) for k, v in params.items()}
        if cfg.tie_embeddings:
            params["output"] = params["tok_embd"]
    return params


# --------------------------------------------------------- position buckets

def rel_bucket(kv_pos, q_pos, n_buckets: int, bidirectional: bool):
    """Vectorized llama_relative_position_bucket (llama-graph.cpp:2904);
    kv_pos/q_pos broadcastable int arrays -> bucket ids."""
    max_distance = 128
    nb = n_buckets // 2 if bidirectional else n_buckets
    rel = jnp.asarray(kv_pos - q_pos, jnp.int32)
    if bidirectional:
        base = (rel > 0).astype(jnp.int32) * nb
        rel = jnp.abs(rel)
    else:
        base = jnp.zeros_like(rel)
        rel = -jnp.minimum(rel, 0)
    max_exact = nb // 2
    large = max_exact + jnp.floor(
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        * (nb - max_exact) / np.log(max_distance / max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return base + jnp.where(rel < max_exact, rel, large)


def _pos_bias(rel_b, kv_pos, q_pos, n_buckets, bidirectional):
    """rel_b (n_buckets, H) [numpy order of ggml {H, n_buckets}] ->
    (H, Tq, Tk) additive attention bias."""
    bk = rel_bucket(kv_pos[None, :], q_pos[:, None], n_buckets, bidirectional)
    return jnp.transpose(rel_b[bk], (2, 0, 1))


# ----------------------------------------------------------------- graphs

def _attn(q, k, v, bias, mask, cfg, dtype):
    """q (B,T,H,D), k/v HEAD-MAJOR (B,Hkv,S,D), bias (H,T,S)|None,
    mask (B,1,T,S)|None. Scale 1.0 (T5 convention)."""
    B, T, H, D = q.shape
    Hkv = k.shape[1]
    G = H // Hkv
    qf = q.reshape(B, T, Hkv, G, D)
    scores = jnp.einsum("bthgd,bhsd->bhgts", qf, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        if bias.ndim == 4:  # per-row positions (batched serving)
            scores = scores + bias.reshape(B, Hkv, G, *bias.shape[2:])
        else:
            scores = scores + bias.reshape(Hkv, G, *bias.shape[1:])[None]
    if mask is not None:
        scores = jnp.where(mask[:, :, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)
    # merged free dim (see models.llama.attention: CPU bf16 DotThunk)
    S = k.shape[2]
    pm = p.astype(dtype).reshape(B, Hkv, G * T, S)
    out = jnp.einsum("bhrs,bhsd->bhrd", pm, v,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, Hkv, G, T, -1).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, T, H, -1).reshape(B, T, -1).astype(dtype)


def _ffn(h, p, qw, li, cfg, dtype):
    """gelu-gated (LLM_FFN_GELU/PAR) when ffn_gate exists, else relu/SEQ."""
    if "ffn_gate" in qw:
        gf = _mm(h, qw["ffn_gate"], dtype, li).astype(jnp.float32)
        u = _mm(h, qw["ffn_up"], dtype, li)
        act = (jax.nn.gelu(gf, approximate=True)).astype(dtype) * u
    else:
        u = _mm(h, qw["ffn_up"], dtype, li).astype(jnp.float32)
        act = jax.nn.relu(u).astype(dtype)
    return _mm(act, qw["ffn_down"], dtype, li)


def _split(gl):
    qw = {k: v for k, v in gl.items() if isinstance(v, QTensor)}
    fl = {k: v for k, v in gl.items() if not isinstance(v, QTensor)}
    return qw, fl


def encode(params, cfg: ModelConfig, tokens, n_valid=None,
           dtype=jnp.bfloat16):
    """Bidirectional encoder -> (B, T, n_embd) hidden states."""
    B, T = tokens.shape
    x = params["tok_embd"].take_rows(tokens, dtype)
    gl = params["enc_layers"]
    qw, fl = _split(gl)
    H = cfg.n_head
    pos = jnp.arange(T)
    valid = (jnp.arange(T)[None, :] < (n_valid[:, None] if n_valid is not None
                                       else jnp.full((B, 1), T)))
    mask = (valid[:, None, :] & valid[:, :, None])[:, None]  # (B,1,T,T)

    def layer(x, inp):
        p, li = inp
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        q = _mm(h, qw["wq"], dtype, li).reshape(B, T, H, cfg.head_dim)
        k = _mm(h, qw["wk"], dtype, li).reshape(B, T, cfg.n_head_kv, cfg.head_dim)
        v = _mm(h, qw["wv"], dtype, li).reshape(B, T, cfg.n_head_kv, cfg.head_dim_v)
        bias = _pos_bias(rel_b0, pos, pos, cfg.n_rel_attn_bkts, True)
        att = _attn(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                    bias, mask, cfg, dtype)
        x = x + _mm(att, qw["wo"], dtype, li)
        h2 = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        return x + _ffn(h2, p, qw, li, cfg, dtype), ()

    rel_b0 = params["enc_rel_b"]
    L = next(iter(gl.values())).shape[0]
    x, _ = jax.lax.scan(layer, x, (fl, jnp.arange(L)))
    return rms_norm(x, params["enc_output_norm"], cfg.rms_eps)


def cross_kv(params, cfg: ModelConfig, enc_out, dtype=jnp.bfloat16):
    """Precompute every decoder layer's cross K/V from the encoder output:
    head-major (L, B, Hkv, S_enc, D) pair (computed once per request)."""
    gl = params["dec_layers"]
    qw, fl = _split(gl)
    B, S, _ = enc_out.shape

    def layer(_, inp):
        li = inp
        k = _mm(enc_out, qw["wk_x"], dtype, li).reshape(
            B, S, cfg.n_head_kv, cfg.head_dim)
        v = _mm(enc_out, qw["wv_x"], dtype, li).reshape(
            B, S, cfg.n_head_kv, cfg.head_dim_v)
        return (), (k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

    L = next(iter(gl.values())).shape[0]
    _, (ks, vs) = jax.lax.scan(layer, (), jnp.arange(L))
    return ks, vs


def decode_step(params, cfg: ModelConfig, tokens, positions, cache,
                cross_k, cross_v, enc_valid, cache_pos, dtype=jnp.bfloat16,
                logits_idx=None):
    """Decoder forward over (B, T) new tokens with a standard self KV cache
    (k/v head-major (L, B, Hkv, S, D)) + the precomputed cross K/V. Returns
    (logits f32, new cache)."""
    from .llama import KVCache

    B, T = tokens.shape
    x = params["tok_embd"].take_rows(tokens, dtype)
    gl = params["dec_layers"]
    qw, fl = _split(gl)
    H = cfg.n_head
    S = cache.max_len
    cache_pos = jnp.asarray(cache_pos, jnp.int32)
    uniform = cache_pos.ndim == 0  # scalar: all rows at one position
    pos_b = jnp.broadcast_to(cache_pos, (B,))
    q_slots_b = pos_b[:, None] + jnp.arange(T)  # (B, T)
    q_slots = q_slots_b[0]  # uniform path keeps the old (T,) shapes
    kv_slot = jnp.arange(S)
    if uniform:
        self_mask = (kv_slot[None, :] <= q_slots[:, None])[None, None]
    else:  # (B,1,T,S): each serving slot is at its own depth
        self_mask = (kv_slot[None, None, None, :]
                     <= q_slots_b[:, None, :, None])
    enc_mask = (jnp.arange(cross_k.shape[3])[None, :]
                < enc_valid[:, None])[:, None, None]  # (B,1,1,S_enc)
    rel_b0 = params["dec_rel_b"]

    def layer(carry, inp):
        x = carry
        p, kc, vc, xk, xv, li = inp
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        q = _mm(h, qw["wq"], dtype, li).reshape(B, T, H, cfg.head_dim)
        k = _mm(h, qw["wk"], dtype, li).reshape(B, T, cfg.n_head_kv, cfg.head_dim)
        v = _mm(h, qw["wv"], dtype, li).reshape(B, T, cfg.n_head_kv, cfg.head_dim_v)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        if uniform:
            kc = jax.lax.dynamic_update_slice(
                kc, kt.astype(kc.dtype), (0, 0, cache_pos, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, vt.astype(vc.dtype), (0, 0, cache_pos, 0))
        else:  # per-row write positions
            rows = jnp.arange(B)[:, None, None]
            hh = jnp.arange(kc.shape[1])[None, :, None]
            kc = kc.at[rows, hh, q_slots_b[:, None, :]].set(kt.astype(kc.dtype))
            vc = vc.at[rows, hh, q_slots_b[:, None, :]].set(vt.astype(vc.dtype))
        if uniform:
            bias = _pos_bias(rel_b0, kv_slot, q_slots,
                             cfg.n_rel_attn_bkts, False)
        else:  # (B, H, T, S)
            bias = jax.vmap(
                lambda qp: _pos_bias(rel_b0, kv_slot, qp,
                                     cfg.n_rel_attn_bkts, False))(q_slots_b)
        att = _attn(q, kc.astype(dtype), vc.astype(dtype), bias,
                    jnp.broadcast_to(self_mask, (B, 1, T, S)), cfg, dtype)
        x = x + _mm(att, qw["wo"], dtype, li)
        # cross attention (no positional bias)
        hc = rms_norm(x, p["cross_norm"], cfg.rms_eps)
        qx = _mm(hc, qw["wq_x"], dtype, li).reshape(B, T, H, cfg.head_dim)
        attx = _attn(qx, xk, xv, None,
                     jnp.broadcast_to(enc_mask, (B, 1, T, xk.shape[2])),
                     cfg, dtype)
        x = x + _mm(attx, qw["wo_x"], dtype, li)
        h2 = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        return x + _ffn(h2, p, qw, li, cfg, dtype), (kc, vc)

    L = next(iter(gl.values())).shape[0]
    x, (ks, vs) = jax.lax.scan(
        layer, x, (fl, cache.k, cache.v, cross_k, cross_v, jnp.arange(L)))
    new_cache = KVCache(ks, vs)
    if logits_idx is not None:
        x = jax.lax.dynamic_slice_in_dim(
            x, jnp.asarray(logits_idx, jnp.int32), 1, axis=1)
    x = rms_norm(x, params["dec_output_norm"], cfg.rms_eps)
    logits = _mm(x, params["output"], dtype).astype(jnp.float32)
    return logits, new_cache


class T5Engine:
    """Encode once, then greedy/sampled decode (the llama_encode +
    llama_decode flow for encoder-decoder models)."""

    def __init__(self, cfg: ModelConfig, params, max_seq_len: int = 256,
                 dtype=jnp.float32):
        self.cfg, self.params, self.dtype = cfg, params, dtype
        self.max_seq_len = max_seq_len
        self._encode = jax.jit(
            lambda p, t, n: encode(p, cfg, t, n, dtype=dtype))
        self._cross = jax.jit(
            lambda p, e: cross_kv(p, cfg, e, dtype=dtype))
        self._step = jax.jit(
            lambda p, t, pos, c, xk, xv, ev, cp: decode_step(
                p, cfg, t, pos, c, xk, xv, ev, cp, dtype=dtype))

    def generate(self, prompt_ids: list[int], max_new_tokens: int = 16,
                 eos_id: int | None = None) -> list[int]:
        from .llama import KVCache

        cfg = self.cfg
        toks = jnp.asarray(np.asarray(prompt_ids, np.int32)[None])
        n_valid = jnp.asarray([len(prompt_ids)], jnp.int32)
        enc = self._encode(self.params, toks, n_valid)
        xk, xv = self._cross(self.params, enc)
        dec_n = next(iter(self.params["dec_layers"].values())).shape[0]
        cache = KVCache(
            jnp.zeros((dec_n, 1, cfg.n_head_kv, self.max_seq_len,
                       cfg.head_dim), self.dtype),
            jnp.zeros((dec_n, 1, cfg.n_head_kv, self.max_seq_len,
                       cfg.head_dim_v), self.dtype))
        start = cfg.raw_kv.get(f"{cfg.arch}.decoder_start_token_id")
        cur = int(start) if start is not None else 0
        out: list[int] = []
        for i in range(max_new_tokens):
            lg, cache = self._step(
                self.params, jnp.asarray([[cur]], jnp.int32),
                jnp.asarray([[i]], jnp.int32), cache, xk, xv, n_valid,
                jnp.int32(i))
            cur = int(np.argmax(np.asarray(lg)[0, -1]))
            if eos_id is not None and cur == eos_id:
                break
            out.append(cur)
        return out
