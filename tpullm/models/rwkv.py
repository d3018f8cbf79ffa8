"""RWKV7 ("Goose") recurrent family.

Reference: src/models/rwkv7-base.cpp (time-mix / channel-mix builders),
src/models/rwkv7.cpp (model graph: dual token-shift states per layer,
layernorm everywhere, v-residual to the FIRST layer's v), and the WKV7
recurrence kernel (ggml/src/ggml-cpu/ops.cpp:10666):

    per head (D = wkv_head_size), per token:
        sa_i      = sum_j a_j * S[i, j]
        S[i, j]   = S[i, j] * w_j + v_i * k_j + sa_i * b_j
        out_i     = sum_j S[i, j] * r_j
    with a = -kk (l2-normalized k*k_k), b = kk * iclr

    i.e. S <- S @ (diag(w) + a b^T) + v k^T  — a linear matrix recurrence.

The per-layer state is (2 token-shift rows, the (H, D, D) wkv matrix); the
sequence dimension runs as a lax.scan (TPU: the T-loop is tiny relative to
the matmuls; a chunked associative form is a future optimization).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qtensor import QTensor
from .config import ModelConfig
from .llama import layer_norm


def is_rwkv(cfg: ModelConfig) -> bool:
    return cfg.wkv_head_size > 0


@jax.tree_util.register_pytree_node_class
@dataclass
class RwkvState:
    """Per-layer recurrent state: token-shift rows + wkv matrices."""

    shift: Any  # (L, B, 2, n_embd) f32: [attn x_prev, ffn x_prev]
    wkv: Any    # (L, B, H, D, D) f32

    def tree_flatten(self):
        return (self.shift, self.wkv), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def create(cfg: ModelConfig, batch: int):
        D = cfg.wkv_head_size
        H = cfg.n_embd // D
        return RwkvState(
            jnp.zeros((cfg.n_layer, batch, 2, cfg.n_embd), jnp.float32),
            jnp.zeros((cfg.n_layer, batch, H, D, D), jnp.float32),
        )


def _lora(x, w1, w2, b=None, act=None):
    """w2 @ act(w1 @ x) (+ b) — the rwkv7 low-rank parameterization for
    decay/iclr/v-residual/gate. GGUF orientation: w1 (rank, C), w2 (C, rank)
    (numpy order of ggml {C, rank} / {rank, C})."""
    h = jnp.einsum("btc,rc->btr", x, w1)
    if act is not None:
        h = act(h)
    y = jnp.einsum("btr,cr->btc", h, w2)
    return y if b is None else y + b


def _wkv7_scan(r, w, k, v, a, b, s0, valid):
    """Sequential WKV7 over T. All (B, T, H, D); s0 (B, H, D, D).
    valid (B, T) bool: invalid positions pass state through untouched.
    Returns (out (B, T, H, D), s_final)."""
    def step(s, inp):
        r_t, w_t, k_t, v_t, a_t, b_t, ok = inp  # (B, H, D) / (B,)
        sa = jnp.einsum("bhij,bhj->bhi", s, a_t)           # (B, H, D_i)
        s_new = (s * w_t[:, :, None, :]
                 + v_t[..., None] * k_t[:, :, None, :]
                 + sa[..., None] * b_t[:, :, None, :])
        s = jnp.where(ok[:, None, None, None], s_new, s)
        out = jnp.einsum("bhij,bhj->bhi", s_new, r_t)
        return s, out

    xs = tuple(jnp.moveaxis(t, 1, 0) for t in (r, w, k, v, a, b))
    s, outs = jax.lax.scan(step, s0, xs + (jnp.moveaxis(valid, 1, 0),))
    return jnp.moveaxis(outs, 0, 1), s


def _wkv6_scan(r, w, k, v, u, s0, valid):
    """Sequential WKV6 (ggml_compute_forward_rwkv_wkv6_f32,
    ggml/src/ggml-cpu/ops.cpp): state S (B, H, D_i, D_j) with i the k/r
    channel and j the v channel:

        out[t, j] = sum_i r_i * (u_i * k_i * v_j + S[i, j])
        S[i, j]  <- S[i, j] * w_i + k_i * v_j

    r/w/k/v (B, T, H, D); u (H, D); valid (B, T)."""
    def step(s, inp):
        r_t, w_t, k_t, v_t, ok = inp
        kv = k_t[..., :, None] * v_t[..., None, :]  # (B, H, D_i, D_j)
        out = jnp.einsum("bhij,bhi->bhj", kv * u[None, :, :, None] + s, r_t)
        s_new = s * w_t[..., :, None] + kv
        s = jnp.where(ok[:, None, None, None], s_new, s)
        return s, out

    xs = tuple(jnp.moveaxis(t, 1, 0) for t in (r, w, k, v))
    s, outs = jax.lax.scan(step, s0, xs + (jnp.moveaxis(valid, 1, 0),))
    return jnp.moveaxis(outs, 0, 1), s


def _gla_scan(r, w, k, v, scale, s0, valid):
    """Gated linear attention (ggml_compute_forward_gla_f32): the qrwkv
    (rwkv6qwen2) recurrence — S <- S * w_i + k_i v_j applied BEFORE the
    output read, out[t, j] = sum_i scale * r_i * S'[i, j]."""
    def step(s, inp):
        r_t, w_t, k_t, v_t, ok = inp
        s_new = s * w_t[..., :, None] + k_t[..., :, None] * v_t[..., None, :]
        out = jnp.einsum("bhij,bhi->bhj", s_new, r_t) * scale
        s = jnp.where(ok[:, None, None, None], s_new, s)
        return s, out

    xs = tuple(jnp.moveaxis(t, 1, 0) for t in (r, w, k, v))
    s, outs = jax.lax.scan(step, s0, xs + (jnp.moveaxis(valid, 1, 0),))
    return jnp.moveaxis(outs, 0, 1), s


def _layer6(x, p, qw, li, cfg: ModelConfig, shift, wkv, valid):
    """One rwkv6 / rwkv6qwen2 layer (src/models/rwkv6-base.cpp
    build_rwkv6_time_mix). x (B, T, C) f32. Returns (x_out, shift', wkv')."""
    B, T, C = x.shape
    D = cfg.wkv_head_size
    H = C // D
    eps = cfg.norm_eps or 1e-5
    qrwkv = "tm_first" not in p  # rwkv6qwen2: no bonus term, GLA kernel

    def mm(h, key, bias=None):
        from .llama import _mm

        y = _mm(h, qw[key], jnp.float32, li)
        if bias is not None:
            y = y + bias[None, None]
        return y

    if qrwkv:
        from .llama import rms_norm

        att_n = rms_norm(x, p["attn_norm"], cfg.rms_eps or eps)
    else:
        att_n = layer_norm(x, p["attn_norm"], p.get("attn_norm_b"), eps)
    x_prev = jnp.concatenate([shift[:, 0:1, :], att_n[:, :-1]], axis=1)
    sx = x_prev - att_n

    # dynamic 5-way lerp: tanh(xxx @ w1) -> (5, extra) -> w2[5] -> deltas
    lerp_x = p["tm_lerp_x"].reshape(C)
    xxx = att_n + sx * lerp_x[None, None]
    extra5 = p["tm_w1"].shape[0]
    h = jnp.tanh(jnp.einsum("btc,rc->btr", xxx, p["tm_w1"]))
    h5 = h.reshape(B, T, 5, extra5 // 5)
    w2 = p["tm_w2"].reshape(5, C, extra5 // 5)  # ggml (extra, C, 5) layout
    delta = jnp.einsum("btfe,fce->btfc", h5, w2)  # (B, T, 5, C)
    if "tm_lerp_fused" in p:
        lf = p["tm_lerp_fused"].reshape(5, C)
    else:  # pre-fused checkpoints store w/k/v/r/g lerps individually
        lf = jnp.stack([p[f"tm_lerp_{n}"].reshape(C) for n in "wkvrg"])
    # view order in the reference: w, k, v, r, g
    xw, xk, xv, xr, xg = [
        att_n + sx * (delta[:, :, i] + lf[i][None, None]) for i in range(5)]

    r = mm(xr, "tm_r", p.get("tm_r_b"))
    k = mm(xk, "tm_k", p.get("tm_k_b"))
    v = mm(xv, "tm_v", p.get("tm_v_b"))
    g = mm(xg, "tm_g")
    g = jax.nn.sigmoid(g) if qrwkv else jax.nn.silu(g)

    w = jnp.einsum("btr,cr->btc",
                   jnp.tanh(jnp.einsum("btc,rc->btr", xw, p["tm_decay_w1"])),
                   p["tm_decay_w2"])
    w = jnp.exp(-jnp.exp(w + p["tm_decay"][None, None]))

    # GQA repeat (rwkv6qwen2 stores n_head_kv-sized k/v)
    Hkv = k.shape[-1] // D
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k.reshape(B, T, Hkv, 1, D), rep, axis=3).reshape(B, T, C)
        v = jnp.repeat(v.reshape(B, T, Hkv, 1, D), rep, axis=3).reshape(B, T, C)

    rh = r.reshape(B, T, H, D)
    wh = w.reshape(B, T, H, D)
    vh = v.reshape(B, T, H, D)
    if qrwkv:
        k = k - k * w  # k * (1 - w)
        kh = k.reshape(B, T, H, D)
        out, wkv = _gla_scan(rh, wh, kh, vh, D ** -0.5, wkv, valid)
        cur = out.reshape(B, T, C)
    else:
        kh = k.reshape(B, T, H, D)
        u = p["tm_first"].reshape(H, D)
        out, wkv = _wkv6_scan(rh, wh, kh, vh, u, wkv, valid)
        # per-head group norm + ln (as rwkv7)
        mu = out.mean(-1, keepdims=True)
        var = ((out - mu) ** 2).mean(-1, keepdims=True)
        cur = ((out - mu) * jax.lax.rsqrt(var + 64e-5)).reshape(B, T, C)
        cur = cur * p["tm_ln"][None, None] + p["tm_ln_b"][None, None]
    cur = cur * g
    x = x + mm(cur, "tm_out")

    if qrwkv:
        # qwen2-style gated FFN on rmsnorm (src/models/rwkv6qwen2.cpp)
        from .llama import rms_norm

        h2 = rms_norm(x, p["ffn_norm"], cfg.rms_eps or eps)
        gt = mm(h2, "ffn_gate")
        up = mm(h2, "ffn_up")
        x = x + mm(jax.nn.silu(gt) * up, "ffn_down")
        ffn_n = att_n  # single token-shift row; keep row1 = att row
    else:
        # rwkv6 channel mix: r-gated squared-relu (build_rwkv6_channel_mix)
        ffn_n = layer_norm(x, p["attn_norm_2"], p.get("attn_norm_2_b"), eps)
        f_prev = jnp.concatenate([shift[:, 1:2, :], ffn_n[:, :-1]], axis=1)
        fsx = f_prev - ffn_n
        xk2 = ffn_n + fsx * p["cm_lerp_k"].reshape(C)[None, None]
        xr2 = ffn_n + fsx * p["cm_lerp_r"].reshape(C)[None, None]
        rg = jax.nn.sigmoid(mm(xr2, "cm_r"))
        kf = jnp.square(jax.nn.relu(mm(xk2, "cm_k")))
        x = x + rg * mm(kf, "cm_v")

    idx = jnp.maximum(valid.sum(-1) - 1, 0)
    take = lambda arr: jnp.take_along_axis(
        arr, idx[:, None, None], axis=1)[:, 0]
    new_rows = jnp.stack([take(att_n), take(ffn_n)], axis=1)
    any_valid = valid.any(-1)[:, None, None]
    shift = jnp.where(any_valid, new_rows, shift)
    return x, shift, wkv


def _layer(x, p, qw, li, cfg: ModelConfig, shift, wkv, v_first, valid):
    """One rwkv7 layer. x (B, T, C) f32. Returns (x_out, shift', wkv',
    v_first')."""
    B, T, C = x.shape
    D = cfg.wkv_head_size
    H = C // D
    eps = cfg.norm_eps or 1e-5

    def mm(h, key):
        from .llama import _mm

        return _mm(h, qw[key], jnp.float32, li) if key in qw else None

    # ---- time mix ------------------------------------------------------
    att_n = layer_norm(x, p["attn_norm"], p.get("attn_norm_b"), eps)
    x_prev = jnp.concatenate([shift[:, 0:1, :], att_n[:, :-1]], axis=1)
    sx = x_prev - att_n
    # fused lerp (C, 6): per-channel coefficients for r,w,k,v,a,g
    lf = p["tm_lerp_fused"].reshape(6, C)  # stored (6,1,1,C) -> (6, C)
    xr, xw, xk, xv, xa, xg = [att_n + sx * lf[i][None, None] for i in range(6)]

    r = mm(xr, "tm_r")
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(
        _lora(xw, p["tm_w1"], p["tm_w2"], p["tm_w0"], act=jnp.tanh)))
    k = mm(xk, "tm_k")
    v = mm(xv, "tm_v")
    if v_first is None:
        v_first = v
    else:
        mix = jax.nn.sigmoid(_lora(xv, p["tm_v1"], p["tm_v2"], p["tm_v0"]))
        v = v + (v_first - v) * mix
    g = jnp.einsum("btr,cr->btc",
                   jax.nn.sigmoid(jnp.einsum("btc,rc->btr", xg, p["tm_g1"])),
                   p["tm_g2"])
    a = jax.nn.sigmoid(_lora(xa, p["tm_a1"], p["tm_a2"], p["tm_a0"]))  # iclr

    kk = (k * p["tm_k_k"][None, None]).reshape(B, T, H, D)
    kk = kk / jnp.maximum(jnp.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
    ka = k * p["tm_k_a"][None, None]
    k = k + (a * ka - ka)

    rh = r.reshape(B, T, H, D)
    wh = w.reshape(B, T, H, D)
    kh = k.reshape(B, T, H, D)
    vh = v.reshape(B, T, H, D)
    ah = a.reshape(B, T, H, D)
    out, wkv = _wkv7_scan(rh, wh, kh, vh, -kk, kk * ah, wkv, valid)

    # per-head group norm (ggml_norm over head_size with eps 64e-5)
    mu = out.mean(-1, keepdims=True)
    var = ((out - mu) ** 2).mean(-1, keepdims=True)
    cur = ((out - mu) * jax.lax.rsqrt(var + 64e-5)).reshape(B, T, C)
    cur = cur * p["tm_ln"][None, None] + p["tm_ln_b"][None, None]
    # rk bonus: ((k*r)·r_k per head) * v
    rk = (kh * rh * p["tm_r_k"].reshape(H, D)[None, None]).sum(-1)  # (B,T,H)
    cur = cur + (vh * rk[..., None]).reshape(B, T, C)
    cur = cur * g
    att_out = mm(cur, "tm_out")
    x = x + att_out

    # ---- channel mix ---------------------------------------------------
    ffn_n = layer_norm(x, p["attn_norm_2"], p.get("attn_norm_2_b"), eps)
    f_prev = jnp.concatenate([shift[:, 1:2, :], ffn_n[:, :-1]], axis=1)
    xk2 = ffn_n + (f_prev - ffn_n) * p["cm_lerp_k"].reshape(C)[None, None]
    kf = jnp.square(jax.nn.relu(mm(xk2, "cm_k")))
    x = x + mm(kf, "cm_v")

    # token-shift store: the LAST VALID position's att_n/ffn_n rows
    idx = jnp.maximum(valid.sum(-1) - 1, 0)  # (B,)
    take = lambda arr: jnp.take_along_axis(
        arr, idx[:, None, None], axis=1)[:, 0]
    new_rows = jnp.stack([take(att_n), take(ffn_n)], axis=1)  # (B, 2, C)
    any_valid = valid.any(-1)[:, None, None]
    shift = jnp.where(any_valid, new_rows, shift)
    return x, shift, wkv, v_first


def forward(params, cfg: ModelConfig, tokens, state: RwkvState,
            dtype=jnp.bfloat16, logits_idx=None, n_valid=None,
            return_hidden=False):
    """tokens (B, T) -> (logits f32, new RwkvState).

    n_valid (B,): right-pad lengths (bucketed prefill / inactive decode
    rows); state stops updating after the last valid position. The layer
    math runs in f32 — rwkv's state dynamics are precision-sensitive and
    the reference computes the wkv op in f32 too."""
    B, T = tokens.shape
    v6 = cfg.arch in ("rwkv6", "rwkv6qwen2")
    qrwkv = cfg.arch == "rwkv6qwen2"
    x = params["tok_embd"].take_rows(tokens, jnp.float32)
    eps = cfg.norm_eps or 1e-5
    if "tok_norm" in params:  # rwkv6/rwkv7 LN0; rwkv6qwen2 has none
        x = layer_norm(x, params["tok_norm"], params.get("tok_norm_b"), eps)
    valid = (jnp.arange(T)[None, :] < (n_valid[:, None] if n_valid is not None
                                       else jnp.full((B, 1), T)))

    layers = params["layers"]
    groups = layers.get("__groups__") or [layers]
    new_shift, new_wkv = [], []
    off = 0
    v_first = None
    for gl in groups:
        qw = {k: v for k, v in gl.items() if isinstance(v, QTensor)}
        fl = {k: v for k, v in gl.items() if not isinstance(v, QTensor)}
        L_g = next(iter(gl.values())).shape[0]
        # python loop over layers: v_first threads through all of them and
        # the per-layer T-scan dominates compile anyway at rwkv scale
        for i in range(L_g):
            li = off + i
            p = {k: v[i] for k, v in fl.items()}
            sh = state.shift[li]
            wk = state.wkv[li]
            if v6:
                x, sh, wk = _layer6(x, p, qw, jnp.int32(i), cfg, sh, wk,
                                    valid)
                if (cfg.rescale_every and
                        (li + 1) % cfg.rescale_every == 0):
                    x = x * 0.5
            else:
                x, sh, wk, v_first = _layer(x, p, qw, jnp.int32(i), cfg,
                                            sh, wk, v_first, valid)
            new_shift.append(sh)
            new_wkv.append(wk)
        off += L_g

    new_state = RwkvState(jnp.stack(new_shift), jnp.stack(new_wkv))
    if logits_idx is not None:
        x = jax.lax.dynamic_slice_in_dim(
            x, jnp.asarray(logits_idx, jnp.int32), 1, axis=1)
    if qrwkv:
        from .llama import rms_norm

        x = rms_norm(x, params["output_norm"], cfg.rms_eps or eps)
    else:
        x = layer_norm(x, params["output_norm"], params.get("output_norm_b"),
                       eps)
    hidden = x
    from .llama import _mm

    logits = _mm(x.astype(dtype), params["output"], dtype).astype(jnp.float32)
    if return_hidden:
        return logits, new_state, hidden
    return logits, new_state
