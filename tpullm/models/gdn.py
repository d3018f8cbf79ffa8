"""Gated DeltaNet linear-attention mixer (Qwen3-Next family).

Counterpart of the reference's delta-net builders:
src/models/qwen3next.cpp build_layer_attn_linear (projections, conv,
l2-norms, head repeats, gated output norm) and
src/models/delta-net-base.cpp build_delta_net_autoregressive (the
recurrence itself; the fused GGML_OP_GATED_DELTA_NET op computes the same
update). Per token t and value-head h the state S in R^{Dk x Dv} evolves

    S   <- S * exp(g_t)                          (gated decay)
    d   =  beta_t * (v_t - k_t^T S)              (delta rule)
    S   <- S + k_t d^T
    o_t =  (q_t / sqrt(Dk))^T S

with g_t = ssm_a * softplus(alpha_t + dt_bias), beta_t = sigmoid(b_t),
and q/k l2-normalized per head after a shared causal conv over the
packed [q | k | v] channels (ggml_l2_norm: x / max(||x||, eps)).

TPU mapping: the projections ride the quantized matmul path; the
recurrence is a lax.scan over time whose per-step work is batched
einsums over (B, H) — on decode (T==1) it collapses to one fused update.
The state bank reuses the mamba slot layout (B, d_inner, d_state) so the
hybrid memory module needs no new storage kind.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .llama import _mm, rms_norm


def _l2_norm(x, eps):
    """ggml_l2_norm semantics: x / max(||x||_2, eps) over the last axis."""
    n = jnp.sqrt((x * x).sum(-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def _delta_scan(s0, q, k, v, decay, beta):
    """Gated delta-rule recurrence.

    s0 (B,H,Dv,Dk); q/k (B,T,H,Dk) with q pre-scaled; v (B,T,H,Dv);
    decay/beta (B,T,H). Returns (o (B,T,H,Dv), s_T). State layout
    s[b,h,j,i]: j = value dim, i = key dim — the flattened order matches
    the reference bank [S_v, S_v, H_v, n_seqs] for state save/restore.
    """
    B, T, H, Dk = q.shape

    def step(s, inp):
        qt, kt, vt, dt_, bt = inp
        s = s * dt_[..., None, None]
        ks = jnp.einsum("bhk,bhjk->bhj", kt, s)       # k^T S
        d = (vt - ks) * bt[..., None]                 # beta (v - k^T S)
        s = s + d[..., :, None] * kt[..., None, :]    # S += k d^T (outer)
        o = jnp.einsum("bhk,bhjk->bhj", qt, s)        # q^T S
        return s, o

    if T == 1:
        s, o = step(s0, (q[:, 0], k[:, 0], v[:, 0], decay[:, 0], beta[:, 0]))
        return o[:, None], s

    xs = (q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
          v.transpose(1, 0, 2, 3), decay.transpose(1, 0, 2),
          beta.transpose(1, 0, 2))
    s, o = jax.lax.scan(step, s0, xs)
    return o.transpose(1, 0, 2, 3), s


def _kda_scan(s0, q, k, v, decay, beta):
    """Kimi Delta Attention recurrence: per-KEY-CHANNEL decay
    (ggml_compute_forward_gated_delta_net_one_chunk kda branch,
    ggml/src/ggml-cpu/ops.cpp:10570-10600).

    s0 (B,H,Dv,Dk); q/k (B,T,H,Dk) q pre-scaled; v (B,T,H,Dv);
    decay (B,T,H,Dk) = exp(g); beta (B,T,H)."""
    B, T, H, Dk = q.shape

    def step(s, inp):
        qt, kt, vt, dt_, bt = inp
        s = s * dt_[..., None, :]                     # diag decay over Dk
        ks = jnp.einsum("bhk,bhjk->bhj", kt, s)       # k^T S
        d = (vt - ks) * bt[..., None]
        s = s + d[..., :, None] * kt[..., None, :]
        o = jnp.einsum("bhk,bhjk->bhj", qt, s)
        return s, o

    if T == 1:
        s, o = step(s0, (q[:, 0], k[:, 0], v[:, 0], decay[:, 0], beta[:, 0]))
        return o[:, None], s

    xs = (q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
          v.transpose(1, 0, 2, 3), decay.transpose(1, 0, 2, 3),
          beta.transpose(1, 0, 2))
    s, o = jax.lax.scan(step, s0, xs)
    return o.transpose(1, 0, 2, 3), s


def kda_layer(x, li, p, cfg: ModelConfig, conv_tail, ssm_state, dtype,
              pad_mask=None, n_valid=None):
    """Kimi Delta Attention block (src/models/kimi-linear.cpp:288-375):
    separate q/k/v projections each through its own silu'd causal conv
    (shared 3*d_inner conv state bank, Q|K|V slices), l2-normed q/k,
    per-key-channel decay g1 = ssm_a[h] * softplus(f_b(f_a(h)) + dt_b),
    sigmoid beta per head, delta-rule recurrence, then a SIGMOID-gated
    per-head RMS output norm (g2 = g_b(g_a(h))) and the wo projection."""
    from .mamba import _causal_conv

    B, T, D = x.shape
    hd = cfg.ssm_d_state      # kda.head_dim
    H = cfg.n_head
    Di = H * hd

    h = rms_norm(x, p["attn_norm"][li], cfg.rms_eps)
    z0 = jnp.zeros((Di,), jnp.float32)

    outs, tails = [], []
    for j, (wkey, ckey) in enumerate((("wq", "ssm_conv_q"),
                                      ("wk", "ssm_conv_k"),
                                      ("wv", "ssm_conv_v"))):
        xp = _mm(h, p[wkey], dtype, layer=li)  # (B,T,Di)
        if pad_mask is not None:
            xp = jnp.where(pad_mask[..., None], 0, xp)
        cw = p[ckey][li].reshape(Di, -1)  # (Di, d_conv)
        tail_j = conv_tail[:, j * Di:(j + 1) * Di]
        y, nt = _causal_conv(xp, tail_j, cw, z0, n_valid)
        outs.append(jax.nn.silu(y.astype(jnp.float32)))
        tails.append(nt)
    new_tail = jnp.concatenate(tails, axis=1)

    q = _l2_norm(outs[0].reshape(B, T, H, hd), cfg.rms_eps)
    k = _l2_norm(outs[1].reshape(B, T, H, hd), cfg.rms_eps)
    v = outs[2].reshape(B, T, H, hd)

    # g1: low-rank decay, per (head, channel)
    f = _mm(_mm(h, p["ssm_f_a"], dtype, layer=li), p["ssm_f_b"], dtype,
            layer=li).astype(jnp.float32)  # (B,T,Di)
    g1 = jax.nn.softplus(f + p["ssm_dt_b"][li].astype(jnp.float32))
    g1 = g1.reshape(B, T, H, hd) * p["ssm_a"][li].reshape(H, 1)[None, None]
    decay = jnp.exp(g1)
    beta = jax.nn.sigmoid(
        _mm(h, p["ssm_beta"], dtype, layer=li).astype(jnp.float32))

    if pad_mask is not None:
        decay = jnp.where(pad_mask[..., None, None], 1.0, decay)
        beta = jnp.where(pad_mask[..., None], 0.0, beta)

    q = q * (1.0 / jnp.sqrt(jnp.float32(hd)))
    s0 = ssm_state.reshape(B, H, hd, hd)
    o, s = _kda_scan(s0, q, k, v, decay, beta)

    # sigmoid-gated per-head-dim RMS norm (FusedRMSNormGated w/ sigmoid)
    g2 = _mm(_mm(h, p["ssm_g_a"], dtype, layer=li), p["ssm_g_b"], dtype,
             layer=li).astype(jnp.float32).reshape(B, T, H, hd)
    o = rms_norm(o, p["ssm_norm"][li].astype(jnp.float32), cfg.rms_eps)
    o = (o * jax.nn.sigmoid(g2)).reshape(B, T, Di).astype(dtype)

    out = _mm(o, p["wo"], dtype, layer=li)
    if "cvec" in p:
        out = out + p["cvec"][li].astype(out.dtype)
    return out, new_tail, s.reshape(B, Di, hd)


def gdn_layer(x, li, p, cfg: ModelConfig, conv_tail, ssm_state, dtype,
              pad_mask=None, n_valid=None):
    """One gated-delta-net block on (B,T,D); returns (out, new_tail, new_ssm).

    Weight keys (loader names): wqkv [2*key_dim+value_dim] + wqkv_gate
    (optimized split layout) or ssm_in (legacy interleaved qkvz),
    ssm_conv1d, ssm_dt_b, ssm_a, ssm_ba, ssm_norm, ssm_out. Padded
    positions decay by 1 and write with beta=0, so the state passes
    through untouched (inactive decode slots / left-pad rows).
    """
    from .mamba import _causal_conv

    B, T, D = x.shape
    Dk = cfg.ssm_d_state              # head_k_dim == head_v_dim
    G = cfg.ssm_n_group               # num_k_heads
    H = cfg.ssm_dt_rank               # num_v_heads
    Di = cfg.ssm_d_inner              # H * Dv
    Dv = Di // H
    R = H // G
    key_dim = Dk * G

    h = rms_norm(x, p["attn_norm"][li], cfg.rms_eps)

    if "wqkv_cat" in p:  # optimized layout: packed [q|k|v] + separate gate
        qkv = _mm(h, p["wqkv_cat"], dtype, layer=li)      # (B,T,2*kd+Di)
        z = _mm(h, p["wqkv_gate"], dtype, layer=li)       # (B,T,Di)
    else:  # legacy ssm_in: per-k-head interleave [q|k|v*R|z*R]
        full = _mm(h, p["ssm_in"], dtype, layer=li)
        full = full.reshape(B, T, G, 2 * Dk + 2 * R * Dv)
        qf = full[..., :Dk].reshape(B, T, key_dim)
        kf = full[..., Dk:2 * Dk].reshape(B, T, key_dim)
        vf = full[..., 2 * Dk:2 * Dk + R * Dv].reshape(B, T, Di)
        z = full[..., 2 * Dk + R * Dv:].reshape(B, T, Di)
        qkv = jnp.concatenate([qf, kf, vf], axis=-1)

    # beta / alpha -> sigmoid(b), gated decay g = ssm_a * softplus(a+dt_b)
    tile_heads = "ssm_beta" in p
    if tile_heads:  # qwen35: SEPARATE per-v-head projections
        beta = jax.nn.sigmoid(
            _mm(h, p["ssm_beta"], dtype, layer=li).astype(jnp.float32))
        alpha = _mm(h, p["ssm_alpha"], dtype, layer=li).astype(jnp.float32)
    else:  # qwen3next fused ssm_ba: (B,T,G,2R) interleave
        ba = _mm(h, p["ssm_ba"], dtype, layer=li).astype(jnp.float32)
        ba = ba.reshape(B, T, G, 2 * R)
        beta = jax.nn.sigmoid(ba[..., :R]).reshape(B, T, H)
        alpha = ba[..., R:].reshape(B, T, H)
    g = p["ssm_a"][li].astype(jnp.float32) * jax.nn.softplus(
        alpha + p["ssm_dt_b"][li].astype(jnp.float32))
    decay = jnp.exp(g)

    if pad_mask is not None:
        qkv = jnp.where(pad_mask[..., None], 0, qkv)
        decay = jnp.where(pad_mask[..., None], 1.0, decay)
        beta = jnp.where(pad_mask[..., None], 0.0, beta)

    bias = p["ssm_conv1d_b"][li] if "ssm_conv1d_b" in p else jnp.zeros(
        (qkv.shape[-1],), jnp.float32)
    qkv, new_tail = _causal_conv(qkv, conv_tail, p["ssm_conv1d"][li],
                                 bias, n_valid)
    qkv = jax.nn.silu(qkv.astype(jnp.float32))

    q = _l2_norm(qkv[..., :key_dim].reshape(B, T, G, Dk), cfg.rms_eps)
    k = _l2_norm(qkv[..., key_dim:2 * key_dim].reshape(B, T, G, Dk),
                 cfg.rms_eps)
    v = qkv[..., 2 * key_dim:].reshape(B, T, H, Dv)
    if R > 1:
        if tile_heads:
            # qwen35 uses plain ggml_repeat_4d: cyclic TILE (h = r*G + g,
            # src/models/qwen35.cpp:420-424)
            q = jnp.tile(q, (1, 1, R, 1))
            k = jnp.tile(k, (1, 1, R, 1))
        else:
            # qwen3next repeat-INTERLEAVES (h = g*R + r, the reshape
            # trick at src/models/qwen3next.cpp:520-530)
            q = jnp.repeat(q, R, axis=2)
            k = jnp.repeat(k, R, axis=2)
    q = q * (1.0 / jnp.sqrt(jnp.float32(Dk)))

    s0 = ssm_state.reshape(B, H, Dv, Dk)
    o, s = _delta_scan(s0, q, k, v, decay, beta)

    # gated output norm: rms(o) * silu(z) per value head
    z4 = z.astype(jnp.float32).reshape(B, T, H, Dv)
    o = rms_norm(o, p["ssm_norm"][li].astype(jnp.float32), cfg.rms_eps)
    o = (o * jax.nn.silu(z4)).reshape(B, T, Di).astype(dtype)

    out = _mm(o, p["ssm_out"], dtype, layer=li)
    if "cvec" in p:
        out = out + p["cvec"][li].astype(out.dtype)
    return out, new_tail, s.reshape(B, Di, Dk)
