"""Mamba-1 selective-SSM decoder in functional JAX.

Counterpart of the reference's recurrent family (src/models/mamba.cpp +
src/models/mamba-base.cpp build_mamba_layer; scan math per the CPU oracle
ggml_compute_forward_ssm_scan_f32, ggml/src/ggml-cpu/ops.cpp:9520-9570):

    per channel h, state k:
      dt'      = softplus(dt[h])
      state    = state * exp(dt' * A[h,k]) + B[k] * (x[h] * dt')
      y[h]     = sum_k state[k] * C[k]
      y        = (y + D*x) * silu(z);  out = y @ W_out^T

TPU-first: prefill evaluates the whole recurrence with one
``lax.associative_scan`` over time (first-order linear recurrence as a
(decay, increment) monoid — the parallel-scan trick from the Mamba paper's
Annex D, which the reference implements as a custom sequential kernel);
decode is a single fused update. The depthwise causal conv is a width-d_conv
shifted-slice sum, and the recurrent state (conv tail + SSM state) is a
pytree analogous to llama_memory_recurrent (src/llama-memory-recurrent.*).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qtensor import QTensor
from .config import ModelConfig
from .llama import _mm, rms_norm


@jax.tree_util.register_pytree_node_class
@dataclass
class RecurrentState:
    """Per-sequence recurrent bank (llama_memory_recurrent analogue):
    conv (L, B, d_inner, d_conv-1) last inputs, ssm (L, B, d_inner, d_state)."""

    conv: Any
    ssm: Any

    def tree_flatten(self):
        return (self.conv, self.ssm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def create(cfg: ModelConfig, batch: int, dtype=jnp.float32):
        return RecurrentState(
            conv=jnp.zeros((cfg.n_layer, batch, conv_channels(cfg),
                            cfg.ssm_d_conv - 1), dtype),
            ssm=jnp.zeros((cfg.n_layer, batch, cfg.ssm_d_inner,
                           cfg.ssm_d_state), jnp.float32),
        )


def conv_channels(cfg: ModelConfig) -> int:
    """Mamba-2 convolves x, B, and C together (src/models/mamba-base.cpp
    build_mamba2_layer); Mamba-1 convolves only x. Group count > 0 marks
    the mamba-2 layout (hybrids: nemotron-h, granite-hybrid, falcon-h1)."""
    if cfg.arch == "kimi-linear":  # separate Q|K|V conv states
        return 3 * cfg.ssm_d_inner
    if cfg.arch == "mamba2" or cfg.ssm_n_group > 0:
        return cfg.ssm_d_inner + 2 * cfg.ssm_n_group * cfg.ssm_d_state
    return cfg.ssm_d_inner


def _causal_conv(x, conv_tail, w, b, n_valid=None):
    """Depthwise causal conv: x (B,T,Di), conv_tail (B,Di,dc-1),
    w (Di,dc), b (Di,) -> (y (B,T,Di), new_tail).

    n_valid (B,): number of REAL leading positions per row (rest is
    right-pad). The new tail is gathered at the n_valid edge, so trailing
    pads never displace real history (a row with n_valid=0 keeps its tail
    bit-identical — that is what makes inactive decode slots free)."""
    B, T, Di = x.shape
    dc = w.shape[-1]
    xt = jnp.concatenate([conv_tail.transpose(0, 2, 1).astype(x.dtype), x],
                         axis=1)  # (B, dc-1+T, Di)
    y = sum(xt[:, j:j + T, :] * w[:, j].astype(x.dtype) for j in range(dc))
    if dc > 1:
        if n_valid is None:
            new_tail = xt[:, T:, :].transpose(0, 2, 1)
        else:
            idx = n_valid[:, None] + jnp.arange(dc - 1)[None, :]  # (B, dc-1)
            new_tail = jnp.take_along_axis(
                xt, idx[..., None], axis=1).transpose(0, 2, 1)
        new_tail = new_tail.astype(conv_tail.dtype)
    else:
        new_tail = conv_tail
    return y + b.astype(x.dtype), new_tail


def _ssm_scan(s0, x_dt, dA, B_t, C_t):
    """Selective scan: s0 (B,Di,Ds), x_dt (B,T,Di), dA (B,T,Di,Ds),
    B_t/C_t (B,T,Ds) -> (y (B,T,Di), s_T).

    h_t = dA_t * h_{t-1} + (x_dt_t * B_t);  y_t = <h_t, C_t>.
    T == 1 is a single fused update; T > 1 uses the associative first-order
    recurrence scan (O(log T) depth, fully parallel over (B, Di, Ds))."""
    Bn, T, Di = x_dt.shape
    inc = x_dt[..., None] * B_t[:, :, None, :]  # (B,T,Di,Ds)
    if T == 1:
        h = dA[:, 0] * s0 + inc[:, 0]
        y = (h * C_t[:, 0, None, :]).sum(-1)[:, None]
        return y, h

    def combine(a, b):
        (a1, b1), (a2, b2) = a, b
        return a1 * a2, b1 * a2 + b2

    # fold the carried-in state into the first step's increment
    inc = inc.at[:, 0].add(dA[:, 0] * s0)
    decays, states = jax.lax.associative_scan(combine, (dA, inc), axis=1)
    y = (states * C_t[:, :, None, :]).sum(-1)  # (B,T,Di)
    return y, states[:, -1]


def shortconv_layer(x, li, p, cfg: ModelConfig, conv_tail, ssm_state,
                    dtype, pad_mask=None, n_valid=None):
    """LFM2 short-convolution mixer (src/models/lfm2.cpp
    build_shortconv_block): in_proj emits [b | c | x]; the gated product
    b*x runs through a depthwise causal conv of width l_cache (carried
    tail = l_cache-1 inputs), the output is gated by c and projected back.
    Returns (out, new_tail, ssm_state) — the ssm bank passes through
    untouched (no state-space part)."""
    B, T, D = x.shape
    h = rms_norm(x, p["attn_norm"][li], cfg.rms_eps)
    bcx = _mm(h, p["shortconv_in"], dtype, layer=li)  # (B,T,3*D)
    b, c, xs = bcx[..., :D], bcx[..., D:2 * D], bcx[..., 2 * D:3 * D]
    bx = (b.astype(jnp.float32) * xs.astype(jnp.float32)).astype(dtype)
    if pad_mask is not None:
        # padded positions contribute nothing to the conv window
        bx = jnp.where(pad_mask[..., None], 0.0, bx)
    w = p["shortconv_conv"][li]  # (D, l_cache)
    y, new_tail = _causal_conv(bx, conv_tail, w, jnp.zeros((D,), jnp.float32),
                               n_valid)
    y = (c.astype(jnp.float32) * y.astype(jnp.float32)).astype(dtype)
    out = _mm(y, p["shortconv_out"], dtype, layer=li)
    return out, new_tail, ssm_state


def _layer(x, li, p, cfg: ModelConfig, conv_tail, ssm_state, dtype,
           pad_mask=None, n_valid=None):
    """One Mamba block on (B,T,D); returns (out, new_tail, new_ssm).

    pad_mask (B,T) True at padded positions: the conv input is zeroed and
    dt is clamped so softplus(dt)=0 there — the state passes through
    unchanged, which makes a left-padded row identical to starting the
    sequence later (zero conv tail + untouched SSM state). n_valid (B,)
    anchors the conv tail when the padding is on the right."""
    B, T, D = x.shape
    Di, Ds, dtr = cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_dt_rank

    h = rms_norm(x, p["attn_norm"][li], cfg.rms_eps)
    xz = _mm(h, p["ssm_in"], dtype, layer=li)  # (B,T,2*Di)
    xs, z = xz[..., :Di], xz[..., Di:]

    if pad_mask is not None:
        xs = jnp.where(pad_mask[..., None], 0, xs)
    xs, new_tail = _causal_conv(xs, conv_tail, p["ssm_conv1d"][li],
                                p["ssm_conv1d_b"][li], n_valid)
    xs = jax.nn.silu(xs.astype(jnp.float32)).astype(dtype)

    x_db = _mm(xs, p["ssm_x"], dtype, layer=li)  # (B,T,dtr+2*Ds)
    dt, B_t, C_t = (x_db[..., :dtr], x_db[..., dtr:dtr + Ds],
                    x_db[..., dtr + Ds:])
    if cfg.ssm_dt_b_c_rms:  # FalconMamba: weightless RMS on dt/B/C
        dt = rms_norm(dt, jnp.ones((dtr,), jnp.float32), cfg.rms_eps)
        B_t = rms_norm(B_t, jnp.ones((Ds,), jnp.float32), cfg.rms_eps)
        C_t = rms_norm(C_t, jnp.ones((Ds,), jnp.float32), cfg.rms_eps)
    dt = _mm(dt, p["ssm_dt"], dtype, layer=li) + p["ssm_dt_b"][li].astype(dtype)

    dt_sp = jax.nn.softplus(dt.astype(jnp.float32))  # (B,T,Di)
    if pad_mask is not None:  # dt'=0 at pads: exp(0*A)=1, dB*x=0
        dt_sp = jnp.where(pad_mask[..., None], 0.0, dt_sp)
    A = p["ssm_a"][li].astype(jnp.float32)  # (Di,Ds)
    dA = jnp.exp(dt_sp[..., None] * A[None, None])  # (B,T,Di,Ds)
    x_dt = xs.astype(jnp.float32) * dt_sp
    y, new_ssm = _ssm_scan(ssm_state, x_dt, dA,
                           B_t.astype(jnp.float32), C_t.astype(jnp.float32))

    y = y + xs.astype(jnp.float32) * p["ssm_d"][li][None, None]
    y = (y * jax.nn.silu(z.astype(jnp.float32))).astype(dtype)
    out = _mm(y, p["ssm_out"], dtype, layer=li)
    if "cvec" in p:
        out = out + p["cvec"][li].astype(out.dtype)
    return out, new_tail, new_ssm


def _layer_plamo2(x, li, p, cfg: ModelConfig, conv_tail, ssm_state, dtype,
                  pad_mask=None, n_valid=None):
    """PLaMo-2 Mamba layer (src/models/plamo2.cpp build_plamo2_mamba_layer):
    the in-proj emits per-head-interleaved [z|x] blocks, the causal conv
    covers x only (no bias), a post-conv low-rank projection emits [B|C|dt]
    each RMS-normed with its own weight, the decay is a per-head SCALAR
    (ssm_dt_rank == SSM head count, like mamba-2's SSD form), and the
    output is gated by silu(z). Pre-norm only here — the post-mixer norm
    is applied by the hybrid walker (cfg.post_norms sandwich)."""
    B, T, D = x.shape
    Di, Ds = cfg.ssm_d_inner, cfg.ssm_d_state
    nh = cfg.ssm_dt_rank
    hd = Di // nh

    h = rms_norm(x, p["attn_norm"][li], cfg.rms_eps)
    zx = _mm(h, p["ssm_in"], dtype, layer=li)  # (B,T,2*Di)
    # per-head [z(hd) | x(hd)] blocks (plamo2.cpp:292-306 view_4d split)
    zx = zx.reshape(B, T, nh, 2 * hd)
    z = zx[..., :hd].reshape(B, T, Di)
    xs = zx[..., hd:].reshape(B, T, Di)

    if pad_mask is not None:
        xs = jnp.where(pad_mask[..., None], 0, xs)
    xs, new_tail = _causal_conv(xs, conv_tail, p["ssm_conv1d"][li],
                                jnp.zeros((Di,), jnp.float32), n_valid)
    xs = jax.nn.silu(xs.astype(jnp.float32)).astype(dtype)

    bcdt = _mm(xs, p["ssm_x"], dtype, layer=li)  # (B,T,2*Ds+dt_dim)
    B_t = rms_norm(bcdt[..., :Ds], p["ssm_b_norm"][li], cfg.rms_eps)
    C_t = rms_norm(bcdt[..., Ds:2 * Ds], p["ssm_c_norm"][li], cfg.rms_eps)
    dt = rms_norm(bcdt[..., 2 * Ds:], p["ssm_dt_norm"][li], cfg.rms_eps)
    dt = (_mm(dt, p["ssm_dt"], dtype, layer=li)
          + p["ssm_dt_b"][li].astype(dtype))  # (B,T,nh)

    dt_sp = jax.nn.softplus(dt.astype(jnp.float32))
    if pad_mask is not None:  # dt'=0 at pads: state passes through
        dt_sp = jnp.where(pad_mask[..., None], 0.0, dt_sp)
    A = p["ssm_a"][li].reshape(-1).astype(jnp.float32)  # (nh,) scalar decay
    dA_h = jnp.exp(dt_sp * A[None, None])  # (B,T,nh)
    dA = jnp.broadcast_to(jnp.repeat(dA_h, hd, axis=-1)[..., None],
                          (B, T, Di, Ds))
    x_dt = xs.astype(jnp.float32) * jnp.repeat(dt_sp, hd, axis=-1)
    y, new_ssm = _ssm_scan(ssm_state, x_dt, dA,
                           B_t.astype(jnp.float32), C_t.astype(jnp.float32))

    Dv = p["ssm_d"][li].reshape(-1).astype(jnp.float32)  # (nh,)
    y = y + xs.astype(jnp.float32) * jnp.repeat(Dv, hd)[None, None]
    y = (jax.nn.silu(z.astype(jnp.float32)) * y).astype(dtype)
    out = _mm(y, p["ssm_out"], dtype, layer=li)
    if "cvec" in p:
        out = out + p["cvec"][li].astype(out.dtype)
    return out, new_tail, new_ssm


def _layer2(x, li, p, cfg: ModelConfig, conv_tail, ssm_state, dtype,
            pad_mask=None, n_valid=None):
    """Mamba-2 block (build_mamba2_layer): one fused in-proj emits
    [z | xBC | dt]; the conv covers x, B and C; the scan uses a SCALAR decay
    per head (state-space duality form) and a grouped RMS norm before the
    out-projection."""
    B, T, D = x.shape
    Di, Ds, G = cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_n_group
    nh = cfg.ssm_dt_rank  # SSM head count
    hd = Di // nh
    dxbc = Di + 2 * G * Ds

    h = rms_norm(x, p["attn_norm"][li], cfg.rms_eps)
    zxbcdt = _mm(h, p["ssm_in"], dtype, layer=li)  # (B,T,2Di+2GDs+nh)
    z = zxbcdt[..., :Di]
    xbc = zxbcdt[..., Di:Di + dxbc]
    dt = zxbcdt[..., Di + dxbc:]

    if pad_mask is not None:
        xbc = jnp.where(pad_mask[..., None], 0, xbc)
    xbc, new_tail = _causal_conv(xbc, conv_tail, p["ssm_conv1d"][li],
                                 p["ssm_conv1d_b"][li], n_valid)
    xbc = jax.nn.silu(xbc.astype(jnp.float32)).astype(dtype)

    xs = xbc[..., :Di].astype(jnp.float32)
    B_t = xbc[..., Di:Di + G * Ds].astype(jnp.float32).reshape(B, T, G, Ds)
    C_t = xbc[..., Di + G * Ds:].astype(jnp.float32).reshape(B, T, G, Ds)

    dt_sp = jax.nn.softplus(dt.astype(jnp.float32)
                            + p["ssm_dt_b"][li][None, None])  # (B,T,nh)
    if pad_mask is not None:
        dt_sp = jnp.where(pad_mask[..., None], 0.0, dt_sp)
    A = p["ssm_a"][li].reshape(-1).astype(jnp.float32)  # (nh,)
    dA_h = jnp.exp(dt_sp * A[None, None])  # (B,T,nh) scalar per head
    # expand per-head decay/B/C to the flat (Di, Ds) state layout
    rep = nh // max(G, 1)
    dA = jnp.repeat(dA_h, hd, axis=-1)[..., None]  # (B,T,Di,1)
    dA = jnp.broadcast_to(dA, (B, T, Di, Ds))
    Bh = jnp.repeat(B_t, rep, axis=2)  # (B,T,nh,Ds)
    Ch = jnp.repeat(C_t, rep, axis=2)
    Bf = jnp.repeat(Bh, hd, axis=2).reshape(B, T, Di, Ds)
    x_dt = xs * jnp.repeat(dt_sp, hd, axis=-1)  # (B,T,Di)

    # same first-order recurrence as mamba-1, with dA already expanded
    inc = x_dt[..., None] * Bf
    if T == 1:
        hnew = dA[:, 0] * ssm_state + inc[:, 0]
        Cf = jnp.repeat(Ch, hd, axis=2).reshape(B, T, Di, Ds)
        y = (hnew[:, None] * Cf).sum(-1)
        new_ssm = hnew
    else:
        def combine(a, b):
            (a1, b1), (a2, b2) = a, b
            return a1 * a2, b1 * a2 + b2

        inc = inc.at[:, 0].add(dA[:, 0] * ssm_state)
        _, states = jax.lax.associative_scan(combine, (dA, inc), axis=1)
        Cf = jnp.repeat(Ch, hd, axis=2).reshape(B, T, Di, Ds)
        y = (states * Cf).sum(-1)  # (B,T,Di)
        new_ssm = states[:, -1]

    Dh = p["ssm_d"][li].reshape(-1).astype(jnp.float32)  # (nh,)
    y = y + xs * jnp.repeat(Dh, hd)[None, None]
    y = (y * jax.nn.silu(z.astype(jnp.float32)))
    # grouped RMS norm (ssm_norm (G, Di/G))
    yg = y.reshape(B, T, G, Di // G)
    w = p["ssm_norm"][li].astype(jnp.float32)  # (G, Di/G)
    var = jnp.mean(yg * yg, axis=-1, keepdims=True)
    yg = yg * jax.lax.rsqrt(var + cfg.rms_eps) * w[None, None]
    y = yg.reshape(B, T, Di).astype(dtype)
    out = _mm(y, p["ssm_out"], dtype, layer=li)
    if "cvec" in p:
        out = out + p["cvec"][li].astype(out.dtype)
    return out, new_tail, new_ssm


def forward(params, cfg: ModelConfig, tokens, state: RecurrentState,
            dtype=jnp.bfloat16, logits_idx=None, return_hidden=False,
            valid_from=None, n_valid=None):
    """tokens (B,T) int32 -> (logits (B,T',vocab) f32, new RecurrentState).

    valid_from (B,): left-pad lengths — positions before it are masked out
    of the recurrence (see _layer pad_mask). n_valid (B,): real length per
    row for RIGHT-padded input (server prefill buckets / inactive decode
    rows with n_valid=0, whose state passes through untouched)."""
    B, T = tokens.shape
    x = params["tok_embd"].take_rows(tokens, dtype)
    pad_mask = None
    if valid_from is not None:
        pad_mask = jnp.arange(T)[None, :] < valid_from[:, None]
    if n_valid is not None:
        right = jnp.arange(T)[None, :] >= n_valid[:, None]
        pad_mask = right if pad_mask is None else (pad_mask | right)

    layers = params["layers"]
    groups = layers.get("__groups__") or [layers]
    new_conv, new_ssm = [], []
    off = 0
    for p in groups:
        L_g = next(iter(p.values())).shape[0]
        conv_g = jax.lax.dynamic_slice_in_dim(state.conv, off, L_g, 0)
        ssm_g = jax.lax.dynamic_slice_in_dim(state.ssm, off, L_g, 0)

        layer_fn = _layer2 if cfg.arch == "mamba2" else _layer

        def step(x, inp, p=p, layer_fn=layer_fn):
            li, conv_tail, ssm_state = inp
            out, tail, ssm = layer_fn(x, li, p, cfg, conv_tail, ssm_state,
                                      dtype, pad_mask, n_valid)
            return x + out, (tail, ssm)

        x, (tails, ssms) = jax.lax.scan(
            step, x, (jnp.arange(L_g), conv_g, ssm_g))
        new_conv.append(tails)
        new_ssm.append(ssms)
        off += L_g

    def _cat(parts):
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    new_state = RecurrentState(_cat(new_conv), _cat(new_ssm))
    if logits_idx is not None:
        x = jax.lax.dynamic_slice_in_dim(
            x, jnp.asarray(logits_idx, jnp.int32), 1, axis=1)
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    hidden = x
    logits = _mm(x, params["output"], dtype).astype(jnp.float32)
    if return_hidden:
        return logits, new_state, hidden
    return logits, new_state


def is_recurrent(cfg: ModelConfig) -> bool:
    # pure-SSM only; hybrid (Jamba) models route through models/hybrid
    return cfg.ssm_d_conv > 0 and not any(h > 0 for h in cfg.kv_head_pattern)
