"""WavTokenizer decoder (vocoder) — the TTS audio head.

Counterpart of src/models/wavtokenizer-dec.cpp (the wavtokenizer-dec arch)
plus the spectrogram -> waveform conversion from tools/tts/tts.cpp
embd_to_audio (:202-283). Pipeline:

    audio codes -> code embeddings -> conv1d(7) -> PosNet (GroupNorm/Swish
    resnet convs + one full-attention block + final GroupNorm) -> LayerNorm
    -> ConvNeXt stack (depthwise conv7 -> LN -> pointwise GELU MLP -> gamma)
    -> LayerNorm -> head to n_fft+2 channels -> exp-magnitude/phase ISTFT
    with Hann overlap-add (n_fft 1280, hop 320, 24 kHz).

TPU-first: the whole decoder is ONE jit over (B=1, T codes) — convolutions
via lax.conv_general_dilated in NWC layout, the irfft as a dense DFT matmul
(n_fft=1280 -> a single (641*2, 1280) matrix on the MXU; frames batch over
rows), overlap-add as a strided scatter-add.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig


def load_wavtokenizer(g, cfg: ModelConfig, device_put=True):
    """GGUF -> params dict (dense f32/bf16 arrays; vocoders ship small)."""
    from ..quant.numpy_impl import dequantize

    def arr(name):
        ti = g.tensors[name]
        raw = g.tensor_data(name)
        n_in = ti.shape[0]
        rows = max(ti.n_elements // max(n_in, 1), 1)
        y = dequantize(raw.reshape(rows, -1), ti.ggml_type)
        return np.asarray(y, np.float32).reshape(ti.np_shape)

    names = set(g.tensors)
    p: dict = {"posnet": [], "convnext": []}
    p["tok_embd"] = arr("token_embd.weight")
    p["conv1d"] = arr("conv1d.weight")        # (C_pos, C_in, 7)
    p["conv1d_b"] = arr("conv1d.bias").reshape(-1)
    p["tok_norm"] = arr("token_embd_norm.weight")
    p["tok_norm_b"] = arr("token_embd_norm.bias")
    i = 0
    while f"posnet.{i}.norm1.weight" in names or \
            f"posnet.{i}.attn_norm.weight" in names:
        q = {}
        for k in ("norm1", "conv1", "norm2", "conv2", "attn_norm", "attn_q",
                  "attn_k", "attn_v", "attn_output"):
            wn, bn = f"posnet.{i}.{k}.weight", f"posnet.{i}.{k}.bias"
            if wn in names:
                q[k] = arr(wn)
                q[k + "_b"] = arr(bn).reshape(-1)
        p["posnet"].append(q)
        i += 1
    # final posnet groupnorm reuses the attn_norm slot at the last index
    # (wavtokenizer-dec.cpp case 5)
    i = 0
    while f"convnext.{i}.dw.weight" in names:
        q = {k: arr(f"convnext.{i}.{k}.weight")
             for k in ("dw", "norm", "pw1", "pw2", "gamma")}
        for k in ("dw", "norm", "pw1", "pw2"):
            q[k + "_b"] = arr(f"convnext.{i}.{k}.bias").reshape(-1)
        p["convnext"].append(q)
        i += 1
    p["output_norm"] = arr("output_norm.weight")
    p["output_norm_b"] = arr("output_norm.bias")
    p["output"] = arr("output.weight")
    p["output_b"] = arr("output.bias").reshape(-1)
    if device_put:
        p = jax.tree_util.tree_map(jnp.asarray, p)
    return p


def _group_norm(x, w, b, n_groups, eps):
    """x (B, T, C): normalize per group over (T x C/G) — exactly
    ggml_group_norm via build_norm's (T,1,C) reshape (llama-graph.cpp:1042)."""
    B, T, C = x.shape
    G = n_groups
    xg = x.reshape(B, T, G, C // G).astype(jnp.float32)
    mu = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    y = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(B, T, C)
    return y * w.reshape(-1) + b.reshape(-1)


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _conv1d(x, w, b, groups=1):
    """x (B, T, Cin), w (Cout, Cin/groups, K) -> (B, T, Cout), SAME pad."""
    k = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)),  # (K, Cin/g, Cout)
        window_strides=(1,), padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups)
    return y + b


def _swish(x):
    xf = x.astype(jnp.float32)
    return xf * jax.nn.sigmoid(xf)


def decode_codes(params, cfg: ModelConfig, codes):
    """codes (B, T) int32 -> head output (B, T, n_embd_out) f32.

    Mirrors the reference graph exactly (wavtokenizer-dec.cpp graph::graph)."""
    eps = cfg.norm_eps or 1e-6
    geps = float(cfg.raw_kv.get(
        f"{cfg.arch}.attention.group_norm_epsilon", 1e-6))
    groups = int(cfg.raw_kv.get(
        f"{cfg.arch}.attention.group_norm_groups", 32))
    x = jnp.take(params["tok_embd"], codes, axis=0)  # (B, T, feat)
    x = _conv1d(x, params["conv1d"], params["conv1d_b"])
    for q in params["posnet"]:
        res = x
        if "conv1" in q:  # resnet block
            h = _group_norm(x, q["norm1"], q["norm1_b"], groups, geps)
            h = _conv1d(_swish(h), q["conv1"], q["conv1_b"])
            h = _group_norm(h, q["norm2"], q["norm2_b"], groups, geps)
            h = _conv1d(_swish(h), q["conv2"], q["conv2_b"])
            x = h + res
        elif "attn_q" in q:  # single-head full attention block
            h = _group_norm(x, q["attn_norm"], q["attn_norm_b"], groups, geps)
            qh = _conv1d(h, q["attn_q"], q["attn_q_b"])
            kh = _conv1d(h, q["attn_k"], q["attn_k_b"])
            vh = _conv1d(h, q["attn_v"], q["attn_v_b"])
            C = qh.shape[-1]
            sc = jnp.einsum("btc,bsc->bts", qh, kh,
                            preferred_element_type=jnp.float32)
            pr = jax.nn.softmax(sc / jnp.sqrt(jnp.float32(C)), axis=-1)
            h = jnp.einsum("bts,bsc->btc", pr.astype(vh.dtype), vh)
            h = _conv1d(h, q["attn_output"], q["attn_output_b"])
            x = h + res
        else:  # final groupnorm (case 5)
            x = _group_norm(x, q["attn_norm"], q["attn_norm_b"], groups, geps)
    x = _layer_norm(x, params["tok_norm"], params["tok_norm_b"], eps)
    for q in params["convnext"]:
        res = x
        C = x.shape[-1]
        h = _conv1d(x, q["dw"].reshape(C, 1, -1), q["dw_b"], groups=C)
        h = _layer_norm(h, q["norm"], q["norm_b"], eps)
        h = jax.nn.gelu(h @ q["pw1"].T + q["pw1_b"], approximate=False)
        h = h @ q["pw2"].T + q["pw2_b"]
        x = h * q["gamma"] + res
    x = _layer_norm(x, params["output_norm"], params["output_norm_b"], eps)
    return x @ params["output"].T + params["output_b"]


def spec_to_audio(embd, n_fft: int = 1280, n_hop: int = 320):
    """Head output (T, n_fft+2) -> waveform ((T-1)*hop + n_fft,) f32.

    tools/tts/tts.cpp embd_to_audio: rows split into log-magnitudes and
    phases per rfft bin, magnitude clamped at 1e2; per-frame irfft (as a
    dense DFT matmul), periodic-Hann windowing, fold overlap-add with the
    squared-window envelope division, edge padding trimmed."""
    embd = np.asarray(embd, np.float32)
    T, n2 = embd.shape
    nb = n2 // 2  # rfft bins = n_fft/2 + 1
    mag = np.minimum(np.exp(embd[:, :nb]), 1e2)
    phi = embd[:, nb:]
    re, im = mag * np.cos(phi), mag * np.sin(phi)
    # irfft via explicit basis: x[j] = (1/N) * sum_k w_k (re_k cos + im_k...)
    spec = re + 1j * im
    frames = np.fft.irfft(spec, n=n_fft, axis=-1)  # (T, n_fft)
    n = np.arange(n_fft, dtype=np.float32)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)  # periodic
    frames = frames * hann
    n_win = n_fft
    n_pad = (n_win - n_hop) // 2
    n_out = (T - 1) * n_hop + n_win
    audio = np.zeros(n_out, np.float32)
    env = np.zeros(n_out, np.float32)
    for l in range(T):  # noqa: E741 (frame index)
        audio[l * n_hop: l * n_hop + n_fft] += frames[l]
        env[l * n_hop: l * n_hop + n_fft] += hann * hann
    audio = audio[n_pad: n_out - n_pad] / np.maximum(env[n_pad: n_out - n_pad],
                                                     1e-8)
    return audio
