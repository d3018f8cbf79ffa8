"""Whisper-style audio encoder + log-mel preprocessing (mtmd audio path).

TPU-native analogue of the reference's tools/mtmd/mtmd-audio.cpp
(preprocessing) + tools/mtmd/models/whisper-enc.cpp (encoder graph). The
mmproj GGUF schema is shared: clip.audio.* KV keys and a.* tensor names
(clip-impl.h:62-70, 154-160), so the same files load in both engines.

Preprocessing (numpy, mtmd_audio_preprocessor_whisper):
- pad: 200-sample reflect front, 30 s zeros + 200 back
- periodic hann(400), hop 160, |FFT|^2 power spectrum (401 bins)
- slaney-scale mel filterbank (area-normalized, fmin 0, fmax sr/2)
- log10 with the 2^-24 floor, whisper clamp to max-8 and (x+4)/4
- split into 3000-frame chunks (the encoder's fixed extent)

Encoder (jit, one program per chunk length):
- conv1d(k=3, pad 1) + gelu_erf; conv1d(k=3, stride 2, pad 1) + gelu_erf
- + position embeddings, pre-LN transformer (q/v biases, no k bias,
  gelu_erf FFN)
- projector: ultravox (stack frames -> rms -> mlp.1 -> swiglu_swapped ->
  rms -> mlp.2) or qwen2a (avg-pool 2 -> post-LN -> fc)
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .clip import _ln, _to_f32
from ..gguf.reader import read_gguf

CHUNK_FRAMES = 3000


# ---------------------------------------------------------------------------
# log-mel preprocessing (mtmd-audio.cpp)

def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    lin = f * (3.0 / 200.0)
    log_step = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        logpart = 15.0 + np.log(np.maximum(f, 1e-30) / 1000.0) / log_step
    return np.where(f < 1000.0, lin, logpart)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    log_step = np.log(6.4) / 27.0
    return np.where(m < 15.0, m / (3.0 / 200.0),
                    1000.0 * np.exp((m - 15.0) * log_step))


def mel_filterbank(n_mel: int, n_fft: int, sr: int, fmin: float = 0.0,
                   fmax: float = -1.0) -> np.ndarray:
    """(n_mel, n_fft//2+1) slaney-scale area-normalized triangles
    (mtmd_audio_cache::fill_mel_filterbank_matrix defaults)."""
    if fmax <= 0:
        fmax = sr / 2.0
    m_lo, m_hi = _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax)
    mel_pts = m_lo + (m_hi - m_lo) * np.arange(n_mel + 2) / (n_mel + 1)
    hz = _mel_to_hz_slaney(mel_pts)
    nb = n_fft // 2 + 1
    f = np.arange(nb) * (sr / n_fft)
    out = np.zeros((n_mel, nb), np.float32)
    for m in range(n_mel):
        fl, fc, fr = hz[m], hz[m + 1], hz[m + 2]
        up = (f - fl) / max(fc - fl, 1e-30)
        dn = (fr - f) / max(fr - fc, 1e-30)
        w = np.clip(np.minimum(up, dn), 0.0, None)
        w[(f < fl) | (f > fr)] = 0.0
        out[m] = w * (2.0 / max(fr - fl, 1e-30))
    return out


def log_mel_whisper(samples: np.ndarray, n_mel: int, sr: int = 16000,
                    n_fft: int = 400, win: int = 400,
                    hop: int = 160) -> list[np.ndarray]:
    """f32 mono samples -> list of (n_mel, 3000) whisper log-mel chunks."""
    samples = np.asarray(samples, np.float32)
    pad2 = n_fft // 2
    if len(samples) < pad2 + 1:
        samples = np.pad(samples, (0, pad2 + 1 - len(samples)))
    padded = np.concatenate([
        samples[1: 1 + pad2][::-1],
        samples,
        np.zeros(sr * 30 + pad2, np.float32),
    ])
    n = len(padded)
    n_frames = 1 + (n - n_fft) // hop if n >= n_fft else 1
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = padded[idx] * _hann_periodic(win)
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=1)) ** 2  # (F, nb)
    fb = mel_filterbank(n_mel, n_fft, sr)
    mel = spec @ fb.T  # (F, n_mel)
    mel = np.log10(np.maximum(mel, 5.960464477539063e-08))
    mel = mel.T  # (n_mel, F)
    # whisper clamp + scale over the WHOLE spectrogram
    mmax = mel.max() - 8.0
    mel = (np.maximum(mel, mmax) + 4.0) / 4.0
    chunks = []
    F = mel.shape[1]
    for off in range(0, F, CHUNK_FRAMES):
        c = mel[:, off: off + CHUNK_FRAMES]
        if c.shape[1] < CHUNK_FRAMES // 100:  # ignore sub-30ms tails
            break
        chunks.append(np.ascontiguousarray(c, np.float32))
    return chunks


def _hann_periodic(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def read_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Minimal RIFF/WAVE reader (PCM16 / PCM32 / float32, any channels ->
    mono f32). The reference links miniaudio; serving needs only wav."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos: pos + 4]
        sz = struct.unpack("<I", data[pos + 4: pos + 8])[0]
        body = data[pos + 8: pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or raw is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_fmt, n_ch, sr, _, _, bits = fmt
    if audio_fmt == 3 or (audio_fmt == 0xFFFE and bits == 32):
        x = np.frombuffer(raw, np.float32)
    elif bits == 16:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif bits == 32:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif bits == 8:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"wav: unsupported bits {bits}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(-1)
    return np.ascontiguousarray(x, np.float32), int(sr)


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return x
    n_out = int(round(len(x) * sr_out / sr_in))
    src = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    i0 = np.clip(src.astype(np.int64), 0, len(x) - 1)
    i1 = np.clip(i0 + 1, 0, len(x) - 1)
    fr = (src - i0).astype(np.float32)
    return (x[i0] * (1 - fr) + x[i1] * fr).astype(np.float32)


# ---------------------------------------------------------------------------
# encoder

@dataclass(frozen=True)
class WhisperConfig:
    proj_type: str = "ultravox"
    n_embd: int = 0
    n_ff: int = 0
    n_layer: int = 0
    n_head: int = 0
    n_mel: int = 80
    stack_factor: int = 8
    proj_dim: int = 0
    eps: float = 1e-5

    def n_output_tokens(self, n_frames: int = CHUNK_FRAMES) -> int:
        n_pos = n_frames // 2
        if self.proj_type == "ultravox":
            stride = self.n_embd * self.stack_factor
            return -(-(n_pos * self.n_embd) // stride)
        if self.proj_type == "qwen2a":
            return n_pos // 2
        return n_pos


def is_audio_mmproj(path: str) -> bool:
    g = read_gguf(path)
    return bool(g.get("clip.has_audio_encoder", False))


def load_audio_mmproj(path: str):
    """mmproj GGUF -> (WhisperConfig, params of f32 arrays, per-layer
    stacked under "blk.")."""
    g = read_gguf(path)
    gv = g.get

    def akey(k, default=None):
        v = gv(f"clip.audio.{k}")
        return default if v is None else v

    proj = str(gv("clip.audio.projector_type",
                  gv("clip.projector_type", "ultravox")))
    cfg = WhisperConfig(
        proj_type=proj,
        n_embd=int(akey("embedding_length")),
        n_ff=int(akey("feed_forward_length")),
        n_layer=int(akey("block_count")),
        n_head=int(akey("attention.head_count")),
        n_mel=int(akey("num_mel_bins", 80)),
        stack_factor=int(akey("projector.stack_factor", 0) or 0),
        proj_dim=int(akey("projection_dim", 0) or 0),
        eps=float(akey("attention.layer_norm_epsilon", 1e-5)),
    )
    p: dict = {}
    for name in g.tensor_names():
        if name.startswith(("a.", "mm.a.", "mm.")):
            p[name] = _to_f32(g, name)
    blocks: dict = {}
    for key in list(p):
        if key.startswith("a.blk."):
            _, _, il, *rest = key.split(".")
            blocks.setdefault(".".join(rest), {})[int(il)] = p.pop(key)
    for k, by_layer in blocks.items():
        p["blk." + k] = np.stack([by_layer[i] for i in range(cfg.n_layer)])
    return cfg, p


def _conv1d(x, w, b, stride: int):
    """x (T, C_in), w (C_out, C_in, k) torch layout, 'same-ish' pad 1."""
    k = w.shape[-1]
    pad = k // 2
    xp = jnp.pad(x, ((pad, pad), (0, 0)))
    T_out = (x.shape[0] + 2 * pad - k) // stride + 1
    # gather k shifted views -> one matmul on the MXU
    cols = [xp[i: i + T_out * stride: stride] for i in range(k)]
    xc = jnp.concatenate(cols, axis=-1)  # (T_out, k*C_in)
    wf = w.transpose(2, 1, 0).reshape(-1, w.shape[0])  # (k*C_in, C_out)
    return xc @ wf + b


def _gelu_erf(x):
    return jax.nn.gelu(x, approximate=False)


def whisper_encode_fn(cfg: WhisperConfig, p: dict):
    """Returns a jittable mel (n_mel, F) -> (n_tokens, proj_dim) encoder."""
    pj = {k: jnp.asarray(v) for k, v in p.items()}
    H = cfg.n_head
    C = cfg.n_embd
    D = C // H
    scale = 1.0 / np.sqrt(D)

    def encode(mel):
        x = mel.T  # (F, n_mel)
        x = _gelu_erf(_conv1d(x, pj["a.conv1d.1.weight"],
                              pj["a.conv1d.1.bias"], 1))
        x = _gelu_erf(_conv1d(x, pj["a.conv1d.2.weight"],
                              pj["a.conv1d.2.bias"], 2))
        n_pos = x.shape[0]
        x = x + pj["a.position_embd.weight"][:n_pos]

        def block(x, w):
            h = _ln(x, w["ln1.weight"], w.get("ln1.bias"), cfg.eps)
            q = (h @ w["attn_q.weight"].T + w["attn_q.bias"]).reshape(
                n_pos, H, D)
            k = (h @ w["attn_k.weight"].T).reshape(n_pos, H, D)
            v = (h @ w["attn_v.weight"].T + w["attn_v.bias"]).reshape(
                n_pos, H, D)
            att = jnp.einsum("qhd,khd->hqk", q, k) * scale
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(n_pos, C)
            x = x + (o @ w["attn_out.weight"].T + w["attn_out.bias"])
            h = _ln(x, w["ln2.weight"], w.get("ln2.bias"), cfg.eps)
            f = _gelu_erf(h @ w["ffn_up.weight"].T + w["ffn_up.bias"])
            return x + (f @ w["ffn_down.weight"].T + w["ffn_down.bias"]), None

        stacked = {k[len("blk."):]: v for k, v in pj.items()
                   if k.startswith("blk.")}
        x, _ = jax.lax.scan(block, x, stacked)

        if cfg.proj_type in ("qwen2a", "voxtral"):
            # avg-pool k=2 over positions (build_vit audio_has_avgpool)
            x = x[: (n_pos // 2) * 2].reshape(n_pos // 2, 2, C).mean(1)
        if "a.post_ln.weight" in pj:
            x = _ln(x, pj["a.post_ln.weight"], pj.get("a.post_ln.bias"),
                    cfg.eps)

        if cfg.proj_type == "ultravox":
            # StackAudioFrames + SwiGLU projector (whisper-enc.cpp:48-75)
            sf = cfg.stack_factor
            total = x.shape[0] * C
            stride = C * sf
            padded = -(-total // stride) * stride
            xf = jnp.pad(x.reshape(-1), (0, padded - total))
            x = xf.reshape(padded // stride, stride)
            ms = (x * x).mean(-1, keepdims=True)
            x = x * jax.lax.rsqrt(ms + 1e-6) * pj["mm.a.norm_pre.weight"]
            x = x @ pj["mm.a.mlp.1.weight"].T
            half = x.shape[-1] // 2
            # swiglu_swapped: the SECOND half is the silu gate
            x = jax.nn.silu(x[:, half:]) * x[:, :half]
            ms = (x * x).mean(-1, keepdims=True)
            x = x * jax.lax.rsqrt(ms + 1e-6) * pj["mm.a.norm_mid.weight"]
            return x @ pj["mm.a.mlp.2.weight"].T
        if cfg.proj_type == "qwen2a":
            return x @ pj["mm.a.fc.weight"].T + pj["mm.a.fc.bias"]
        raise ValueError(f"audio projector {cfg.proj_type!r} unsupported")

    return encode
