"""mtmd audio: log-mel preprocessing properties, whisper encoder vs an
independent f64 numpy oracle, wav decoding, and the mtmd chunking path."""
import numpy as np
import pytest

from tpullm.multimodal.audio import (CHUNK_FRAMES, WhisperConfig,
                                     load_audio_mmproj, log_mel_whisper,
                                     mel_filterbank, read_wav,
                                     resample_linear, whisper_encode_fn)
from tpullm.utils.synth import build_audio_mmproj_gguf


def test_mel_silence_and_tone():
    sr = 16000
    # silence: after whisper normalization everything collapses to a
    # constant ((max-8 clamp + (x+4)/4) of a flat spectrogram)
    chunks = log_mel_whisper(np.zeros(sr, np.float32), n_mel=16)
    assert len(chunks) >= 1 and chunks[0].shape == (16, CHUNK_FRAMES)
    assert np.allclose(chunks[0], chunks[0].flat[0])
    # a 1 kHz tone concentrates energy in the matching mel band
    t = np.arange(sr * 2) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    mel = log_mel_whisper(tone, n_mel=40)[0]
    live = mel[:, 50:150].mean(1)  # frames well inside the tone
    fb = mel_filterbank(40, 400, sr)
    freqs = np.arange(fb.shape[1]) * sr / 400.0
    centers = (fb * freqs).sum(1) / np.maximum(fb.sum(1), 1e-9)
    assert abs(centers[int(live.argmax())] - 1000.0) < 200.0


def test_wav_roundtrip_and_resample():
    import struct

    sr = 8000
    x = (np.sin(np.arange(800) / 10.0) * 0.5).astype(np.float32)
    pcm = (x * 32767).astype(np.int16).tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    y, got_sr = read_wav(wav)
    assert got_sr == sr and len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=1e-3)
    z = resample_linear(y, sr, 16000)
    assert abs(len(z) - 2 * len(y)) <= 2


@pytest.fixture(scope="module", params=["ultravox", "qwen2a"])
def audio_mmproj(request, tmp_path_factory):
    proj = request.param
    path = str(tmp_path_factory.mktemp("a") / f"{proj}.gguf")
    build_audio_mmproj_gguf(path, proj=proj, seed=11)
    cfg, p = load_audio_mmproj(path)
    return proj, cfg, p


def _gelu(x):
    import math

    # exact erf gelu in f64
    from numpy import vectorize

    def erf(v):
        return math.erf(v)

    return 0.5 * x * (1.0 + np.vectorize(erf)(x / np.sqrt(2.0)))


def _ln64(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _conv64(x, w, b, stride):
    T, Cin = x.shape
    Cout, _, k = w.shape
    pad = k // 2
    xp = np.pad(x, ((pad, pad), (0, 0)))
    T_out = (T + 2 * pad - k) // stride + 1
    out = np.zeros((T_out, Cout))
    for i in range(k):
        out += xp[i: i + T_out * stride: stride] @ w[:, :, i].T
    return out + b


def oracle_encode(cfg, p, mel):
    x = _conv64(mel.T.astype(np.float64), p["a.conv1d.1.weight"],
                p["a.conv1d.1.bias"], 1)
    x = _gelu(x)
    x = _conv64(x, p["a.conv1d.2.weight"], p["a.conv1d.2.bias"], 2)
    x = _gelu(x)
    n_pos = x.shape[0]
    x = x + p["a.position_embd.weight"][:n_pos]
    H, C = cfg.n_head, cfg.n_embd
    D = C // H
    for i in range(cfg.n_layer):
        w = {k[len("blk."):]: v[i] for k, v in p.items()
             if k.startswith("blk.")}
        h = _ln64(x, w["ln1.weight"], w["ln1.bias"], cfg.eps)
        q = (h @ w["attn_q.weight"].T + w["attn_q.bias"]).reshape(n_pos, H, D)
        k_ = (h @ w["attn_k.weight"].T).reshape(n_pos, H, D)
        v = (h @ w["attn_v.weight"].T + w["attn_v.bias"]).reshape(n_pos, H, D)
        att = np.einsum("qhd,khd->hqk", q, k_) / np.sqrt(D)
        att = np.exp(att - att.max(-1, keepdims=True))
        att /= att.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", att, v).reshape(n_pos, C)
        x = x + o @ w["attn_out.weight"].T + w["attn_out.bias"]
        h = _ln64(x, w["ln2.weight"], w["ln2.bias"], cfg.eps)
        f = _gelu(h @ w["ffn_up.weight"].T + w["ffn_up.bias"])
        x = x + f @ w["ffn_down.weight"].T + w["ffn_down.bias"]
    if cfg.proj_type == "qwen2a":
        x = x[: (n_pos // 2) * 2].reshape(n_pos // 2, 2, C).mean(1)
    x = _ln64(x, p["a.post_ln.weight"], p["a.post_ln.bias"], cfg.eps)
    if cfg.proj_type == "ultravox":
        sf = cfg.stack_factor
        total = x.size
        stride = C * sf
        padded = -(-total // stride) * stride
        xf = np.pad(x.reshape(-1), (0, padded - total))
        x = xf.reshape(-1, stride)
        x = x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6) \
            * p["mm.a.norm_pre.weight"]
        x = x @ p["mm.a.mlp.1.weight"].T
        half = x.shape[-1] // 2
        g = x[:, half:]
        x = (g / (1 + np.exp(-g))) * x[:, :half]
        x = x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6) \
            * p["mm.a.norm_mid.weight"]
        return x @ p["mm.a.mlp.2.weight"].T
    return x @ p["mm.a.fc.weight"].T + p["mm.a.fc.bias"]


def test_encoder_matches_f64_oracle(audio_mmproj):
    proj, cfg, p = audio_mmproj
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((cfg.n_mel, 200)).astype(np.float32) * 0.5
    got = np.asarray(whisper_encode_fn(cfg, p)(mel), np.float32)
    want = oracle_encode(cfg, p, mel)
    assert got.shape == want.shape
    denom = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / denom < 3e-3, proj


def test_mtmd_audio_chunking(tmp_path):
    from tpullm.multimodal.mtmd import MtmdContext

    path = str(tmp_path / "a.gguf")
    build_audio_mmproj_gguf(path, proj="ultravox", lm_embd=64, seed=3)
    ctx = MtmdContext(path)
    assert ctx.has_audio and not ctx.has_vision
    samples = np.sin(np.arange(16000) / 5.0).astype(np.float32)
    emb = ctx.encode(("audio", samples))
    assert emb.ndim == 2 and emb.shape[1] == 64
    cfg = ctx.audio_cfg
    # the reference keeps EVERY 3000-frame chunk including the mostly-
    # silent tail produced by the 30 s zero pad (mtmd-audio.cpp split)
    chunks = log_mel_whisper(samples, cfg.n_mel)
    want = sum(cfg.n_output_tokens(c.shape[1]) for c in chunks)
    assert emb.shape[0] == want, (emb.shape, [c.shape for c in chunks])


def test_server_audio_chat():
    """HTTP chat completion with an input_audio wav part (the reference's
    mtmd audio serving path)."""
    import base64
    import json
    import socket
    import struct
    import tempfile
    import urllib.request

    from tpullm.gguf.constants import GGMLType
    from tpullm.runtime.loader import load_model
    from tpullm.server.context import ServerContext
    from tpullm.server.http import serve
    from tpullm.tokenizer import Tokenizer
    from tpullm.utils.synth import build_llama_gguf

    d = tempfile.mkdtemp()
    lm_path = build_llama_gguf(f"{d}/lm.gguf", vocab_size=512, n_embd=128,
                               n_layer=2, n_head=4, n_head_kv=2, n_ff=256,
                               qtype=GGMLType.Q4_0, with_vocab=True)
    mm_path = build_audio_mmproj_gguf(f"{d}/mm.gguf", proj="ultravox",
                                      lm_embd=128, seed=5)
    cfg, params, g = load_model(lm_path)
    tok = Tokenizer.from_gguf(g)
    ctx = ServerContext(cfg, params, tok, n_slots=1, max_seq_len=1024,
                        decode_chunk=4, prefill_chunk=64,
                        mmproj_path=mm_path)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = serve(ctx, "127.0.0.1", port, block=False)
    try:
        sr = 16000
        x = (np.sin(np.arange(sr // 2) / 8.0) * 0.3).astype(np.float32)
        pcm = (x * 32767).astype(np.int16).tobytes()
        wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2,
                                       2, 16)
               + b"data" + struct.pack("<I", len(pcm)) + pcm)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            json.dumps({
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "transcribe: "},
                    {"type": "input_audio", "input_audio": {
                        "data": base64.b64encode(wav).decode(),
                        "format": "wav"}},
                ]}],
                "max_tokens": 4, "temperature": 0,
            }).encode(), {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["message"]["content"]
        assert out["usage"]["prompt_tokens"] > 100  # audio rows counted
    finally:
        srv.shutdown()
        ctx.stop()
