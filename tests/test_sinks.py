"""Attention sinks (gpt-oss): softmax denominator correction parity."""
import numpy as np
import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.models.llama import KVCache, attention, forward
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_llama_gguf


def test_attention_sink_math():
    """attention(..., sinks) == manual softmax with a virtual sink logit."""
    rng = np.random.default_rng(0)
    B, T, H, Dk, S = 1, 4, 4, 8, 8
    from tpullm.models.config import ModelConfig

    cfg = ModelConfig(n_head=H, n_head_kv=H, head_dim=Dk, head_dim_v=Dk)
    q = jnp.asarray(rng.standard_normal((B, T, H, Dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, Dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, Dk)), jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(H) * 2.0, jnp.float32)
    q_slots = jnp.arange(T, dtype=jnp.int32)[None] + 4  # causal from slot 4
    kv_pos = jnp.arange(S, dtype=jnp.int32)[None]
    pos = q_slots
    vf = jnp.zeros((B,), jnp.int32)

    kh, vh = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)  # head-major
    out = np.asarray(attention(q, kh, vh, q_slots, kv_pos, pos, vf, cfg,
                               sinks=sinks))

    qn, kn, vn, sk = (np.asarray(q), np.asarray(k), np.asarray(v),
                      np.asarray(sinks))
    scale = 1.0 / np.sqrt(Dk)
    want = np.zeros_like(out)
    for t in range(T):
        for h in range(H):
            logits = (qn[0, t, h] @ kn[0, :, h].T) * scale  # (S,)
            m = np.arange(S) <= t + 4
            logits = np.where(m, logits, -np.inf)
            mx = max(logits.max(), sk[h])
            p = np.exp(logits - mx) * m
            denom = p.sum() + np.exp(sk[h] - mx)
            want[0, t, h] = (p / denom) @ vn[0, :, h]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    # and the sink must actually bite (output differs from plain softmax)
    plain = np.asarray(attention(q, kh, vh, q_slots, kv_pos, pos, vf, cfg))
    assert not np.allclose(out, plain, atol=1e-4)


def test_sinks_model_end_to_end(tmp_path):
    path = str(tmp_path / "s.gguf")
    W = {}
    build_llama_gguf(path, vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                     n_head_kv=2, n_ff=128, qtype=GGMLType.Q8_0,
                     with_sinks=True, scale=0.2,
                     weight_cb=lambda n, a: W.__setitem__(n, a.copy()))
    cfg, params, _ = load_model(path)
    gl = params["layers"]
    gl = gl.get("__groups__", [gl])[0]
    assert "attn_sinks" in gl and gl["attn_sinks"].shape == (2, 4)
    toks = jnp.asarray([[3, 9, 27, 5]], jnp.int32)
    posi = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    cache = KVCache.create(cfg, 1, 8)
    logits, _ = forward(params, cfg, toks, posi, cache, 0,
                        jnp.zeros((1,), jnp.int32), dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
    # sinks change the logits vs the same weights without sinks
    path2 = str(tmp_path / "ns.gguf")
    build_llama_gguf(path2, vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                     n_head_kv=2, n_ff=128, qtype=GGMLType.Q8_0, scale=0.2)
    cfg2, params2, _ = load_model(path2)
    cache = KVCache.create(cfg2, 1, 8)
    logits2, _ = forward(params2, cfg2, toks, posi, cache, 0,
                         jnp.zeros((1,), jnp.int32), dtype=jnp.float32)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2), atol=1e-4)
