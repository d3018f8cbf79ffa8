"""MLA (deepseek2-family) graph tests.

The absorbed-MQA evaluation (models/llama.py _attend_mla) must match the
decompressed-MHA algebra: attention over [c_kv; k_pe] with per-head wk_b/wv_b
absorption is mathematically identical to materializing full K/V from
attn_kv_b (src/models/deepseek2.cpp is_mla vs legacy branch). The reference
engine itself runs the legacy branch on these files — see
test_reference_parity-style margin checks there and in PARITY artifacts.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpullm.runtime.engine import InferenceEngine
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_deepseek2_gguf


@pytest.fixture(scope="module")
def ds2(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "ds2.gguf")
    build_deepseek2_gguf(path, seed=7)
    return load_model(path)


def test_config_and_cache_shape(ds2):
    from tpullm.models.llama import KVCache

    cfg, params, _ = ds2
    assert cfg.kv_lora_rank == 64 and cfg.q_lora_rank == 64
    assert cfg.head_dim == 64 and cfg.head_dim_v == 32 and cfg.rope_dim == 16
    cache = KVCache.create(cfg, 1, 32)
    # compressed cache: one MQA head of [c_kv; k_pe] / c_kv
    assert cache.k.shape == (cfg.n_layer, 1, 1, 32, 64 + 16)
    assert cache.v.shape == (cfg.n_layer, 1, 1, 32, 64)


def test_absorbed_matches_decompressed(ds2):
    """Explicitly decompress the cached c_kv through wk_b/wv_b and run plain
    MHA attention — logits must match the absorbed path."""
    cfg, params, _ = ds2
    eng = InferenceEngine(cfg, params, max_seq_len=64,
                          compute_dtype=jnp.float32)
    prompt = [3, 7, 9, 12, 20]
    lg_abs = eng.logits_for([prompt])

    # decompressed oracle: rebuild K/V per position from scratch in numpy
    from tpullm.models.llama import KVCache, forward, rms_norm, rope_cache, apply_rope

    lw = params["layers"]
    T = len(prompt)
    toks = jnp.asarray(np.asarray(prompt, np.int32)[None])
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    x = params["tok_embd"].take_rows(toks, jnp.float32)
    cos, sin = rope_cache(cfg, pos)
    nope = cfg.head_dim - cfg.rope_dim
    H, v, lora = cfg.n_head, cfg.head_dim_v, cfg.kv_lora_rank
    for li in range(cfg.n_layer):
        p = {k: np.asarray(a[li]) for k, a in lw.items()
             if not hasattr(a, "qtype")}
        qw = {k: a for k, a in lw.items() if hasattr(a, "qtype")}

        def mm(h, key):
            w = np.asarray(qw[key].dequant(jnp.float32))[li]
            return h @ w.T

        h = np.asarray(rms_norm(x, jnp.asarray(p["attn_norm"]), cfg.rms_eps))
        ql = mm(h, "wq_a")[..., :cfg.q_lora_rank]
        ql = np.asarray(rms_norm(jnp.asarray(ql), jnp.asarray(p["q_a_norm"]),
                                 cfg.rms_eps))
        q = mm(ql, "wq_b").reshape(1, T, H, cfg.head_dim)
        kvp = mm(h, "wkv_a")
        c_kv = np.asarray(rms_norm(jnp.asarray(kvp[..., :lora]),
                                   jnp.asarray(p["kv_a_norm"]), cfg.rms_eps))
        k_pe = kvp[..., lora:lora + cfg.rope_dim].reshape(1, T, 1, cfg.rope_dim)
        q_pe = np.asarray(apply_rope(jnp.asarray(q[..., nope:]), cos, sin,
                                     cfg.rope_type, cfg.rope_dim))
        k_pe = np.asarray(apply_rope(jnp.asarray(k_pe), cos, sin,
                                     cfg.rope_type, cfg.rope_dim))
        # decompress: full K/V per head from c_kv
        wk_b = p["wk_b"]  # (H, lora, nope)
        wv_b = p["wv_b"]  # (H, v, lora)
        k_nope = np.einsum("btl,hln->bthn", c_kv, wk_b.transpose(0, 1, 2)
                           )  # (1,T,H,? ) -- wk_b maps nope->lora; k = W_k c
        # k_nope[h] = wk_b[h].T @ c  (wk_b is (lora, nope) per head)
        k_nope = np.einsum("btl,hln->bthn", c_kv, wk_b)
        k_full = np.concatenate(
            [k_nope, np.broadcast_to(k_pe, (1, T, H, cfg.rope_dim))], -1)
        v_full = np.einsum("btl,hvl->bthv", c_kv, wv_b)
        qq = np.concatenate([q[..., :nope], q_pe], -1)
        scores = np.einsum("bthd,bshd->bhts", qq, k_full) / np.sqrt(cfg.head_dim)
        mask = np.tril(np.ones((T, T), bool))
        scores = np.where(mask[None, None], scores, -np.inf)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        att = np.einsum("bhts,bshv->bthv", probs, v_full).reshape(1, T, H * v)
        o = mm(att, "wo")
        x = jnp.asarray(np.asarray(x) + o, jnp.float32)
        h2 = np.asarray(rms_norm(x, jnp.asarray(p["ffn_norm"]), cfg.rms_eps))
        g = mm(h2, "ffn_gate") if "ffn_gate" in qw else None
        if g is None:  # fused gateup
            from tpullm.ops.fuse import pad256
            y = mm(h2, "ffn_gateup")
            g = y[..., :cfg.n_ff]
            u = y[..., pad256(cfg.n_ff):pad256(cfg.n_ff) + cfg.n_ff]
        else:
            u = mm(h2, "ffn_up")
        act = (g / (1 + np.exp(-g))) * u
        x = jnp.asarray(np.asarray(x) + mm(act, "ffn_down"), jnp.float32)
    xf = np.asarray(rms_norm(x, params["output_norm"], cfg.rms_eps))
    wout = np.asarray(params["output"].dequant(jnp.float32))
    lg_ref = (xf @ wout.T)[0, -1]

    nmse = float(((lg_abs[0] - lg_ref) ** 2).mean() / (lg_ref ** 2).mean())
    assert nmse < 1e-6, nmse


def test_incremental_equals_full(ds2):
    cfg, params, _ = ds2
    eng = InferenceEngine(cfg, params, max_seq_len=64, compute_dtype=jnp.float32)
    prompt = [5, 2, 9, 14]
    r = eng.generate([prompt], max_new_tokens=6)
    full = prompt + r.tokens[0]
    lg = eng.logits_for([full[:-1]])
    assert int(np.argmax(lg[0])) == r.tokens[0][-1]


def test_q8_kv_cache(ds2):
    """Quantized compressed cache stays close to the bf16 one."""
    cfg, params, _ = ds2
    e1 = InferenceEngine(cfg, params, max_seq_len=64, compute_dtype=jnp.float32)
    e2 = InferenceEngine(cfg, params, max_seq_len=64, compute_dtype=jnp.float32,
                         kv_dtype="q8")
    prompt = [3, 8, 1, 17, 4]
    l1 = e1.logits_for([prompt])
    l2 = e2.logits_for([prompt])
    nmse = float(((l1 - l2) ** 2).mean() / (l1 ** 2).mean())
    assert nmse < 1e-3, nmse
