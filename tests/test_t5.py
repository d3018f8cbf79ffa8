"""T5 encoder-decoder tests.

The graph is validated against an independent float64 numpy oracle (exact
re-derivation of src/models/t5.cpp semantics: rel-pos buckets, scale-1.0
attention, cross-attention, gelu-gated FFN) — observed logit agreement to
f32 noise and identical argmax ordering. (llama-completion's enc-dec CLI
path terminates immediately on synthetic checkpoints even with
--ignore-eos, so the reference-binary differential used for the other
families isn't applicable here.)
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tpullm.models.llama import KVCache
from tpullm.models import t5 as T
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_t5_gguf


@pytest.fixture(scope="module")
def t5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "t5.gguf")
    build_t5_gguf(path, seed=7)
    return load_model(path)


def test_bucket_function_matches_reference_semantics():
    """Spot-check llama_relative_position_bucket values (graph.cpp:2904)."""
    # bidirectional (encoder): sign occupies the upper half of the buckets
    assert int(T.rel_bucket(jnp.int32(0), jnp.int32(0), 32, True)) == 0
    assert int(T.rel_bucket(jnp.int32(3), jnp.int32(0), 32, True)) == 19
    assert int(T.rel_bucket(jnp.int32(0), jnp.int32(3), 32, True)) == 3
    # large distances hit the log-spaced region, clamped to nb-1
    assert int(T.rel_bucket(jnp.int32(0), jnp.int32(500), 32, True)) == 15
    # causal (decoder): only past distances bucketize
    assert int(T.rel_bucket(jnp.int32(0), jnp.int32(5), 32, False)) == 5
    assert int(T.rel_bucket(jnp.int32(5), jnp.int32(0), 32, False)) == 0


def test_forward_matches_numpy_oracle(t5):
    cfg, params, g = t5
    ids = [4, 5, 6, 56]
    enc = T.encode(params, cfg, jnp.asarray([ids], jnp.int32),
                   jnp.asarray([len(ids)]), dtype=jnp.float32)
    xk, xv = T.cross_kv(params, cfg, enc, dtype=jnp.float32)
    dec_n = next(iter(params["dec_layers"].values())).shape[0]
    cache = KVCache(
        jnp.zeros((dec_n, 1, cfg.n_head_kv, 16, cfg.head_dim), jnp.float32),
        jnp.zeros((dec_n, 1, cfg.n_head_kv, 16, cfg.head_dim_v), jnp.float32))
    lg, _ = T.decode_step(params, cfg, jnp.asarray([[1]], jnp.int32),
                          jnp.asarray([[0]], jnp.int32), cache, xk, xv,
                          jnp.asarray([len(ids)]), 0, dtype=jnp.float32)
    lj = np.asarray(lg)[0, -1]

    def W(d, key, li=0):
        t = d[key]
        return (np.asarray(t.data["w"])[li] if hasattr(t, "data")
                else np.asarray(t)[li])

    def rms(x, w, eps=1e-6):
        v = (np.asarray(x, np.float64) ** 2).mean(-1, keepdims=True)
        return (x / np.sqrt(v + eps)) * w

    def softmax_rows(sc):
        p = np.exp(sc - sc.max(-1, keepdims=True))
        return p / p.sum(-1, keepdims=True)

    def gelu(x):
        return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi)
                                      * (x + 0.044715 * x ** 3)))

    emb = np.asarray(params["tok_embd"].data["w"], np.float64)
    H, D = cfg.n_head, cfg.head_dim
    nb = cfg.n_rel_attn_bkts

    def bucket(kv, q_, bid):
        n = nb // 2 if bid else nb
        rel = kv - q_
        base = n if (bid and rel > 0) else 0
        rel = abs(rel) if bid else -min(rel, 0)
        me = n // 2
        if rel < me:
            return base + rel
        large = me + int(np.floor(np.log(rel / me) * (n - me)
                                  / np.log(128 / me)))
        return base + min(large, n - 1)

    # encoder
    el = params["enc_layers"]
    relb_e = np.asarray(params["enc_rel_b"], np.float64)
    Te = len(ids)
    x = emb[ids]
    for li in range(cfg.n_layer):
        h = rms(x, W(el, "attn_norm", li))
        qh = (h @ W(el, "wq", li).T).reshape(Te, H, D)
        kh = (h @ W(el, "wk", li).T).reshape(Te, H, D)
        vh = (h @ W(el, "wv", li).T).reshape(Te, H, D)
        bias = np.zeros((H, Te, Te))
        for i in range(Te):
            for j in range(Te):
                bias[:, i, j] = relb_e[bucket(j, i, True)]
        p = softmax_rows(np.einsum("thd,shd->hts", qh, kh) + bias)
        x = x + np.einsum("hts,shd->thd", p, vh).reshape(Te, H * D) \
            @ W(el, "wo", li).T
        h2 = rms(x, W(el, "ffn_norm", li))
        x = x + (gelu(h2 @ W(el, "ffn_gate", li).T)
                 * (h2 @ W(el, "ffn_up", li).T)) @ W(el, "ffn_down", li).T
    xe = rms(x, np.asarray(params["enc_output_norm"], np.float64))
    assert np.abs(np.asarray(enc)[0] - xe).max() < 0.05

    # decoder first step
    dl = params["dec_layers"]
    relb_d = np.asarray(params["dec_rel_b"], np.float64)
    x = emb[[1]]
    for li in range(dec_n):
        h = rms(x, W(dl, "attn_norm", li))
        qh = (h @ W(dl, "wq", li).T).reshape(1, H, D)
        kh = (h @ W(dl, "wk", li).T).reshape(1, H, D)
        vh = (h @ W(dl, "wv", li).T).reshape(1, H, D)
        p = softmax_rows(np.einsum("thd,shd->hts", qh, kh)
                         + relb_d[0][:, None, None])
        x = x + np.einsum("hts,shd->thd", p, vh).reshape(1, H * D) \
            @ W(dl, "wo", li).T
        hc = rms(x, W(dl, "cross_norm", li))
        qx = (hc @ W(dl, "wq_x", li).T).reshape(1, H, D)
        kx = (xe @ W(dl, "wk_x", li).T).reshape(-1, H, D)
        vx = (xe @ W(dl, "wv_x", li).T).reshape(-1, H, D)
        px = softmax_rows(np.einsum("thd,shd->hts", qx, kx))
        x = x + np.einsum("hts,shd->thd", px, vx).reshape(1, H * D) \
            @ W(dl, "wo_x", li).T
        h2 = rms(x, W(dl, "ffn_norm", li))
        x = x + (gelu(h2 @ W(dl, "ffn_gate", li).T)
                 * (h2 @ W(dl, "ffn_up", li).T)) @ W(dl, "ffn_down", li).T
    xo = rms(x, np.asarray(params["dec_output_norm"], np.float64))
    lo = (xo @ np.asarray(params["output"].data["w"], np.float64).T)[0]
    assert np.abs(lo - lj).max() < 0.01
    assert list(np.argsort(-lo)[:3]) == list(np.argsort(-lj)[:3])


def test_engine_incremental(t5):
    """T5Engine decode steps must match re-running the decoder on the full
    prefix (cache correctness across steps)."""
    cfg, params, g = t5
    eng = T.T5Engine(cfg, params, max_seq_len=32)
    ids = [4, 5, 6, 56]
    out = eng.generate(ids, max_new_tokens=5)
    assert len(out) == 5 and all(0 <= t < cfg.vocab_size for t in out)

    # full-prefix recompute of the last step
    enc = eng._encode(params, jnp.asarray([ids], jnp.int32),
                      jnp.asarray([len(ids)]))
    xk, xv = eng._cross(params, enc)
    dec_n = next(iter(params["dec_layers"].values())).shape[0]
    cache = KVCache(
        jnp.zeros((dec_n, 1, cfg.n_head_kv, 32, cfg.head_dim), jnp.float32),
        jnp.zeros((dec_n, 1, cfg.n_head_kv, 32, cfg.head_dim_v), jnp.float32))
    seq = [1] + out[:-1]
    lg, _ = T.decode_step(params, cfg, jnp.asarray([seq], jnp.int32),
                          jnp.asarray([list(range(len(seq)))], jnp.int32),
                          cache, xk, xv, jnp.asarray([len(ids)]), 0,
                          dtype=jnp.float32)
    assert int(np.argmax(np.asarray(lg)[0, -1])) == out[-1]
