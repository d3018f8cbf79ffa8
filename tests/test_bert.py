"""BERT encoder: forward parity vs a numpy oracle, pooling, padding, WPM e2e."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpullm.gguf.constants import GGMLType
from tpullm.models.bert import embed_texts, encode, pool
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_bert_gguf


def _np_layernorm(x, w, b, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _np_gelu(x):  # tanh approximation (ggml GELU / jax.nn.gelu default)
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def _np_bert(W, tokens, n_layer, n_head):
    x = W["token_embd.weight"][tokens]  # (T, D)
    x = x + W["token_types.weight"][0]
    x = x + W["position_embd.weight"][: len(tokens)]
    x = _np_layernorm(x, W["token_embd_norm.weight"], W["token_embd_norm.bias"])
    D = x.shape[-1]
    hd = D // n_head
    for i in range(n_layer):
        p = f"blk.{i}."
        q = x @ W[p + "attn_q.weight"].T + W[p + "attn_q.bias"]
        k = x @ W[p + "attn_k.weight"].T + W[p + "attn_k.bias"]
        v = x @ W[p + "attn_v.weight"].T + W[p + "attn_v.bias"]
        T = x.shape[0]
        q = q.reshape(T, n_head, hd).transpose(1, 0, 2)
        k = k.reshape(T, n_head, hd).transpose(1, 0, 2)
        v = v.reshape(T, n_head, hd).transpose(1, 0, 2)
        s = q @ k.transpose(0, 2, 1) / np.sqrt(hd)
        s = np.exp(s - s.max(-1, keepdims=True))
        s /= s.sum(-1, keepdims=True)
        o = (s @ v).transpose(1, 0, 2).reshape(T, D)
        att = o @ W[p + "attn_output.weight"].T + W[p + "attn_output.bias"]
        x = _np_layernorm(x + att, W[p + "attn_output_norm.weight"],
                          W[p + "attn_output_norm.bias"])
        h = _np_gelu(x @ W[p + "ffn_up.weight"].T + W[p + "ffn_up.bias"])
        h = h @ W[p + "ffn_down.weight"].T + W[p + "ffn_down.bias"]
        x = _np_layernorm(x + h, W[p + "layer_output_norm.weight"],
                          W[p + "layer_output_norm.bias"])
    return x


@pytest.fixture(scope="module")
def bert_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bert") / "bert.gguf")
    W = {}
    build_bert_gguf(path, n_embd=64, n_layer=2, n_head=4, n_ff=128,
                    with_cls_head=True, scale=0.2,
                    weight_cb=lambda n, a: W.__setitem__(n, a.copy()))
    cfg, params, _ = load_model(path)
    return cfg, params, W


def test_bert_config(bert_model):
    cfg, _, _ = bert_model
    assert cfg.arch == "bert" and not cfg.causal
    assert cfg.pooling_type == "cls"
    assert cfg.norm_type == "layernorm" and not cfg.ffn_gate


def test_bert_forward_matches_numpy(bert_model):
    cfg, params, W = bert_model
    toks = np.array([2, 10, 17, 33, 41, 3], np.int32)
    ref = _np_bert(W, toks, cfg.n_layer, cfg.n_head)
    got = encode(params, cfg, jnp.asarray(toks[None]),
                 jnp.asarray([len(toks)]), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-4, atol=2e-4)


def test_bert_padding_invariance(bert_model):
    cfg, params, _ = bert_model
    toks = [2, 10, 17, 33, 3]
    a = np.zeros((1, 8), np.int32)
    b = np.zeros((1, 16), np.int32)
    a[0, :5] = toks
    b[0, :5] = toks
    n = jnp.asarray([5])
    va = embed_texts(params, cfg, jnp.asarray(a), n, "mean", jnp.float32)
    vb = embed_texts(params, cfg, jnp.asarray(b), n, "mean", jnp.float32)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(va), axis=-1), 1.0, rtol=1e-5)


def test_bert_pooling_variants(bert_model):
    cfg, params, W = bert_model
    toks = np.array([[2, 10, 17, 3, 0, 0]], np.int32)
    n = jnp.asarray([4])
    hidden = encode(params, cfg, jnp.asarray(toks), n, dtype=jnp.float32)
    h = np.asarray(hidden, np.float64)
    cls = np.asarray(pool(hidden, n, cfg, params, "cls"))
    last = np.asarray(pool(hidden, n, cfg, params, "last"))
    mean = np.asarray(pool(hidden, n, cfg, params, "mean"))
    np.testing.assert_allclose(cls, h[:, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(last, h[:, 3], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mean, h[:, :4].mean(1), rtol=1e-5, atol=1e-6)
    # rank: tanh classification head then 1-dim projection
    rank = np.asarray(pool(hidden, n, cfg, params, "rank"))
    want = np.tanh(h[:, 0] @ W["cls.weight"].T + W["cls.bias"])
    want = want @ W["cls.output.weight"].T + W["cls.output.bias"]
    np.testing.assert_allclose(rank, want, rtol=1e-4, atol=1e-5)
    assert rank.shape == (1, 1)


def test_bert_quantized_runs(tmp_path):
    path = str(tmp_path / "bq.gguf")
    build_bert_gguf(path, n_embd=64, n_layer=1, n_head=4, n_ff=128,
                    qtype=GGMLType.Q8_0, scale=0.2)
    cfg, params, _ = load_model(path)
    toks = jnp.asarray([[2, 9, 3, 0]], jnp.int32)
    v = embed_texts(params, cfg, toks, jnp.asarray([3]), "mean")
    assert np.isfinite(np.asarray(v)).all()


def test_bert_wpm_end_to_end(tmp_path):
    from tpullm.tokenizer import Tokenizer
    path = str(tmp_path / "b.gguf")
    build_bert_gguf(path, n_embd=64, n_layer=1, n_head=4, n_ff=128)
    cfg, params, g = load_model(path)
    tok = Tokenizer.from_gguf(g)
    ids = tok.encode("ab cd", add_special=True)
    assert ids[0] == 2 and ids[-1] == 3  # CLS ... SEP
    assert 1 not in ids  # no UNK: '▁a'+'b' style pieces exist
    arr = np.zeros((1, 8), np.int32)
    arr[0, : len(ids)] = ids
    v = embed_texts(params, cfg, jnp.asarray(arr), jnp.asarray([len(ids)]))
    assert v.shape == (1, cfg.n_embd)


def test_bert_server_embeddings_and_rerank(tmp_path):
    import json
    import socket
    import urllib.request

    from tpullm.server.context import ServerContext
    from tpullm.server.http import serve
    from tpullm.tokenizer import Tokenizer

    path = str(tmp_path / "srv.gguf")
    build_bert_gguf(path, n_embd=64, n_layer=1, n_head=4, n_ff=128,
                    with_cls_head=True, scale=0.2)
    cfg, params, g = load_model(path)
    tok = Tokenizer.from_gguf(g)
    ctx = ServerContext(cfg, params, tok, n_slots=1, max_seq_len=64,
                        model_name="bert-tiny")
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = serve(ctx, "127.0.0.1", port, block=False)
    try:
        def post(p, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{p}", json.dumps(body).encode(),
                {"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        out = post("/v1/embeddings", {"input": ["ab cd", "xyz"]})
        assert len(out["data"]) == 2
        v0 = np.asarray(out["data"][0]["embedding"])
        assert v0.shape == (cfg.n_embd,)
        np.testing.assert_allclose(np.linalg.norm(v0), 1.0, rtol=1e-3)

        rr = post("/rerank", {"query": "ab", "documents": ["ab ab", "zq"],
                              "return_text": True})
        assert len(rr["results"]) == 2
        assert {r["index"] for r in rr["results"]} == {0, 1}
        assert rr["results"][0]["relevance_score"] >= rr["results"][1]["relevance_score"]
        assert all("text" in r for r in rr["results"])
    finally:
        srv.shutdown()
        ctx.stop()
