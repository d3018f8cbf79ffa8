"""HF -> GGUF converter (convert_hf_to_gguf analogue) tests.

Fabricates an HF-format checkpoint (config.json + model.safetensors written
with the converter's own minimal writer + a byte-level BPE tokenizer.json),
converts it, and verifies the GGUF loads and generates in tpullm AND loads
in the reference engine with teacher-forced greedy agreement — the full
mapping (names, dims, rope permute, tokenizer) exercised end to end.
"""
import json
import os
import subprocess

import numpy as np
import pytest
import jax.numpy as jnp

from tpullm.tools.convert_hf import convert, read_safetensors, write_safetensors

REF_BIN = os.environ.get("TPULLM_REF_BIN", "/tmp/refbuild/bin")


def _mk_hf_dir(d: str, seed=5):
    rng = np.random.default_rng(seed)
    n_embd, n_head, n_kv, n_layer, n_ff = 64, 4, 2, 2, 96
    hd = n_embd // n_head
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789") + ["Ġ"]
    vocab = {"<s>": 0, "</s>": 1}
    for c in chars:
        vocab[c] = len(vocab)
    # pad vocab to a multiple of 32 so the embedding rows quantize
    while len(vocab) % 32:
        vocab[f"<pad{len(vocab)}>"] = len(vocab)
    V = len(vocab)
    cfg = {
        "model_type": "llama", "hidden_size": n_embd,
        "num_attention_heads": n_head, "num_key_value_heads": n_kv,
        "num_hidden_layers": n_layer, "intermediate_size": n_ff,
        "vocab_size": V, "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 512, "bos_token_id": 0,
        "eos_token_id": 1,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    with open(os.path.join(d, "tokenizer.json"), "w") as f:
        json.dump({
            "model": {"type": "BPE", "vocab": vocab, "merges": []},
            "added_tokens": [
                {"id": 0, "content": "<s>", "special": True},
                {"id": 1, "content": "</s>", "special": True},
            ],
        }, f)

    def r(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    t = {"model.embed_tokens.weight": r(V, n_embd),
         "model.norm.weight": 1 + r(n_embd),
         "lm_head.weight": r(V, n_embd)}
    for i in range(n_layer):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.weight"] = r(n_head * hd, n_embd)
        t[p + "self_attn.k_proj.weight"] = r(n_kv * hd, n_embd)
        t[p + "self_attn.v_proj.weight"] = r(n_kv * hd, n_embd)
        t[p + "self_attn.o_proj.weight"] = r(n_embd, n_head * hd)
        t[p + "mlp.gate_proj.weight"] = r(n_ff, n_embd)
        t[p + "mlp.up_proj.weight"] = r(n_ff, n_embd)
        t[p + "mlp.down_proj.weight"] = r(n_embd, n_ff)
        t[p + "input_layernorm.weight"] = 1 + r(n_embd)
        t[p + "post_attention_layernorm.weight"] = 1 + r(n_embd)
    write_safetensors(os.path.join(d, "model.safetensors"), t)
    return t


def test_safetensors_roundtrip(tmp_path):
    p = str(tmp_path / "x.safetensors")
    t = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
         "b": np.ones((2, 2), np.float32)}
    write_safetensors(p, t)
    back = read_safetensors(p)
    for k in t:
        np.testing.assert_array_equal(back[k], t[k])


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf"))
    _mk_hf_dir(d)
    out = os.path.join(d, "model.gguf")
    convert(d, out, outtype="f16")
    return out


def test_converted_loads_and_generates(converted):
    from tpullm.runtime.engine import InferenceEngine
    from tpullm.runtime.loader import load_model
    from tpullm.tokenizer import Tokenizer

    cfg, params, g = load_model(converted)
    assert cfg.arch == "llama" and cfg.n_layer == 2
    tok = Tokenizer.from_gguf(g)
    ids = tok.encode("abc", add_special=True)
    eng = InferenceEngine(cfg, params, max_seq_len=64,
                          compute_dtype=jnp.float32)
    r = eng.generate([ids], max_new_tokens=6)
    assert len(r.tokens[0]) == 6


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-completion")),
    reason=f"no reference build at {REF_BIN}")
def test_converted_runs_in_reference(converted):
    """The reference engine must accept the converted file and agree with
    tpullm on greedy continuations (teacher-forced margin check)."""
    import jax

    from tpullm.models.llama import KVCache, forward
    from tpullm.runtime.loader import load_model
    from tpullm.tokenizer import Tokenizer

    out = subprocess.run(
        [os.path.join(REF_BIN, "llama-completion"), "-m", converted,
         "-p", "abc", "-n", "10", "--temp", "0", "--no-warmup", "-t", "1",
         "--verbose"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=300, stdin=subprocess.DEVNULL)
    assert out.returncode == 0, out.stdout[-2000:]
    import re

    segs = re.split(r"n_past = \d+", out.stdout)
    pieces = []
    for s in segs[1:]:
        lines = [ln for ln in s.split("\n")
                 if not re.match(r"^[a-zA-Z_][\w.]*: ", ln)]
        if lines:
            pieces.append(lines[-1])
    pieces = [p for p in pieces if p][:10]
    assert len(pieces) >= 6, out.stdout[-1500:]

    cfg, params, g = load_model(converted)
    tok = Tokenizer.from_gguf(g)
    render = {}
    for i, t in enumerate(tok.vocab.tokens):
        render.setdefault(tok.decode([i]) or t, i)
    c_ids = [render[p] for p in pieces if p in render]
    assert len(c_ids) >= 6, (pieces, list(render)[:10])
    p_ids = tok.encode("abc", add_special=True)
    full = p_ids + c_ids
    toks = jnp.asarray(np.asarray(full, np.int32)[None])
    pos = jnp.arange(len(full), dtype=jnp.int32)[None]
    cache = KVCache.create(cfg, 1, len(full))
    logits, _ = jax.jit(lambda pr, t, po, c: forward(
        pr, cfg, t, po, c, cache_pos=0,
        valid_from=jnp.zeros((1,), jnp.int32), dtype=jnp.float32))(
            params, toks, pos, cache)
    lg = np.asarray(logits[0], np.float32)
    exact = 0
    for p in range(len(p_ids) - 1, len(p_ids) - 1 + len(c_ids)):
        rt = full[p + 1]
        margin = lg[p].max() - lg[p, rt]
        # the synthetic model's logits are near-flat, so greedy picks flip on
        # f16-level ties; the margin bound is the real parity evidence
        assert margin < 0.3, (p, rt, int(lg[p].argmax()), margin)
        exact += int(lg[p].argmax() == rt)
    assert exact >= 0.5 * len(c_ids), (exact, len(c_ids))
