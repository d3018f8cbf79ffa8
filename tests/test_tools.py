"""Offline tools: quantize policy/roundtrip, perplexity runner, tokenize CLI."""
import json
import math
import sys

import numpy as np
import pytest

from tpullm.gguf.constants import GGMLType
from tpullm.gguf.reader import GGUFFile
from tpullm.utils.synth import build_llama_gguf


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("m") / "tiny-f16.gguf")
    # K-quant blocks are 256 elements, so every matmul n_in must be >=256
    build_llama_gguf(p, vocab_size=256, n_embd=256, n_layer=3, n_head=4,
                     n_head_kv=2, n_ff=256, qtype=GGMLType.F16, with_vocab=True)
    return p


def test_quantize_gguf_roundtrip(tiny_gguf, tmp_path):
    from tpullm.tools.quantize import quantize_gguf

    dst = str(tmp_path / "q4km.gguf")
    stats = quantize_gguf(tiny_gguf, dst, "Q4_K_M", nthread=2)
    assert stats["tensors"] > 0
    assert stats["out_bytes"] < stats["in_bytes"]

    g = GGUFFile(dst)
    # policy: attn_v bumped to Q6_K, output norm stays f32
    assert g.tensors["blk.0.attn_v.weight"].ggml_type == GGMLType.Q6_K
    assert g.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q4_K
    assert g.tensors["output_norm.weight"].ggml_type == GGMLType.F32
    # first half of ffn_down layers bumped
    assert g.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q6_K
    assert g.tensors["blk.2.ffn_down.weight"].ggml_type == GGMLType.Q4_K

    # the requantized model still loads and runs
    from tpullm.runtime.loader import load_model
    from tpullm.runtime.engine import InferenceEngine

    cfg, params, _ = load_model(dst)
    eng = InferenceEngine(cfg, params, max_seq_len=64)
    r = eng.generate([[1, 5, 9]], max_new_tokens=2)
    assert len(r.tokens[0]) >= 1


def test_quantize_error_bounded(tiny_gguf, tmp_path):
    """Requant error vs original f16 weights is within quant-type RMSE."""
    from tpullm.tools.quantize import quantize_gguf
    from tpullm.quant.numpy_impl import dequantize

    dst = str(tmp_path / "q8.gguf")
    quantize_gguf(tiny_gguf, dst, "Q8_0", nthread=2)
    g0, g1 = GGUFFile(tiny_gguf), GGUFFile(dst)
    name = "blk.0.attn_q.weight"
    w0 = dequantize(g0.tensor_data(name).reshape(128, -1), GGMLType.F16)
    w1 = dequantize(g1.tensor_data(name).reshape(128, -1), GGMLType.Q8_0)
    rmse = float(np.sqrt(((w0 - w1) ** 2).mean()))
    assert rmse < 0.002 * float(np.abs(w0).max() + 1)


def test_perplexity_runner(tiny_gguf):
    from tpullm.tools.perplexity import compute_ppl

    text = " ".join(f"tok{i % 20}" for i in range(2000))
    r = compute_ppl(tiny_gguf, text, n_ctx=64, max_chunks=3, progress=False)
    assert r["chunks"] == 3
    assert r["tokens_scored"] > 0
    assert math.isfinite(r["ppl"]) and r["ppl"] > 1.0


def test_kl_divergence_self_is_zero(tiny_gguf, tmp_path):
    from tpullm.tools.perplexity import compute_kl, save_logits

    text = " ".join(f"tok{i % 20}" for i in range(900))
    base = str(tmp_path / "base.npz")
    save_logits(tiny_gguf, text, base, n_ctx=64, max_chunks=2)
    r = compute_kl(tiny_gguf, base, progress=False)
    assert r["tokens"] > 0
    assert r["mean_kl"] < 1e-3, r  # self-KL ~ f16 rounding only
    assert r["top1_agreement"] > 0.99


def test_hellaswag_runner(tiny_gguf):
    from tpullm.tools.perplexity import hellaswag

    tasks = [
        {"ctx": "tok1 tok2", "endings": ["tok3", "tok4 tok5"], "label": 0},
        {"ctx": "tok6", "endings": ["tok7", "tok8"], "label": 1},
    ]
    r = hellaswag(tiny_gguf, tasks, progress=False)
    assert r["tasks"] == 2
    assert 0.0 <= r["accuracy"] <= 1.0


def test_tokenize_cli(tiny_gguf, capsys):
    from tpullm.tools.tokenize import main

    main(["-m", tiny_gguf, "-p", "tok1 tok2", "--ids"])
    out = capsys.readouterr().out
    ids = json.loads(out)
    assert isinstance(ids, list) and len(ids) > 0


def test_gguf_dump_cli(tiny_gguf, capsys):
    from tpullm.tools.gguf_dump import main

    main([tiny_gguf, "--json", "--no-tensors"])
    out = json.loads(capsys.readouterr().out)
    assert out["metadata"]["general.architecture"] == "llama"


def test_gguf_endian_roundtrip(tiny_gguf, tmp_path):
    """LE -> BE -> read back: dequantized weights identical."""
    from tpullm.gguf.reader import GGUFFile
    from tpullm.quant.numpy_impl import dequantize
    from tpullm.tools.gguf_convert_endian import convert
    from tpullm.tools.quantize import quantize_gguf

    q = str(tmp_path / "q.gguf")
    quantize_gguf(tiny_gguf, q, "Q4_K_M", nthread=2)
    be = str(tmp_path / "be.gguf")
    n = convert(q, be, "big")
    assert n > 0
    g0, g1 = GGUFFile(q), GGUFFile(be)
    assert g1.byteorder == ">"
    assert g1.get("llama.embedding_length") == g0.get("llama.embedding_length")
    for name in ("blk.0.attn_q.weight", "blk.0.ffn_down.weight", "output_norm.weight"):
        ti0, ti1 = g0.tensors[name], g1.tensors[name]
        assert ti0.ggml_type == ti1.ggml_type
        n_in = ti0.shape[0]
        rows = ti0.n_elements // n_in
        w0 = dequantize(g0.tensor_data(name).reshape(rows, -1), ti0.ggml_type)
        # reading a BE file on a LE host: reader must un-swap
        w1 = dequantize(g1.tensor_data(name).reshape(rows, -1), ti1.ggml_type)
        np.testing.assert_array_equal(w0, w1)


def test_fit_tool(tiny_gguf):
    from tpullm.tools.fit import fit

    r = fit(tiny_gguf, hbm_gb=16.0, n_slots=2)
    assert r["fits"] is True
    assert r["weight_gb"] > 0
    assert r["suggested_n_ctx"] >= 256
    tight = fit(tiny_gguf, hbm_gb=0.001, n_slots=2)
    assert tight["fits"] is False or tight["suggested_n_ctx"] < 512


def test_override_kv(tiny_gguf):
    from tpullm.runtime.loader import load_model

    cfg, _, _ = load_model(tiny_gguf, device_put=False,
                           override_kv={"llama.rope.freq_base": 123456.0})
    assert cfg.rope_base == 123456.0


def test_eval_callback_tool(tiny_gguf):
    from tpullm.tools.eval_callback import run as ecrun

    rows, out_rms, logits = ecrun(tiny_gguf, "tok1 tok2 tok3")
    assert len(rows) == 3  # n_layer
    assert all(r["attn_in"] > 0 for r in rows)
    assert out_rms > 0


def test_winogrande_and_multiple_choice(tiny_gguf):
    """The scorers must strongly prefer continuations the model itself
    generated (self-consistency; real benchmark accuracy needs real
    weights)."""
    from tpullm.tools.perplexity import multiple_choice, winogrande

    r = winogrande(tiny_gguf, [
        {"sentence": "tok1 tok2 _ tok4", "option1": "tok3",
         "option2": "zq", "answer": 1},
    ], progress=False)
    assert r["tasks"] == 1 and 0.0 <= r["acc"] <= 1.0

    r = multiple_choice(tiny_gguf, [
        {"question": "tok1 tok2", "choices": ["tok3", "tok4"], "answer": 0},
    ], progress=False)
    assert r["tasks"] == 1 and 0.0 <= r["acc"] <= 1.0
