"""GGUF container tests: round-trip via our writer/reader and differential
reads against files produced by the reference gguf-py writer."""
import os

import numpy as np
import pytest

from conftest import ref_gguf
from tpullm.gguf import GGMLType, GGUFWriter, read_gguf
from tpullm.gguf.constants import Keys


def _write_ours(path):
    w = GGUFWriter(str(path), arch="llama")
    w.add_string("general.name", "test-model")
    w.add_uint32("llama.block_count", 2)
    w.add_float32("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_bool("tokenizer.ggml.add_bos_token", True)
    w.add_array("tokenizer.ggml.tokens", ["<s>", "</s>", "hello", "éè"])
    w.add_array("tokenizer.ggml.scores", np.array([0.0, -1.5, 2.25, 3.0], np.float32))
    w.add_array("tokenizer.ggml.token_type", np.array([3, 3, 1, 1], np.int32))
    w.add_tensor("tok_embd.weight", np.arange(64, dtype=np.float32).reshape(4, 16))
    w.add_tensor("blk.0.attn_q.weight", np.ones((8, 16), np.float16))
    raw = np.random.default_rng(0).integers(0, 255, size=(2 * 18,), dtype=np.uint8)
    w.add_tensor("blk.0.q4.weight", raw.tobytes(), GGMLType.Q4_0, (64, 1))
    w.write()


def test_roundtrip_ours(tmp_path):
    p = tmp_path / "t.gguf"
    _write_ours(p)
    g = read_gguf(p)
    assert g.architecture == "llama"
    assert g.get("llama.block_count") == 2
    assert abs(g.get("llama.attention.layer_norm_rms_epsilon") - 1e-5) < 1e-12
    assert g.get("tokenizer.ggml.add_bos_token") is True
    assert g.get("tokenizer.ggml.tokens") == ["<s>", "</s>", "hello", "éè"]
    np.testing.assert_array_equal(
        g.get("tokenizer.ggml.scores"), np.array([0.0, -1.5, 2.25, 3.0], np.float32)
    )
    emb = g.tensor_array("tok_embd.weight")
    np.testing.assert_array_equal(emb, np.arange(64, dtype=np.float32).reshape(4, 16))
    assert g.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.F16
    assert g.tensors["blk.0.q4.weight"].shape == (64, 1)
    assert g.tensor_data("blk.0.q4.weight").shape == (36,)
    g.close()


def test_read_reference_written_file(tmp_path):
    refgguf = ref_gguf()
    p = str(tmp_path / "ref.gguf")
    w = refgguf.GGUFWriter(p, arch="llama")
    w.add_uint32("llama.embedding_length", 128)
    w.add_float32("llama.rope.freq_base", 10000.0)
    w.add_array("tokenizer.ggml.tokens", ["a", "b", "c"])
    data = np.random.default_rng(1).normal(size=(16, 32)).astype(np.float32)
    w.add_tensor("tok_embd.weight", data)
    w.write_header_to_file()
    w.write_kv_data_to_file()
    w.write_tensors_to_file()
    w.close()

    g = read_gguf(p)
    assert g.get("llama.embedding_length") == 128
    assert g.get("llama.rope.freq_base") == 10000.0
    assert g.get("tokenizer.ggml.tokens") == ["a", "b", "c"]
    np.testing.assert_array_equal(g.tensor_array("tok_embd.weight"), data)
    # shape is stored in ne order (reversed numpy)
    assert g.tensors["tok_embd.weight"].shape == (32, 16)
    g.close()


def test_reference_reads_our_file(tmp_path):
    refgguf = ref_gguf()
    from gguf.gguf_reader import GGUFReader

    p = tmp_path / "ours.gguf"
    _write_ours(p)
    r = GGUFReader(str(p))
    names = [t.name for t in r.tensors]
    assert "tok_embd.weight" in names and "blk.0.q4.weight" in names
    fields = r.fields
    assert "llama.block_count" in fields


def test_vocab_fixture_reads():
    path = "/root/reference/models/ggml-vocab-llama-spm.gguf"
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    g = read_gguf(path)
    toks = g.get(Keys.Tokenizer.LIST)
    assert toks is not None and len(toks) == 32000
    assert g.get(Keys.Tokenizer.MODEL) == "llama"
    g.close()


def test_big_endian_roundtrip(tmp_path):
    p = tmp_path / "be.gguf"
    w = GGUFWriter(str(p), arch="llama", byteorder=">")
    w.add_uint32("llama.block_count", 7)
    w.add_tensor("x", np.arange(8, dtype=np.float32))
    w.write()
    g = read_gguf(p)
    assert g.byteorder == ">"
    assert g.get("llama.block_count") == 7
    np.testing.assert_array_equal(g.tensor_array("x"), np.arange(8, dtype=np.float32))
