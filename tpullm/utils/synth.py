"""Synthetic GGUF model fabrication (tests/bench, no network).

Mirrors the reference's in-memory synthetic-GGUF arch tests
(tests/gguf-model-data.h:11-25): fabricate a structurally valid checkpoint
with random weights at any size/quantization, so graph code and kernels can
be exercised without downloading models.
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter
from ..quant import quantize


def _add_quant_tensor(w: GGUFWriter, name: str, arr: np.ndarray, qtype: GGMLType):
    raw = quantize(arr.astype(np.float32), qtype)
    w.add_tensor(name, raw.tobytes(), qtype, tuple(reversed(arr.shape)))


def build_llama_gguf(
    path: str,
    *,
    arch: str = "llama",
    vocab_size: int = 512,
    n_embd: int = 128,
    n_layer: int = 2,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 256,
    n_ctx: int = 512,
    rope_base: float = 10000.0,
    qtype: GGMLType = GGMLType.Q4_0,
    seed: int = 0,
    scale: float = 0.05,
    tie_embeddings: bool = False,
    with_vocab: bool = False,
) -> str:
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", f"synth-{arch}")
    w.add_uint32(f"{arch}.context_length", n_ctx)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base", rope_base)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if with_vocab:
        toks = ["<unk>", "<s>", "</s>"] + [f"tok{i}" for i in range(vocab_size - 3)]
        w.add_string("tokenizer.ggml.model", "llama")
        w.add_array("tokenizer.ggml.tokens", toks)
        w.add_array("tokenizer.ggml.scores", np.zeros(vocab_size, np.float32))
        w.add_array("tokenizer.ggml.token_type", np.ones(vocab_size, np.int32))

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    _add_quant_tensor(w, "token_embd.weight", rand(vocab_size, n_embd), qtype)
    if not tie_embeddings:
        _add_quant_tensor(w, "output.weight", rand(vocab_size, n_embd), qtype)
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        _add_quant_tensor(w, p + "attn_q.weight", rand(n_head * head_dim, n_embd), qtype)
        _add_quant_tensor(w, p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd), qtype)
        _add_quant_tensor(w, p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd), qtype)
        _add_quant_tensor(w, p + "attn_output.weight", rand(n_embd, n_head * head_dim), qtype)
        _add_quant_tensor(w, p + "ffn_gate.weight", rand(n_ff, n_embd), qtype)
        _add_quant_tensor(w, p + "ffn_up.weight", rand(n_ff, n_embd), qtype)
        _add_quant_tensor(w, p + "ffn_down.weight", rand(n_embd, n_ff), qtype)
    w.write()
    return path
