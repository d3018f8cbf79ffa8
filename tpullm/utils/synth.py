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


def random_payload(qtype: GGMLType, rows: int, n: int, rng, scale: float = 0.02) -> np.ndarray:
    """Structurally valid random quantized payload — instant synthesis of
    arbitrarily large weights (perf benches don't need trained values).

    Quant bytes are uniform random; fp16 scale fields are overwritten with
    small positive finite values so dequantized magnitudes resemble weights.
    """
    from ..gguf.constants import GGML_QUANT_SIZES

    if qtype in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        w = rng.normal(0, scale, size=(rows, n)).astype(np.float32)
        from ..quant import quantize

        return quantize(w, qtype)
    blk, bs = GGML_QUANT_SIZES[qtype]
    assert n % blk == 0
    nb = n // blk
    raw = rng.integers(0, 256, size=(rows, nb, bs), dtype=np.uint8)
    f16_offs = {
        GGMLType.Q4_0: [0], GGMLType.Q4_1: [0, 2], GGMLType.Q5_0: [0],
        GGMLType.Q5_1: [0, 2], GGMLType.Q8_0: [0], GGMLType.IQ4_NL: [0],
        GGMLType.IQ4_XS: [0], GGMLType.Q4_K: [0, 2], GGMLType.Q5_K: [0, 2],
        GGMLType.Q6_K: [208], GGMLType.Q3_K: [108], GGMLType.Q2_K: [80, 82],
        GGMLType.TQ2_0: [64], GGMLType.TQ1_0: [52],
    }
    d = (scale * (0.5 + rng.random((rows, nb), np.float32))).astype(np.float16)
    u16 = d.view(np.uint16)
    for off in f16_offs.get(qtype, []):
        raw[..., off] = (u16 & 0xFF).astype(np.uint8)
        raw[..., off + 1] = (u16 >> 8).astype(np.uint8)
    if qtype == GGMLType.MXFP4:
        raw[..., 0] = 121  # e8m0 ~ 2^-7
    return raw.reshape(rows, nb * bs)


def synth_qparams(
    *,
    vocab_size: int,
    n_embd: int,
    n_layer: int,
    n_head: int,
    n_head_kv: int,
    n_ff: int,
    qtype: GGMLType = GGMLType.Q4_K,
    seed: int = 0,
    device_put: bool = True,
    fuse: bool = False,
):
    """Directly fabricate a device params pytree (bypasses GGUF; used by
    bench/dryrun to build multi-GiB models in seconds)."""
    import jax.numpy as jnp

    from ..ops.qtensor import QTensor, qtensor_from_bytes

    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head

    def qt(rows, cols):
        raw = random_payload(qtype, rows, cols, rng)
        return qtensor_from_bytes(raw.reshape(-1), qtype, (rows, cols), device_put)

    def stack(make, n):
        items = [make() for _ in range(n)]
        t0 = items[0]
        data = {k: np.stack([np.asarray(t.data[k]) for t in items]) for k in t0.data}
        if device_put:
            data = {k: jnp.asarray(v) for k, v in data.items()}
        return QTensor(t0.qtype, (n,) + t0.shape, data)

    def norm(n_):
        w = np.ones((n_layer, n_), np.float32)
        return jnp.asarray(w) if device_put else w

    params = {
        "tok_embd": qt(vocab_size, n_embd),
        "output": qt(vocab_size, n_embd),
        "output_norm": (jnp.ones(n_embd, jnp.float32) if device_put else np.ones(n_embd, np.float32)),
        "layers": {
            "attn_norm": norm(n_embd),
            "ffn_norm": norm(n_embd),
            "wq": stack(lambda: _host_qt(qtype, n_head * head_dim, n_embd, rng), n_layer),
            "wk": stack(lambda: _host_qt(qtype, n_head_kv * head_dim, n_embd, rng), n_layer),
            "wv": stack(lambda: _host_qt(qtype, n_head_kv * head_dim, n_embd, rng), n_layer),
            "wo": stack(lambda: _host_qt(qtype, n_embd, n_head * head_dim, rng), n_layer),
            "ffn_gate": stack(lambda: _host_qt(qtype, n_ff, n_embd, rng), n_layer),
            "ffn_up": stack(lambda: _host_qt(qtype, n_ff, n_embd, rng), n_layer),
            "ffn_down": stack(lambda: _host_qt(qtype, n_embd, n_ff, rng), n_layer),
        },
    }
    from ..models.config import ModelConfig

    cfg = ModelConfig(
        arch="llama", vocab_size=vocab_size, n_embd=n_embd, n_layer=n_layer,
        n_head=n_head, n_head_kv=n_head_kv, head_dim=head_dim, head_dim_v=head_dim,
        n_ff=n_ff, rope_dim=head_dim,
    )
    if fuse:
        from ..ops.fuse import fuse_layer_weights

        params["layers"] = fuse_layer_weights(params["layers"])
    return cfg, params


def synth_kmajor_q4k_fast(
    *,
    vocab_size: int,
    n_embd: int,
    n_layer: int,
    n_head: int,
    n_head_kv: int,
    n_ff: int,
    seed: int = 0,
    device_put: bool = True,
):
    """Fabricate an ALREADY-FUSED Q4_K kmajor params pytree directly at the
    kernel-layout level — no GGUF bytes, no planar->kmajor repack, no
    per-layer stacking copies. Weight VALUES are random (throughput does not
    depend on them, bench.py docstring), but every plane has the exact
    dtype/shape/range pack_kmajor + fuse_layer_weights would produce, so the
    fused kernels, take_rows and the parity check all run unchanged.

    Cuts the 8B bench fabrication from ~7 min (quantize+repack+npz) to ~15 s
    of host numpy + one device upload."""
    import jax.numpy as jnp

    from ..ops.fuse import pad256
    from ..ops.qtensor import QTensor
    from ..quant.kmajor import KM_SPECS, dstore_for

    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    spec = KM_SPECS[GGMLType.Q4_K]

    def planes(lead, npad, K):
        """kmajor Q4_K data dict for a (lead..., Npad, K) weight."""
        ds = dstore_for(spec, K)
        shp = lambda rows: lead + (rows, npad)
        d = (rng.random(shp(K // ds), np.float32) + 0.5) * 2e-4
        dmin = (rng.random(shp(K // ds), np.float32) + 0.5) * 2e-4
        out = {
            "q": rng.integers(0, 256, shp(K // 2), dtype=np.uint8),
            "d": d.astype(np.float32),
            "s8": rng.integers(1, 64, shp(K // spec.gs)).astype(np.int8),
            "m8": rng.integers(0, 64, shp(K // spec.gs)).astype(np.int8),
            "dmin": dmin.astype(np.float32),
        }
        if device_put:
            out = {k: jnp.asarray(v) for k, v in out.items()}
        return out

    def qt(parts, K, lead=()):
        npad = sum(pad256(p) for p in parts)
        return QTensor(GGMLType.Q4_K, lead + (npad, K), planes(lead, npad, K))

    L = (n_layer,)
    nq, nkv = n_head * head_dim, n_head_kv * head_dim
    ones = lambda *s: (jnp.ones(s, jnp.float32) if device_put
                       else np.ones(s, np.float32))
    params = {
        "tok_embd": qt([vocab_size], n_embd),
        "output": qt([vocab_size], n_embd),
        "output_norm": ones(n_embd),
        "layers": {
            "attn_norm": ones(n_layer, n_embd),
            "ffn_norm": ones(n_layer, n_embd),
            "wqkv": qt([nq, nkv, nkv], n_embd, L),
            "wo": qt([n_embd], nq, L),
            "ffn_gateup": qt([n_ff, n_ff], n_embd, L),
            "ffn_down": qt([n_embd], n_ff, L),
        },
    }
    from ..models.config import ModelConfig

    cfg = ModelConfig(
        arch="llama", vocab_size=vocab_size, n_embd=n_embd, n_layer=n_layer,
        n_head=n_head, n_head_kv=n_head_kv, head_dim=head_dim,
        head_dim_v=head_dim, n_ff=n_ff, rope_dim=head_dim,
    )
    return cfg, params


def _host_qt(qtype, rows, cols, rng):
    from ..ops.qtensor import qtensor_from_bytes

    raw = random_payload(qtype, rows, cols, rng)
    return qtensor_from_bytes(raw.reshape(-1), qtype, (rows, cols), device_put=False)


def add_spm_toy_vocab(w: GGUFWriter, vocab_size: int) -> None:
    """Usable SPM-style toy vocab: single-char pieces make any ASCII text
    tokenizable (and round-trippable); "▁tokN" word pieces exercise the
    merge path; the tail is filler ids (with FIM markers for infill)."""
    chars = ["▁"] + list("abcdefghijklmnopqrstuvwxyz0123456789.,!?" '{}[]":_-')
    n_words = max(0, min((vocab_size - 3 - len(chars)) // 2, 200))
    toks = ["<unk>", "<s>", "</s>"] + chars + [f"▁tok{i}" for i in range(n_words)]
    toks += [f"<fill{i}>" for i in range(vocab_size - len(toks))]
    scores = np.zeros(vocab_size, np.float32)
    # word pieces score higher than chars so merges prefer them
    scores[3 + len(chars): 3 + len(chars) + n_words] = 1.0
    w.add_string("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", toks)
    w.add_array("tokenizer.ggml.scores", scores)
    w.add_array("tokenizer.ggml.token_type", np.ones(vocab_size, np.int32))
    if vocab_size >= 8:  # FIM markers on the filler tail (infill tests)
        w.add_uint32("tokenizer.ggml.fim_pre_token_id", vocab_size - 3)
        w.add_uint32("tokenizer.ggml.fim_suf_token_id", vocab_size - 2)
        w.add_uint32("tokenizer.ggml.fim_mid_token_id", vocab_size - 1)


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
    n_expert: int = 0,
    n_expert_used: int = 0,
    fused_qkv: bool = False,  # write attn_qkv.weight (phi/gptneox style)
    with_sinks: bool = False,  # write per-head attn_sinks.weight (gpt-oss)
    combined_gateup: bool = False,  # write [gate;up] as one ffn_up.weight
    weight_cb=None,  # hook(name, array) to capture the exact float weights
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
    if n_expert:
        w.add_uint32(f"{arch}.expert_count", n_expert)
        w.add_uint32(f"{arch}.expert_used_count", n_expert_used or 2)
    if with_vocab:
        add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def addq(name, arr):
        if weight_cb:
            weight_cb(name, arr)
        _add_quant_tensor(w, name, arr, qtype)

    _add_quant_tensor(w, "token_embd.weight", rand(vocab_size, n_embd), qtype)
    if not tie_embeddings:
        _add_quant_tensor(w, "output.weight", rand(vocab_size, n_embd), qtype)
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        if fused_qkv:
            addq(p + "attn_qkv.weight",
                 rand((n_head + 2 * n_head_kv) * head_dim, n_embd))
        else:
            addq(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
            addq(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd))
        addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
        if with_sinks:
            sk = rand(n_head) * 4.0
            if weight_cb:
                weight_cb(p + "attn_sinks.weight", sk)
            w.add_tensor(p + "attn_sinks.weight", sk)
        if n_expert:
            w.add_tensor(p + "ffn_gate_inp.weight", rand(n_expert, n_embd))
            _add_quant_tensor(w, p + "ffn_gate_exps.weight", rand(n_expert, n_ff, n_embd), qtype)
            _add_quant_tensor(w, p + "ffn_up_exps.weight", rand(n_expert, n_ff, n_embd), qtype)
            _add_quant_tensor(w, p + "ffn_down_exps.weight", rand(n_expert, n_embd, n_ff), qtype)
        elif combined_gateup:
            addq(p + "ffn_up.weight", rand(2 * n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
        else:
            addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
    w.write()
    return path


def build_bert_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_ff: int = 128,
    n_ctx: int = 64,
    pooling: int = 2,  # LLAMA_POOLING_TYPE_CLS
    with_cls_head: bool = False,
    n_cls_out: int = 1,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
    weight_cb=None,
) -> str:
    """Synthetic BERT-arch GGUF (tensor names per src/models/bert.cpp
    load_arch_tensors + reference arch table)."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    arch = "bert"
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-bert")
    w.add_uint32(f"{arch}.context_length", n_ctx)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv", n_head)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_float32(f"{arch}.attention.layer_norm_epsilon", 1e-12)
    w.add_bool(f"{arch}.attention.causal", False)
    w.add_uint32(f"{arch}.pooling_type", pooling)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    # WPM toy vocab: chars + a few words, SPM-style storage ('▁hello', 'lo')
    chars = ["▁" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
    conts = list("abcdefghijklmnopqrstuvwxyz")
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + chars + conts
    toks += [f"unused{i}" for i in range(vocab_size - len(toks))]
    ttypes = [3, 2, 3, 3, 3] + [1] * (vocab_size - 5)
    w.add_string("tokenizer.ggml.model", "bert")
    w.add_array("tokenizer.ggml.tokens", toks[:vocab_size])
    w.add_array("tokenizer.ggml.token_type", np.asarray(ttypes[:vocab_size], np.int32))
    w.add_uint32("tokenizer.ggml.token_type_count", 2)
    w.add_uint32("tokenizer.ggml.unknown_token_id", 1)
    w.add_uint32("tokenizer.ggml.cls_token_id", 2)
    w.add_uint32("tokenizer.ggml.seperator_token_id", 3)
    w.add_uint32("tokenizer.ggml.padding_token_id", 0)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        if weight_cb:
            weight_cb(name, arr)
        w.add_tensor(name, arr)

    def addq(name, arr):
        if weight_cb:
            weight_cb(name, arr)
        _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    add("token_types.weight", rand(2, n_embd))
    add("position_embd.weight", rand(n_ctx, n_embd))
    add("token_embd_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    add("token_embd_norm.bias", rand(n_embd))
    if with_cls_head:
        add("cls.weight", rand(n_embd, n_embd))
        add("cls.bias", rand(n_embd))
        add("cls.output.weight", rand(n_cls_out, n_embd))
        add("cls.output.bias", rand(n_cls_out))
    for i in range(n_layer):
        p = f"blk.{i}."
        addq(p + "attn_q.weight", rand(n_embd, n_embd))
        add(p + "attn_q.bias", rand(n_embd))
        addq(p + "attn_k.weight", rand(n_embd, n_embd))
        add(p + "attn_k.bias", rand(n_embd))
        addq(p + "attn_v.weight", rand(n_embd, n_embd))
        add(p + "attn_v.bias", rand(n_embd))
        addq(p + "attn_output.weight", rand(n_embd, n_embd))
        add(p + "attn_output.bias", rand(n_embd))
        add(p + "attn_output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        add(p + "attn_output_norm.bias", rand(n_embd))
        addq(p + "ffn_up.weight", rand(n_ff, n_embd))
        add(p + "ffn_up.bias", rand(n_ff))
        addq(p + "ffn_down.weight", rand(n_embd, n_ff))
        add(p + "ffn_down.bias", rand(n_embd))
        add(p + "layer_output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        add(p + "layer_output_norm.bias", rand(n_embd))
    w.write()
    return path


def build_wavtokenizer_gguf(
    path: str,
    *,
    vocab_size: int = 64,   # audio codebook size
    n_feat: int = 32,       # code embedding width (features_length)
    n_pos: int = 32,        # posnet width
    n_cnx: int = 32,        # convnext width
    n_ff: int = 48,
    n_out: int = 18,        # n_fft/2+1 bins x2 (n_fft=16 for the test)
    n_convnext: int = 2,
    groups: int = 4,
    seed: int = 0,
    scale: float = 0.05,
) -> str:
    """Synthetic wavtokenizer-dec checkpoint: the exact tensor set of
    src/models/wavtokenizer-dec.cpp load_arch_tensors (posnet layers
    0,1=resnet 2=attention 3,4=resnet 5=groupnorm + a ConvNeXt stack)."""
    arch = "wavtokenizer-dec"
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-wavtok")
    w.add_uint32(f"{arch}.context_length", 8192)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    w.add_uint32(f"{arch}.features_length", n_feat)
    w.add_uint32(f"{arch}.embedding_length", n_out)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.block_count", 6)
    w.add_uint32(f"{arch}.attention.head_count", 1)
    w.add_float32(f"{arch}.attention.layer_norm_epsilon", 1e-6)
    w.add_float32(f"{arch}.attention.group_norm_epsilon", 1e-6)
    w.add_uint32(f"{arch}.attention.group_norm_groups", groups)
    w.add_uint32(f"{arch}.posnet.embedding_length", n_pos)
    w.add_uint32(f"{arch}.posnet.block_count", 6)
    w.add_uint32(f"{arch}.convnext.embedding_length", n_cnx)
    w.add_uint32(f"{arch}.convnext.block_count", n_convnext)
    add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def ones_r(*shape):
        return (np.ones(shape) + rng.normal(0, scale, size=shape)).astype(np.float32)

    w.add_tensor("token_embd.weight", rand(vocab_size, n_feat))
    w.add_tensor("conv1d.weight", rand(n_pos, n_feat, 7))
    w.add_tensor("conv1d.bias", rand(1, n_pos))
    for i in range(6):
        p = f"posnet.{i}."
        if i in (0, 1, 3, 4):
            w.add_tensor(p + "norm1.weight", ones_r(1, n_pos))
            w.add_tensor(p + "norm1.bias", rand(1, n_pos))
            w.add_tensor(p + "conv1.weight", rand(n_pos, n_pos, 3))
            w.add_tensor(p + "conv1.bias", rand(1, n_pos))
            w.add_tensor(p + "norm2.weight", ones_r(1, n_pos))
            w.add_tensor(p + "norm2.bias", rand(1, n_pos))
            w.add_tensor(p + "conv2.weight", rand(n_pos, n_pos, 3))
            w.add_tensor(p + "conv2.bias", rand(1, n_pos))
        elif i == 2:
            w.add_tensor(p + "attn_norm.weight", ones_r(1, n_pos))
            w.add_tensor(p + "attn_norm.bias", rand(1, n_pos))
            for t in ("attn_q", "attn_k", "attn_v", "attn_output"):
                w.add_tensor(p + t + ".weight", rand(n_pos, n_pos, 1))
                w.add_tensor(p + t + ".bias", rand(1, n_pos))
        else:  # final groupnorm reuses the attn_norm slot
            w.add_tensor(p + "attn_norm.weight", ones_r(1, n_pos))
            w.add_tensor(p + "attn_norm.bias", rand(1, n_pos))
    w.add_tensor("token_embd_norm.weight", ones_r(n_pos))
    w.add_tensor("token_embd_norm.bias", rand(n_pos))
    for i in range(n_convnext):
        p = f"convnext.{i}."
        w.add_tensor(p + "dw.weight", rand(n_cnx, 1, 7))
        w.add_tensor(p + "dw.bias", rand(1, n_cnx))
        w.add_tensor(p + "norm.weight", ones_r(n_cnx))
        w.add_tensor(p + "norm.bias", rand(n_cnx))
        w.add_tensor(p + "pw1.weight", rand(n_ff, n_cnx))
        w.add_tensor(p + "pw1.bias", rand(n_ff))
        w.add_tensor(p + "pw2.weight", rand(n_cnx, n_ff))
        w.add_tensor(p + "pw2.bias", rand(n_cnx))
        w.add_tensor(p + "gamma.weight", ones_r(n_cnx))
    w.add_tensor("output_norm.weight", ones_r(n_cnx))
    w.add_tensor("output_norm.bias", rand(n_cnx))
    w.add_tensor("output.weight", rand(n_out, n_cnx))
    w.add_tensor("output.bias", rand(n_out))
    w.write()
    return path


def build_lfm2_gguf(
    path: str,
    arch: str = "lfm2",
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    pattern: str = "ccac",  # c = shortconv mixer, a = attention
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 96,
    l_cache: int = 3,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
) -> str:
    """Synthetic LFM2(-MoE) checkpoint: per-layer kinds 'c' (short-conv
    mixer) / 'a' (qk-normed roped attention), FFN on every layer; the
    final norm ships under the historical token_embd_norm name
    (src/models/lfm2.cpp load_arch_tensors, llama-arch.cpp:347)."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    n_layer = len(pattern)
    moe = arch == "lfm2moe"
    dense_lead = 1 if moe else n_layer
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", f"synth-{arch}")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray([n_head_kv if k == "a" else 0 for k in pattern],
                           np.uint32))
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.shortconv.l_cache", l_cache)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if moe:
        w.add_uint32(f"{arch}.expert_count", 4)
        w.add_uint32(f"{arch}.expert_used_count", 2)
        w.add_uint32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_uint32(f"{arch}.leading_dense_block_count", dense_lead)
        w.add_uint32(f"{arch}.expert_gating_func", 2)
    add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def addq(name, arr):
        _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    w.add_tensor("token_embd_norm.weight",
                 np.ones(n_embd, np.float32) + rand(n_embd))
    for i, kind in enumerate(pattern):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight",
                     np.ones(n_embd, np.float32) + rand(n_embd))
        w.add_tensor(p + "ffn_norm.weight",
                     np.ones(n_embd, np.float32) + rand(n_embd))
        if kind == "a":
            w.add_tensor(p + "attn_q_norm.weight",
                         np.ones(head_dim, np.float32) + rand(head_dim))
            w.add_tensor(p + "attn_k_norm.weight",
                         np.ones(head_dim, np.float32) + rand(head_dim))
            addq(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
            addq(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
        else:
            w.add_tensor(p + "shortconv.conv.weight", rand(n_embd, l_cache))
            addq(p + "shortconv.in_proj.weight", rand(3 * n_embd, n_embd))
            addq(p + "shortconv.out_proj.weight", rand(n_embd, n_embd))
        if moe and i >= dense_lead:
            w.add_tensor(p + "ffn_gate_inp.weight", rand(4, n_embd))
            w.add_tensor(p + "exp_probs_b.bias", rand(4))
            _add_quant_tensor(w, p + "ffn_gate_exps.weight",
                              rand(4, n_ff, n_embd), qtype)
            _add_quant_tensor(w, p + "ffn_up_exps.weight",
                              rand(4, n_ff, n_embd), qtype)
            _add_quant_tensor(w, p + "ffn_down_exps.weight",
                              rand(4, n_embd, n_ff), qtype)
        else:
            addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
    w.write()
    return path


def build_encoder_gguf(
    path: str,
    arch: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_layer: int = 3,
    n_head: int = 4,
    n_head_kv: int = 4,
    n_ff: int = 96,
    n_ctx: int = 64,
    pooling: int = 1,  # mean
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
) -> str:
    """Synthetic encoder checkpoint for the bert FAMILY variants — each
    arch gets exactly the tensor set its reference load_arch_tensors
    declares (src/models/{nomic-bert,jina-bert-v2,jina-bert-v3,modern-bert,
    neo-bert,eurobert,gemma-embedding}.cpp)."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    postln = arch in ("nomic-bert", "nomic-bert-moe", "jina-bert-v2",
                      "jina-bert-v3")
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
    w.add_float32(f"{arch}.attention.layer_norm_epsilon", 1e-12)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_bool(f"{arch}.attention.causal", False)
    w.add_uint32(f"{arch}.pooling_type", pooling)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    if arch == "nomic-bert-moe":
        w.add_uint32(f"{arch}.moe_every_n_layers", 2)
        w.add_uint32(f"{arch}.expert_count", 4)
        w.add_uint32(f"{arch}.expert_used_count", 2)
    if arch in ("modern-bert", "gemma-embedding"):
        w.add_uint32(f"{arch}.attention.sliding_window", 16)
        w.add_uint32(f"{arch}.attention.sliding_window_pattern",
                     3 if arch == "modern-bert" else 2)
        w.add_float32(f"{arch}.rope.freq_base_swa", 5000.0)
    add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def addq(name, arr):
        _add_quant_tensor(w, name, arr, qtype)

    def add_norm(name, n, bias=postln):
        w.add_tensor(name + ".weight", np.ones(n, np.float32) + rand(n))
        if bias:
            w.add_tensor(name + ".bias", rand(n))

    addq("token_embd.weight", rand(vocab_size, n_embd))
    if postln:
        if arch != "jina-bert-v3":
            w.add_tensor("token_types.weight", rand(2, n_embd))
        add_norm("token_embd_norm", n_embd)
    elif arch == "modern-bert":
        add_norm("token_embd_norm", n_embd, bias=False)
    if not postln:
        name = ("enc.output_norm" if arch == "neo-bert" else "output_norm")
        add_norm(name, n_embd, bias=False)
    nkv = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        if arch == "modern-bert":
            if i != 0:
                add_norm(p + "attn_norm", n_embd, bias=False)
            addq(p + "attn_qkv.weight", rand(n_embd + 2 * nkv, n_embd))
            addq(p + "attn_output.weight", rand(n_embd, n_embd))
            add_norm(p + "ffn_norm", n_embd, bias=False)
            addq(p + "ffn_up.weight", rand(2 * n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
            continue
        if not postln:  # neo-bert / eurobert / gemma-embedding
            add_norm(p + "attn_norm", n_embd, bias=False)
            addq(p + "attn_q.weight", rand(n_embd, n_embd))
            addq(p + "attn_k.weight", rand(nkv, n_embd))
            addq(p + "attn_v.weight", rand(nkv, n_embd))
            addq(p + "attn_output.weight", rand(n_embd, n_embd))
            if arch == "gemma-embedding":
                add_norm(p + "attn_q_norm", head_dim, bias=False)
                add_norm(p + "attn_k_norm", head_dim, bias=False)
                add_norm(p + "post_attention_norm", n_embd, bias=False)
                add_norm(p + "post_ffw_norm", n_embd, bias=False)
            add_norm(p + "ffn_norm", n_embd, bias=False)
            if arch == "neo-bert":
                addq(p + "ffn_up.weight", rand(2 * n_ff, n_embd))
            else:
                addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
                addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
            continue
        # post-LN family (nomic / jina)
        addq(p + "attn_q.weight", rand(n_embd, n_embd))
        addq(p + "attn_k.weight", rand(nkv, n_embd))
        addq(p + "attn_v.weight", rand(nkv, n_embd))
        if arch == "jina-bert-v2":
            w.add_tensor(p + "attn_q.bias", rand(n_embd))
            w.add_tensor(p + "attn_k.bias", rand(nkv))
            w.add_tensor(p + "attn_v.bias", rand(nkv))
            add_norm(p + "attn_q_norm", n_embd)
            add_norm(p + "attn_k_norm", nkv)
        addq(p + "attn_output.weight", rand(n_embd, n_embd))
        if arch in ("jina-bert-v2", "jina-bert-v3"):
            w.add_tensor(p + "attn_output.bias", rand(n_embd))
        add_norm(p + "attn_output_norm", n_embd)
        if arch == "nomic-bert-moe" and i % 2 == 1:
            w.add_tensor(p + "ffn_gate_inp.weight", rand(4, n_embd))
            _add_quant_tensor(w, p + "ffn_up_exps.weight",
                              rand(4, n_ff, n_embd), qtype)
            _add_quant_tensor(w, p + "ffn_down_exps.weight",
                              rand(4, n_embd, n_ff), qtype)
        elif arch == "jina-bert-v2":
            addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            w.add_tensor(p + "ffn_up.bias", rand(n_ff))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
            w.add_tensor(p + "ffn_down.bias", rand(n_embd))
        elif arch in ("jina-bert-v3", "nomic-bert-moe"):
            # bert-style ungated GELU with biases
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            w.add_tensor(p + "ffn_up.bias", rand(n_ff))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
            w.add_tensor(p + "ffn_down.bias", rand(n_embd))
        else:  # nomic-bert: gated SILU, no biases
            addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
        add_norm(p + "layer_output_norm", n_embd)
    w.write()
    return path


def build_mamba_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_layer: int = 2,
    d_state: int = 16,
    d_conv: int = 4,
    dt_rank: int = 0,  # 0 -> ceil(n_embd/16) (the HF convention)
    n_ctx: int = 1024,
    dt_b_c_rms: bool = False,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
    with_vocab: bool = False,
    weight_cb=None,
) -> str:
    """Synthetic Mamba-1 GGUF (tensor names per src/models/mamba.cpp
    load_arch_tensors; d_inner = 2*n_embd, the only supported expansion)."""
    rng = np.random.default_rng(seed)
    d_inner = 2 * n_embd
    dt_rank = dt_rank or max(1, (n_embd + 15) // 16)
    arch = "mamba"
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-mamba")
    w.add_uint32(f"{arch}.context_length", n_ctx)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", 0)
    w.add_uint32(f"{arch}.attention.head_count", 0)
    w.add_uint32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_uint32(f"{arch}.ssm.inner_size", d_inner)
    w.add_uint32(f"{arch}.ssm.state_size", d_state)
    w.add_uint32(f"{arch}.ssm.time_step_rank", dt_rank)
    if dt_b_c_rms:
        w.add_bool(f"{arch}.ssm.dt_b_c_rms", True)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if with_vocab:
        add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        if weight_cb:
            weight_cb(name, arr)
        w.add_tensor(name, arr)

    def addq(name, arr):
        if weight_cb:
            weight_cb(name, arr)
        from ..gguf.constants import GGML_QUANT_SIZES

        blk = GGML_QUANT_SIZES.get(qtype, (1, 0))[0]
        if arr.shape[-1] % max(blk, 1):  # too-narrow rows stay f32
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    add("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i in range(n_layer):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        addq(p + "ssm_in.weight", rand(2 * d_inner, n_embd))
        add(p + "ssm_conv1d.weight", rand(d_inner, d_conv))
        add(p + "ssm_conv1d.bias", rand(d_inner))
        addq(p + "ssm_x.weight", rand(dt_rank + 2 * d_state, d_inner))
        addq(p + "ssm_dt.weight", rand(d_inner, dt_rank))
        add(p + "ssm_dt.bias", rand(d_inner) + 0.5)  # keep dt in a sane range
        # A_log convention: A = -exp(A_log) < 0 keeps the recurrence stable;
        # GGUF stores A directly (converter applies -exp at conversion time)
        add(p + "ssm_a", -np.exp(rand(d_inner, d_state)))
        add(p + "ssm_d", np.ones(d_inner, np.float32) + rand(d_inner))
        addq(p + "ssm_out.weight", rand(n_embd, d_inner))
    w.write()
    return path


def build_mamba2_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_layer: int = 2,
    d_state: int = 16,
    d_conv: int = 4,
    n_head: int = 4,   # SSM heads (= ssm.time_step_rank KV)
    n_group: int = 2,
    n_ctx: int = 1024,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
    with_vocab: bool = False,
    weight_cb=None,
) -> str:
    """Synthetic Mamba-2 GGUF (src/models/mamba2.cpp load_arch_tensors)."""
    rng = np.random.default_rng(seed)
    d_inner = 2 * n_embd
    dxbc = d_inner + 2 * n_group * d_state
    d_in_proj = 2 * d_inner + 2 * n_group * d_state + n_head
    arch = "mamba2"
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-mamba2")
    w.add_uint32(f"{arch}.context_length", n_ctx)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", 0)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_uint32(f"{arch}.ssm.inner_size", d_inner)
    w.add_uint32(f"{arch}.ssm.state_size", d_state)
    w.add_uint32(f"{arch}.ssm.time_step_rank", n_head)
    w.add_uint32(f"{arch}.ssm.group_count", n_group)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if with_vocab:
        add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        if weight_cb:
            weight_cb(name, arr)
        w.add_tensor(name, arr)

    def addq(name, arr):
        if weight_cb:
            weight_cb(name, arr)
        from ..gguf.constants import GGML_QUANT_SIZES

        blk = GGML_QUANT_SIZES.get(qtype, (1, 0))[0]
        if arr.shape[-1] % max(blk, 1):
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    add("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i in range(n_layer):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        addq(p + "ssm_in.weight", rand(d_in_proj, n_embd))
        add(p + "ssm_conv1d.weight", rand(dxbc, d_conv))
        add(p + "ssm_conv1d.bias", rand(dxbc))
        add(p + "ssm_dt.bias", rand(n_head) + 0.5)
        add(p + "ssm_a", -np.exp(rand(n_head, 1)))
        add(p + "ssm_d", np.ones((n_head, 1), np.float32) + rand(n_head, 1))
        add(p + "ssm_norm.weight", np.ones((n_group, d_inner // n_group),
                                           np.float32)
            + rand(n_group, d_inner // n_group))
        addq(p + "ssm_out.weight", rand(n_embd, d_inner))
    w.write()
    return path


def build_hybrid2_gguf(
    path: str,
    arch: str = "nemotron_h",
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    pattern: str = "marf",  # per-layer kinds: m=mamba2 a=attn f=ffn r=mamba2
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 96,
    d_state: int = 16,
    d_conv: int = 4,
    ssm_heads: int = 4,
    n_group: int = 2,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
    with_vocab: bool = True,
) -> str:
    """Synthetic mamba2-hybrid checkpoint for nemotron_h / granitehybrid /
    falcon-h1 (tensor sets per src/models/nemotron-h.cpp,
    granite-hybrid.cpp, falcon-h1.cpp load_arch_tensors).

    pattern: layer kinds for nemotron_h ('m'/'r' mamba2, 'a' attention,
    'f' FFN) or granitehybrid ('m'/'a'; every layer also gets an FFN).
    falcon-h1 ignores it (every layer = attn + mamba2 + FFN)."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    d_inner = 2 * n_embd
    dxbc = d_inner + 2 * n_group * d_state
    d_in_proj = 2 * d_inner + 2 * n_group * d_state + ssm_heads
    parallel = arch == "falcon-h1"
    per_ffn = arch in ("granitehybrid", "falcon-h1")  # FFN on every layer
    moe_ffn = arch == "nemotron_h_moe"  # 'f' layers carry latent MoE
    n_expert, n_used, latent, ff_shexp = 4, 2, n_embd // 2, n_ff // 2
    n_layer = len(pattern)
    kinds = ["p"] * n_layer if parallel else list(pattern.replace("r", "m"))

    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", f"synth-{arch}")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    kvp = [n_head_kv if k in ("a", "p") else 0 for k in kinds]
    ffp = [n_ff if (per_ffn or k == "f") else 0 for k in kinds]
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray(kvp, np.uint32))
    w.add_array(f"{arch}.feed_forward_length",
                np.asarray(ffp, np.uint32))
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    w.add_uint32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_uint32(f"{arch}.ssm.inner_size", d_inner)
    w.add_uint32(f"{arch}.ssm.state_size", d_state)
    w.add_uint32(f"{arch}.ssm.time_step_rank", ssm_heads)
    w.add_uint32(f"{arch}.ssm.group_count", n_group)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if arch == "granitehybrid":
        w.add_float32(f"{arch}.embedding_scale", 2.0)
        w.add_float32(f"{arch}.residual_scale", 0.5)
        w.add_float32(f"{arch}.logit_scale", 0.25)
    if moe_ffn:
        w.add_uint32(f"{arch}.expert_count", n_expert)
        w.add_uint32(f"{arch}.expert_used_count", n_used)
        w.add_uint32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_uint32(f"{arch}.expert_shared_feed_forward_length", ff_shexp)
        w.add_uint32(f"{arch}.moe_latent_size", latent)
        w.add_float32(f"{arch}.expert_weights_scale", 1.0)
    if with_vocab:
        add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    def add_ssm(p):
        addq(p + "ssm_in.weight", rand(d_in_proj, n_embd))
        add(p + "ssm_conv1d.weight", rand(dxbc, d_conv))
        add(p + "ssm_conv1d.bias", rand(dxbc))
        add(p + "ssm_dt.bias", rand(ssm_heads) + 0.5)
        add(p + "ssm_a", -np.exp(rand(ssm_heads, 1)))
        add(p + "ssm_d", np.ones((ssm_heads, 1), np.float32)
            + rand(ssm_heads, 1))
        add(p + "ssm_norm.weight",
            np.ones((n_group, d_inner // n_group), np.float32)
            + rand(n_group, d_inner // n_group))
        addq(p + "ssm_out.weight", rand(n_embd, d_inner))

    def add_attn(p):
        addq(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
        addq(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
        addq(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd))
        addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))

    def add_ffn(p, gated):
        if gated:
            addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
        addq(p + "ffn_up.weight", rand(n_ff, n_embd))
        addq(p + "ffn_down.weight", rand(n_embd, n_ff))

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    add("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i, kind in enumerate(kinds):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        if kind == "p":
            add_attn(p)
            add_ssm(p)
        elif kind == "m":
            add_ssm(p)
        elif kind == "a":
            add_attn(p)
        if per_ffn or kind == "f":
            if per_ffn:
                # falcon-h1 quirk: the ffn norm has NO .weight suffix
                # (src/models/falcon-h1.cpp tn(LLM_TENSOR_FFN_NORM, i))
                sfx = "" if parallel else ".weight"
                add(p + "ffn_norm" + sfx, np.ones(n_embd, np.float32)
                    + rand(n_embd))
            if moe_ffn:  # nemotron-h-moe latent MoE layer
                add(p + "ffn_gate_inp.weight", rand(n_expert, n_embd))
                add(p + "exp_probs_b.bias", rand(n_expert))
                addq(p + "ffn_latent_down.weight", rand(latent, n_embd))
                addq(p + "ffn_latent_up.weight", rand(n_embd, latent))
                addq(p + "ffn_up_exps.weight",
                     rand(n_expert, n_ff, latent))
                addq(p + "ffn_down_exps.weight",
                     rand(n_expert, latent, n_ff))
                addq(p + "ffn_up_shexp.weight", rand(ff_shexp, n_embd))
                addq(p + "ffn_down_shexp.weight", rand(n_embd, ff_shexp))
            else:
                add_ffn(p, gated=per_ffn)  # nemotron_h: ungated relu^2
    w.write()
    return path


def add_plamo2_toy_vocab(w: GGUFWriter, vocab_size: int) -> int:
    """Usable plamo2 toy vocab: 4 specials + ALL 256 byte tokens (the
    reference throws without them, src/llama-vocab.cpp:1352) + scored text
    pieces; returns the actual token count written."""
    specials = ["<|plamo:unk|>", "<|plamo:bos|>", "<|plamo:eos|>",
                "<|plamo:pad|>"]
    bytes_ = [f"<0x{i:02X}>" for i in range(256)]
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789 .,!?")
    n_words = max(0, vocab_size - len(specials) - 256 - len(chars))
    words = [f"tok{i}" for i in range(min(n_words, 50))]
    toks = specials + bytes_ + chars + words
    toks += [f"<fill{i}>" for i in range(vocab_size - len(toks))]
    scores = np.zeros(len(toks), np.float32)
    off = len(specials) + 256
    scores[off:off + len(chars)] = -5.0       # chars
    scores[off + len(chars):off + len(chars) + len(words)] = -2.0  # words win
    ttypes = np.ones(len(toks), np.int32)
    ttypes[0] = 2  # UNKNOWN
    ttypes[1:4] = 3  # CONTROL
    ttypes[4:260] = 6  # BYTE
    w.add_string("tokenizer.ggml.model", "plamo2")
    w.add_array("tokenizer.ggml.tokens", toks)
    w.add_array("tokenizer.ggml.scores", scores)
    w.add_array("tokenizer.ggml.token_type", ttypes)
    w.add_bool("tokenizer.ggml.add_bos_token", False)
    w.add_bool("tokenizer.ggml.add_eos_token", False)
    return len(toks)


def build_plamo2_gguf(
    path: str,
    *,
    vocab_size: int = 340,
    n_embd: int = 64,
    pattern: str = "mama",  # per-layer kinds: m=plamo2-mamba a=attention
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 96,
    d_state: int = 16,
    d_conv: int = 4,
    ssm_heads: int = 4,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
) -> str:
    """Synthetic PLaMo-2 checkpoint (src/models/plamo2.cpp
    load_arch_tensors): mamba layers carry per-head scalar-decay SSM with
    dt/B/C norms and a low-rank dt; attention layers carry fused QKV with
    per-head q/k norms; EVERY layer has post_attention_norm, ffn_norm,
    fused swiglu ffn_up (2*n_ff) and post_ffw_norm."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    d_inner = 2 * n_embd
    dt_dim = max(64, n_embd // 16)  # plamo2.cpp:39
    n_layer = len(pattern)
    arch = "plamo2"

    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-plamo2")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    kvp = [n_head_kv if k == "a" else 0 for k in pattern]
    w.add_array(f"{arch}.attention.head_count_kv", np.asarray(kvp, np.uint32))
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    w.add_uint32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_uint32(f"{arch}.ssm.inner_size", d_inner)
    w.add_uint32(f"{arch}.ssm.state_size", d_state)
    w.add_uint32(f"{arch}.ssm.time_step_rank", ssm_heads)
    w.add_uint32(f"{arch}.ssm.group_count", 0)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    add_plamo2_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    add("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i, kind in enumerate(pattern):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        if kind == "m":
            addq(p + "ssm_in.weight", rand(2 * d_inner, n_embd))
            add(p + "ssm_conv1d.weight", rand(d_inner, d_conv))
            addq(p + "ssm_x.weight", rand(dt_dim + 2 * d_state, d_inner))
            addq(p + "ssm_dt.weight", rand(ssm_heads, dt_dim))
            add(p + "ssm_dt.bias", rand(ssm_heads) + 0.5)
            add(p + "ssm_a", -np.exp(rand(ssm_heads)))
            add(p + "ssm_d", np.ones(ssm_heads, np.float32)
                + rand(ssm_heads))
            addq(p + "ssm_out.weight", rand(n_embd, d_inner))
            add(p + "ssm_dt_norm", np.ones(dt_dim, np.float32)
                + rand(dt_dim))
            add(p + "ssm_b_norm", np.ones(d_state, np.float32)
                + rand(d_state))
            add(p + "ssm_c_norm", np.ones(d_state, np.float32)
                + rand(d_state))
        else:
            nqkv = (n_head + 2 * n_head_kv) * head_dim
            addq(p + "attn_qkv.weight", rand(nqkv, n_embd))
            add(p + "attn_q_norm.weight", np.ones((n_head, head_dim),
                                                  np.float32)
                + rand(n_head, head_dim))
            add(p + "attn_k_norm.weight", np.ones((n_head_kv, head_dim),
                                                  np.float32)
                + rand(n_head_kv, head_dim))
            addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
        add(p + "post_attention_norm", np.ones(n_embd, np.float32)
            + rand(n_embd))
        add(p + "ffn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        addq(p + "ffn_up.weight", rand(2 * n_ff, n_embd))
        addq(p + "ffn_down.weight", rand(n_embd, n_ff))
        add(p + "post_ffw_norm", np.ones(n_embd, np.float32)
            + rand(n_embd))
    w.write()
    return path


def build_deci_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    layers: tuple = ((4, 2, 96), (4, 0, 96), (0, 0, 96), (4, 1, 64)),
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
) -> str:
    """Synthetic deci / nemotron-NAS checkpoint (src/models/deci.cpp):
    layers = per-layer (n_head, n_head_kv, n_ff) triples — (h,kv,ff) with
    kv=0,h>0 = "linear attention" (norm->wo), h=0 = attention-free,
    ff=0 = FFN-free. Variable kv exercises the per-group GQA path."""
    rng = np.random.default_rng(seed)
    n_head_max = max(h for h, _, _ in layers)
    head_dim = n_embd // n_head_max
    arch = "deci"
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-deci")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", len(layers))
    w.add_array(f"{arch}.attention.head_count",
                np.asarray([h for h, _, _ in layers], np.uint32))
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray([kv for _, kv, _ in layers], np.uint32))
    w.add_array(f"{arch}.feed_forward_length",
                np.asarray([f for _, _, f in layers], np.uint32))
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32)
                 + rand(n_embd))
    for i, (h, kv, ff) in enumerate(layers):
        p = f"blk.{i}."
        if h > 0 and kv == 0:  # linear attention (deci.cpp:35-39)
            w.add_tensor(p + "attn_norm.weight",
                         np.ones(n_embd, np.float32) + rand(n_embd))
            addq(p + "attn_output.weight", rand(n_embd, n_embd))
        elif kv > 0:
            w.add_tensor(p + "attn_norm.weight",
                         np.ones(n_embd, np.float32) + rand(n_embd))
            addq(p + "attn_q.weight", rand(h * head_dim, n_embd))
            addq(p + "attn_k.weight", rand(kv * head_dim, n_embd))
            addq(p + "attn_v.weight", rand(kv * head_dim, n_embd))
            addq(p + "attn_output.weight", rand(n_embd, h * head_dim))
        if ff > 0:
            w.add_tensor(p + "ffn_norm.weight",
                         np.ones(n_embd, np.float32) + rand(n_embd))
            addq(p + "ffn_gate.weight", rand(ff, n_embd))
            addq(p + "ffn_up.weight", rand(ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, ff))
    w.write()
    return path


def build_openelm_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    head_dim: int = 16,
    layers: tuple = ((2, 1, 64), (4, 2, 96), (4, 1, 96)),
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
) -> str:
    """Synthetic openelm checkpoint (src/models/openelm.cpp): per-layer
    (n_head, n_head_kv, n_ff); fused QKV ordered [q-heads | k | v],
    shared per-head-dim q/k RMS norms, tied embeddings (no output)."""
    rng = np.random.default_rng(seed)
    arch = "openelm"
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-openelm")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", len(layers))
    w.add_array(f"{arch}.attention.head_count",
                np.asarray([h for h, _, _ in layers], np.uint32))
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray([kv for _, kv, _ in layers], np.uint32))
    w.add_array(f"{arch}.feed_forward_length",
                np.asarray([f for _, _, f in layers], np.uint32))
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))  # tied output
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32)
                 + rand(n_embd))
    for i, (h, kv, ff) in enumerate(layers):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32)
                     + rand(n_embd))
        addq(p + "attn_qkv.weight", rand((h + 2 * kv) * head_dim, n_embd))
        w.add_tensor(p + "attn_q_norm.weight",
                     np.ones(head_dim, np.float32) + rand(head_dim))
        w.add_tensor(p + "attn_k_norm.weight",
                     np.ones(head_dim, np.float32) + rand(head_dim))
        addq(p + "attn_output.weight", rand(n_embd, h * head_dim))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32)
                     + rand(n_embd))
        addq(p + "ffn_gate.weight", rand(ff, n_embd))
        addq(p + "ffn_up.weight", rand(ff, n_embd))
        addq(p + "ffn_down.weight", rand(n_embd, ff))
    w.write()
    return path


def build_gemma3n_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    head_dim: int = 16,
    n_ff: int = 96,
    n_layer: int = 25,  # 20 KV layers (hardcoded nks=20) + 5 shared
    swa_period: int = 5,  # full attention every 5th layer
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
) -> str:
    """Synthetic gemma3n checkpoint (src/models/gemma3n.cpp
    load_arch_tensors): AltUp 4-stream stack, laurel bypass, per-layer
    token-embedding stream, activation sparsity, trailing shared-KV layers.
    The altup geometry is HARDCODED in the reference (llama-hparams.h:
    n_altup=4, n_embd_altup=256, laurel_rank=64; models.h n_layer_sparsity
    =10), so the tensors must carry those exact dims."""
    rng = np.random.default_rng(seed)
    P, A, LR = 256, 4, 64
    arch = "gemma3n"

    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-gemma3n")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.attention.sliding_window", 32)
    w.add_uint32(f"{arch}.attention.sliding_window_pattern", swa_period)
    w.add_uint32(f"{arch}.embedding_length_per_layer_input", P)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base", 1000000.0)
    w.add_float32(f"{arch}.rope.freq_base_swa", 10000.0)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    add("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    add("altup_proj.weight", rand(A - 1, n_embd, n_embd))
    add("altup_unembd_proj.weight", rand(A - 1, n_embd, n_embd))
    addq("per_layer_token_embd.weight", rand(vocab_size, n_layer * P))
    addq("per_layer_model_proj.weight", rand(n_layer * P, n_embd))
    add("per_layer_proj_norm.weight", np.ones(P, np.float32) + rand(P))
    for i in range(n_layer):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        addq(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
        addq(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
        addq(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd))
        addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
        add(p + "attn_q_norm.weight", np.ones(head_dim, np.float32)
            + rand(head_dim))
        add(p + "attn_k_norm.weight", np.ones(head_dim, np.float32)
            + rand(head_dim))
        add(p + "post_attention_norm.weight",
            np.ones(n_embd, np.float32) + rand(n_embd))
        add(p + "ffn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
        addq(p + "ffn_up.weight", rand(n_ff, n_embd))
        addq(p + "ffn_down.weight", rand(n_embd, n_ff))
        add(p + "post_ffw_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        add(p + "inp_gate.weight", rand(P, n_embd))
        add(p + "proj.weight", rand(n_embd, P))
        add(p + "post_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        add(p + "altup_correct_coef.weight", rand(A, A))
        add(p + "altup_correct_scale.weight",
            np.ones(n_embd, np.float32) + rand(n_embd))
        add(p + "altup_predict_coef.weight", rand(A * A, A))
        add(p + "altup_router.weight", rand(A, n_embd))
        add(p + "altup_router_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        add(p + "laurel_l.weight", rand(LR, n_embd))
        add(p + "laurel_r.weight", rand(n_embd, LR))
        add(p + "laurel_post_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
    w.write()
    return path


def build_gemma4_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    head_dim: int = 16,
    n_ff: int = 96,
    n_embd_per_layer: int = 32,
    swa_layers: tuple = (1, 1, 1, 0, 1, 0),  # layer nks-2 swa, nks-1 full
    shared_kv: int = 2,
    no_wv_layer: int = 1,  # this layer omits wv (alternative attention)
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
) -> str:
    """Synthetic gemma4 checkpoint (src/models/gemma4.cpp
    load_arch_tensors, dense variant): per-layer token-embedding stream,
    trailing shared-KV layers, optional wv (v=k), per-layer out_scale,
    SWA layer array + swa rope base, gelu FFN, sandwich norms."""
    rng = np.random.default_rng(seed)
    n_layer = len(swa_layers)
    P = n_embd_per_layer
    arch = "gemma4"
    nks = n_layer - shared_kv

    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-gemma4")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.attention.key_length_swa", head_dim)
    w.add_uint32(f"{arch}.attention.value_length_swa", head_dim)
    w.add_uint32(f"{arch}.attention.sliding_window", 32)
    w.add_array(f"{arch}.attention.sliding_window_pattern",
                np.asarray(swa_layers, np.uint32))
    w.add_uint32(f"{arch}.attention.shared_kv_layers", shared_kv)
    w.add_uint32(f"{arch}.embedding_length_per_layer_input", P)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base", 1000000.0)
    w.add_float32(f"{arch}.rope.freq_base_swa", 10000.0)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_float32(f"{arch}.final_logit_softcapping", 30.0)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    add("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    addq("per_layer_token_embd.weight", rand(vocab_size, n_layer * P))
    addq("per_layer_model_proj.weight", rand(n_layer * P, n_embd))
    add("per_layer_proj_norm.weight", np.ones(P, np.float32) + rand(P))
    # ROPE_FREQS is a GLOBAL name (no blk prefix, llama-arch.cpp): the
    # proportional-rope factors shared by full-attn layers; neutral ones
    add("rope_freqs.weight", np.ones(head_dim // 2, np.float32))
    for i, sw in enumerate(swa_layers):
        p = f"blk.{i}."
        has_kv = i < nks
        add(p + "attn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        addq(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
        add(p + "attn_q_norm.weight", np.ones(head_dim, np.float32)
            + rand(head_dim))
        if has_kv:
            addq(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
            if i != no_wv_layer:
                addq(p + "attn_v.weight",
                     rand(n_head_kv * head_dim, n_embd))
            add(p + "attn_k_norm.weight", np.ones(head_dim, np.float32)
                + rand(head_dim))
        addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
        add(p + "post_attention_norm.weight",
            np.ones(n_embd, np.float32) + rand(n_embd))
        add(p + "layer_output_scale.weight",
            np.asarray([1.0 + 0.01 * i], np.float32))
        add(p + "ffn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
        addq(p + "ffn_up.weight", rand(n_ff, n_embd))
        addq(p + "ffn_down.weight", rand(n_embd, n_ff))
        add(p + "post_ffw_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        add(p + "inp_gate.weight", rand(P, n_embd))
        add(p + "proj.weight", rand(n_embd, P))
        add(p + "post_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
    w.write()
    return path


def build_kimi_linear_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    pattern: str = "kkma",  # k = KDA, a/m... only k and a are used
    n_head: int = 4,
    kda_head_dim: int = 16,
    d_conv: int = 4,
    qk_nope: int = 48,
    qk_rope: int = 16,
    v_dim: int = 32,
    kv_lora: int = 64,
    n_ff: int = 96,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 64,
    dense_lead: int = 1,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
) -> str:
    """Synthetic kimi-linear checkpoint (src/models/kimi-linear.cpp
    load_arch_tensors): KDA layers ('k') with separate q/k/v convs and
    low-rank decay/gate projections; ropeless MLA layers ('a') with split
    wk_b/wv_b; dense-lead then renormalized MoE + gated shared expert."""
    rng = np.random.default_rng(seed)
    Di = n_head * kda_head_dim
    head_dim = qk_nope + qk_rope  # n_embd_head_k_mla
    arch = "kimi-linear"
    kinds = list(pattern.replace("m", "k"))
    n_layer = len(kinds)

    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-kimi-linear")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    # MLA absorbs to MQA: ONE kv head on attention layers, 0 marks KDA
    kvp = [1 if k == "a" else 0 for k in kinds]
    w.add_array(f"{arch}.attention.head_count_kv", np.asarray(kvp, np.uint32))
    # MLA GGUF convention: compressed cache head sizes + *_mla keys
    w.add_uint32(f"{arch}.attention.key_length", kv_lora + qk_rope)
    w.add_uint32(f"{arch}.attention.value_length", kv_lora)
    w.add_uint32(f"{arch}.attention.key_length_mla", head_dim)
    w.add_uint32(f"{arch}.attention.value_length_mla", v_dim)
    w.add_uint32(f"{arch}.attention.kv_lora_rank", kv_lora)
    w.add_uint32(f"{arch}.rope.dimension_count", qk_rope)
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    w.add_uint32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_uint32(f"{arch}.kda.head_dim", kda_head_dim)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    w.add_uint32(f"{arch}.expert_count", n_expert)
    w.add_uint32(f"{arch}.expert_used_count", n_expert_used)
    w.add_uint32(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add_uint32(f"{arch}.expert_shared_count", 1)
    w.add_uint32(f"{arch}.leading_dense_block_count", dense_lead)
    w.add_float32(f"{arch}.expert_weights_scale", 1.0)
    w.add_bool(f"{arch}.expert_weights_norm", True)
    w.add_uint32(f"{arch}.expert_gating_func", 1)  # softmax
    add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    add("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i, kind in enumerate(kinds):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        if kind == "k":  # KDA layer
            for nm in ("q", "k", "v"):
                add(p + f"ssm_conv1d_{nm}.weight",
                    rand(Di, 1, d_conv))  # ggml {d_conv, 1, d_inner}
            addq(p + "attn_q.weight", rand(Di, n_embd))
            addq(p + "attn_k.weight", rand(Di, n_embd))
            addq(p + "attn_v.weight", rand(Di, n_embd))
            addq(p + "ssm_f_a.weight", rand(kda_head_dim, n_embd))
            addq(p + "ssm_f_b.weight", rand(Di, kda_head_dim))
            addq(p + "ssm_beta.weight", rand(n_head, n_embd))
            add(p + "ssm_a", -np.exp(rand(n_head, 1)))
            add(p + "ssm_dt.bias", rand(Di) + 0.5)
            addq(p + "ssm_g_a.weight", rand(kda_head_dim, n_embd))
            addq(p + "ssm_g_b.weight", rand(Di, kda_head_dim))
            add(p + "ssm_norm.weight", np.ones(kda_head_dim, np.float32)
                + rand(kda_head_dim))
            addq(p + "attn_output.weight", rand(n_embd, Di))
        else:  # ropeless MLA layer (no q-lora in the synth)
            addq(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
            addq(p + "attn_kv_a_mqa.weight", rand(kv_lora + qk_rope, n_embd))
            add(p + "attn_kv_a_norm.weight",
                np.ones(kv_lora, np.float32) + rand(kv_lora))
            add(p + "attn_k_b.weight", rand(n_head, kv_lora, qk_nope))
            add(p + "attn_v_b.weight", rand(n_head, v_dim, kv_lora))
            addq(p + "attn_output.weight", rand(n_embd, n_head * v_dim))
        add(p + "ffn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        if i < dense_lead:
            addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
        else:
            add(p + "ffn_gate_inp.weight", rand(n_expert, n_embd) * 20.0)
            add(p + "exp_probs_b.bias", rand(n_expert))
            addq(p + "ffn_gate_exps.weight", rand(n_expert, n_ff_exp, n_embd))
            addq(p + "ffn_up_exps.weight", rand(n_expert, n_ff_exp, n_embd))
            addq(p + "ffn_down_exps.weight", rand(n_expert, n_embd, n_ff_exp))
            addq(p + "ffn_gate_shexp.weight", rand(n_ff_exp, n_embd))
            addq(p + "ffn_up_shexp.weight", rand(n_ff_exp, n_embd))
            addq(p + "ffn_down_shexp.weight", rand(n_embd, n_ff_exp))
    w.write()
    return path


def build_qwen35_gguf(
    path: str,
    *,
    moe: bool = False,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_layer: int = 4,
    full_attn_interval: int = 4,
    n_head: int = 4,
    n_head_kv: int = 2,
    d_state: int = 16,
    d_conv: int = 4,
    n_k_heads: int = 2,
    n_v_heads: int = 4,
    n_ff: int = 96,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 48,
    n_ff_shexp: int = 64,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
) -> str:
    """Synthetic qwen35 / qwen35moe checkpoint (src/models/qwen35.cpp,
    qwen35moe.cpp load_arch_tensors): GDN layers with SEPARATE beta/alpha
    projections + split attn_qkv/attn_gate, M-RoPE'd gated full attention
    every full_attn_interval-th layer, dense silu FFN (qwen35) or MoE +
    sigmoid-gated shared expert (qwen35moe)."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    d_inner = n_v_heads * d_state
    key_dim = d_state * n_k_heads
    conv_dim = 2 * key_dim + d_inner
    arch = "qwen35moe" if moe else "qwen35"

    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", f"synth-{arch}")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_array(f"{arch}.rope.dimension_sections",
                np.asarray([head_dim // 4, head_dim // 8, head_dim // 8, 0],
                           np.int32))
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    w.add_uint32(f"{arch}.full_attention_interval", full_attn_interval)
    w.add_uint32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_uint32(f"{arch}.ssm.inner_size", d_inner)
    w.add_uint32(f"{arch}.ssm.state_size", d_state)
    w.add_uint32(f"{arch}.ssm.time_step_rank", n_v_heads)
    w.add_uint32(f"{arch}.ssm.group_count", n_k_heads)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    if moe:
        w.add_uint32(f"{arch}.expert_count", n_expert)
        w.add_uint32(f"{arch}.expert_used_count", n_expert_used)
        w.add_uint32(f"{arch}.expert_feed_forward_length", n_ff_exp)
        w.add_uint32(f"{arch}.expert_shared_feed_forward_length", n_ff_shexp)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    add("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i in range(n_layer):
        p = f"blk.{i}."
        full_attn = (i + 1) % full_attn_interval == 0
        add(p + "attn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        add(p + "post_attention_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        if full_attn:
            addq(p + "attn_q.weight", rand(n_head * head_dim * 2, n_embd))
            addq(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
            add(p + "attn_q_norm.weight", np.ones(head_dim, np.float32)
                + rand(head_dim))
            add(p + "attn_k_norm.weight", np.ones(head_dim, np.float32)
                + rand(head_dim))
        else:
            addq(p + "attn_qkv.weight", rand(conv_dim, n_embd))
            addq(p + "attn_gate.weight", rand(d_inner, n_embd))
            add(p + "ssm_conv1d.weight", rand(conv_dim, d_conv))
            add(p + "ssm_dt.bias", rand(n_v_heads) + 0.5)
            add(p + "ssm_a", -np.exp(rand(n_v_heads)))
            addq(p + "ssm_beta.weight", rand(n_v_heads, n_embd))
            addq(p + "ssm_alpha.weight", rand(n_v_heads, n_embd))
            add(p + "ssm_norm.weight", np.ones(d_state, np.float32)
                + rand(d_state))
            addq(p + "ssm_out.weight", rand(n_embd, d_inner))
        if moe:
            add(p + "ffn_gate_inp.weight", rand(n_expert, n_embd))
            addq(p + "ffn_gate_exps.weight", rand(n_expert, n_ff_exp, n_embd))
            addq(p + "ffn_up_exps.weight", rand(n_expert, n_ff_exp, n_embd))
            addq(p + "ffn_down_exps.weight", rand(n_expert, n_embd, n_ff_exp))
            add(p + "ffn_gate_inp_shexp.weight", rand(n_embd))
            addq(p + "ffn_gate_shexp.weight", rand(n_ff_shexp, n_embd))
            addq(p + "ffn_up_shexp.weight", rand(n_ff_shexp, n_embd))
            addq(p + "ffn_down_shexp.weight", rand(n_embd, n_ff_shexp))
        else:
            addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
    w.write()
    return path


def build_qwen3next_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_layer: int = 4,
    full_attn_interval: int = 4,
    n_head: int = 4,
    n_head_kv: int = 2,
    d_state: int = 16,   # head_k_dim == head_v_dim
    d_conv: int = 4,
    n_k_heads: int = 2,  # ssm.group_count
    n_v_heads: int = 4,  # ssm.time_step_rank
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 48,
    n_ff_shexp: int = 64,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
    with_vocab: bool = True,
    legacy_qkvz: bool = False,
) -> str:
    """Synthetic qwen3next checkpoint (tensor set per
    src/models/qwen3next.cpp load_arch_tensors): gated-delta-net layers on
    all but every full_attn_interval-th layer, gated full attention on the
    rest, MoE + sigmoid-gated shared expert on every layer.

    legacy_qkvz writes the interleaved ssm_in projection instead of the
    optimized attn_qkv/attn_gate split."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    d_inner = n_v_heads * d_state          # head_v_dim == d_state
    key_dim = d_state * n_k_heads
    conv_dim = 2 * key_dim + d_inner
    rep = n_v_heads // n_k_heads

    w = GGUFWriter(path, arch="qwen3next")
    arch = "qwen3next"
    w.add_string("general.name", "synth-qwen3next")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    w.add_uint32(f"{arch}.full_attention_interval", full_attn_interval)
    w.add_uint32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_uint32(f"{arch}.ssm.inner_size", d_inner)
    w.add_uint32(f"{arch}.ssm.state_size", d_state)
    w.add_uint32(f"{arch}.ssm.time_step_rank", n_v_heads)
    w.add_uint32(f"{arch}.ssm.group_count", n_k_heads)
    w.add_uint32(f"{arch}.expert_count", n_expert)
    w.add_uint32(f"{arch}.expert_used_count", n_expert_used)
    w.add_uint32(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add_uint32(f"{arch}.expert_shared_feed_forward_length", n_ff_shexp)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff_exp)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if with_vocab:
        add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    add("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i in range(n_layer):
        p = f"blk.{i}."
        full_attn = (i + 1) % full_attn_interval == 0
        add(p + "attn_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        add(p + "attn_post_norm.weight", np.ones(n_embd, np.float32)
            + rand(n_embd))
        if full_attn:
            addq(p + "attn_q.weight", rand(n_head * head_dim * 2, n_embd))
            addq(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
            add(p + "attn_q_norm.weight", np.ones(head_dim, np.float32)
                + rand(head_dim))
            add(p + "attn_k_norm.weight", np.ones(head_dim, np.float32)
                + rand(head_dim))
        else:
            if legacy_qkvz:
                qkvz_dim = n_k_heads * (2 * d_state + 2 * rep * d_state)
                addq(p + "ssm_in.weight", rand(qkvz_dim, n_embd))
            else:
                addq(p + "attn_qkv.weight", rand(conv_dim, n_embd))
                addq(p + "attn_gate.weight", rand(d_inner, n_embd))
            add(p + "ssm_conv1d.weight", rand(conv_dim, d_conv))
            add(p + "ssm_dt.bias", rand(n_v_heads) + 0.5)
            add(p + "ssm_a", -np.exp(rand(n_v_heads)))
            addq(p + "ssm_ba.weight", rand(2 * n_v_heads, n_embd))
            add(p + "ssm_norm.weight", np.ones(d_state, np.float32)
                + rand(d_state))
            addq(p + "ssm_out.weight", rand(n_embd, d_inner))
        add(p + "ffn_gate_inp.weight", rand(n_expert, n_embd))
        addq(p + "ffn_gate_exps.weight", rand(n_expert, n_ff_exp, n_embd))
        addq(p + "ffn_up_exps.weight", rand(n_expert, n_ff_exp, n_embd))
        addq(p + "ffn_down_exps.weight", rand(n_expert, n_embd, n_ff_exp))
        add(p + "ffn_gate_inp_shexp.weight", rand(n_embd))
        addq(p + "ffn_gate_shexp.weight", rand(n_ff_shexp, n_embd))
        addq(p + "ffn_up_shexp.weight", rand(n_ff_shexp, n_embd))
        addq(p + "ffn_down_shexp.weight", rand(n_embd, n_ff_shexp))
    w.write()
    return path


def build_deepseek2_gguf(
    path: str,
    arch: str = "deepseek2",
    *,
    vocab_size: int = 512,
    n_embd: int = 128,
    n_layer: int = 2,
    n_head: int = 4,
    qk_nope: int = 48,
    qk_rope: int = 16,
    v_dim: int = 32,
    q_lora: int = 64,
    kv_lora: int = 64,
    n_ff: int = 128,
    n_ctx: int = 512,
    qtype: GGMLType = GGMLType.Q8_0,
    seed: int = 0,
    scale: float = 0.05,
    with_vocab: bool = True,
    gated: bool = True,
    moe: bool = False,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 64,
    n_expert_shared: int = 1,
    indexer: tuple | None = None,  # (n_head, head_size, top_k) — glm-dsa
    split_mla: bool = False,  # write split wk_b/wv_b + *_mla keys (is_mla)
    dense_lead: int | None = None,
) -> str:
    """Synthetic deepseek2 (MLA) checkpoint.

    q_lora=0 emits a direct attn_q projection and gated=False an ungated
    MLP — the plm tensor set (src/models/plm.cpp load_arch_tensors).
    moe adds sigmoid-gated MoE layers after dense_lead leading dense ones
    (+probs bias, shared expert); indexer adds the glm-dsa DSA indexer
    tensors (loaded but unused by the reference graph, models.h:1013);
    split_mla writes the SPLIT attn_k_b/attn_v_b (is_mla branch).

    Without split_mla, writes the legacy UNSPLIT attn_kv_b: the reference
    then evaluates the decompressed-MHA form while tpullm runs the
    absorbed-MQA form — numerically the same attention, so differential
    tests cross-check the MLA algebra end to end."""
    rng = np.random.default_rng(seed)
    head_dim = qk_nope + qk_rope
    if dense_lead is None:
        dense_lead = 1 if moe else n_layer
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", f"synth-{arch}")
    w.add_uint32(f"{arch}.context_length", n_ctx)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    # MLA converts to MQA under absorption: the compressed cache has ONE
    # kv head (convert_hf_to_gguf.py DeepseekV2Model add_head_count_kv(1))
    w.add_uint32(f"{arch}.attention.head_count_kv",
                 1 if split_mla else n_head)
    if split_mla:
        # MLA GGUF convention (convert_hf_to_gguf.py DeepseekV2Model):
        # key/value_length carry the COMPRESSED cache head sizes, the
        # *_mla keys the decompressed per-head q/v dims
        w.add_uint32(f"{arch}.attention.key_length", kv_lora + qk_rope)
        w.add_uint32(f"{arch}.attention.value_length", kv_lora)
        w.add_uint32(f"{arch}.attention.key_length_mla", head_dim)
        w.add_uint32(f"{arch}.attention.value_length_mla", v_dim)
    else:
        w.add_uint32(f"{arch}.attention.key_length", head_dim)
        w.add_uint32(f"{arch}.attention.value_length", v_dim)
    w.add_uint32(f"{arch}.rope.dimension_count", qk_rope)
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if q_lora:
        w.add_uint32(f"{arch}.attention.q_lora_rank", q_lora)
    w.add_uint32(f"{arch}.attention.kv_lora_rank", kv_lora)
    w.add_uint32(f"{arch}.leading_dense_block_count", dense_lead)
    w.add_uint32(f"{arch}.expert_feed_forward_length",
                 n_ff_exp if moe else n_ff)
    w.add_uint32(f"{arch}.expert_shared_count",
                 n_expert_shared if moe else 0)
    if moe:
        w.add_uint32(f"{arch}.expert_count", n_expert)
        w.add_uint32(f"{arch}.expert_used_count", n_expert_used)
        w.add_float32(f"{arch}.expert_weights_scale", 1.0)
        w.add_bool(f"{arch}.expert_weights_norm", True)
    if indexer is not None:
        inh, ihs, itk = indexer
        w.add_uint32(f"{arch}.attention.indexer.head_count", inh)
        w.add_uint32(f"{arch}.attention.indexer.key_length", ihs)
        w.add_uint32(f"{arch}.attention.indexer.top_k", itk)
    if with_vocab:
        add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def addq(name, arr):
        _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        if q_lora:
            addq(p + "attn_q_a.weight", rand(q_lora, n_embd))
            w.add_tensor(p + "attn_q_a_norm.weight",
                         np.ones(q_lora, np.float32) + rand(q_lora))
            addq(p + "attn_q_b.weight", rand(n_head * head_dim, q_lora))
        else:  # plm: direct Q projection
            addq(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
        addq(p + "attn_kv_a_mqa.weight", rand(kv_lora + qk_rope, n_embd))
        w.add_tensor(p + "attn_kv_a_norm.weight",
                     np.ones(kv_lora, np.float32) + rand(kv_lora))
        if split_mla:  # per-head split banks (deepseek2.cpp is_mla branch)
            # ggml ne {qk_nope, kv_lora, n_head} -> numpy (n_head, kv_lora,
            # qk_nope); {kv_lora, v_dim, n_head} -> (n_head, v_dim, kv_lora)
            # f32: qk_nope (48) is not a Q8_0 block multiple
            w.add_tensor(p + "attn_k_b.weight",
                         rand(n_head, kv_lora, qk_nope))
            w.add_tensor(p + "attn_v_b.weight", rand(n_head, v_dim, kv_lora))
        else:
            addq(p + "attn_kv_b.weight",
                 rand(n_head * (qk_nope + v_dim), kv_lora))
        addq(p + "attn_output.weight", rand(n_embd, n_head * v_dim))
        if indexer is not None:
            inh, ihs, _ = indexer
            w.add_tensor(p + "indexer.k_norm.weight",
                         np.ones(ihs, np.float32) + rand(ihs))
            w.add_tensor(p + "indexer.k_norm.bias", rand(ihs))
            addq(p + "indexer.proj.weight", rand(inh, n_embd))
            addq(p + "indexer.attn_k.weight", rand(ihs, n_embd))
            addq(p + "indexer.attn_q_b.weight", rand(inh * ihs, q_lora))
        if moe and i >= dense_lead:
            # decisive router: tiny random logits put sigmoid probs all at
            # ~0.5 and make top-k selection a coin flip between engines —
            # scale up so both engines route identically
            w.add_tensor(p + "ffn_gate_inp.weight",
                         rand(n_expert, n_embd) * 20.0)
            w.add_tensor(p + "exp_probs_b.bias", rand(n_expert))
            addq(p + "ffn_gate_exps.weight", rand(n_expert, n_ff_exp, n_embd))
            addq(p + "ffn_up_exps.weight", rand(n_expert, n_ff_exp, n_embd))
            addq(p + "ffn_down_exps.weight", rand(n_expert, n_embd, n_ff_exp))
            sh = n_ff_exp * n_expert_shared
            addq(p + "ffn_gate_shexp.weight", rand(sh, n_embd))
            addq(p + "ffn_up_shexp.weight", rand(sh, n_embd))
            addq(p + "ffn_down_shexp.weight", rand(n_embd, sh))
        else:
            if gated:
                addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
    w.write()
    return path


# per-arch structural hints for the synthetic fixture generator — the
# tensor-set quirks the registry's ModelConfig flags don't encode (what the
# reference declares in each src/models/<arch>.cpp load_arch_tensors)
SYNTH_HINTS: dict[str, dict] = {
    # llada-moe derives the expert width from n_ff/n_expert_used unless
    # expert_feed_forward_length is present — write it explicitly
    "llada-moe": dict(ff_exp=True),
    "gpt2": dict(pos_embd=True, fused_qkv="bias", dense_bias=True),
    "starcoder": dict(pos_embd=True, fused_qkv="bias", dense_bias=True),
    "codeshell": dict(fused_qkv="bias", dense_bias=True, rope_frac=2),
    "bloom": dict(tok_norm=True, fused_qkv="bias", dense_bias=True,
                  alibi=8.0),
    "mpt": dict(fused_qkv=True, qk_norm_flat=True, alibi=8.0),
    "jais": dict(fused_qkv="bias", dense_bias=True, gate_bias=True,
                 alibi=8.0, logit_scale=0.45),
    "falcon": dict(fused_qkv=True, attn_norm_2=True),
    "olmo": dict(weightless_norm=True, clamp=8.0),
    "olmoe": dict(qk_norm_flat=True),
    "smallthinker": dict(moe=True, gating=2, swa=(32, 4)),
    "olmo2": dict(qk_norm_flat=True),
    "dbrx": dict(fused_qkv=True, clamp=8.0, ffn_norm_name="attn_output_norm",
                 norm_weight_only=True),
    "nemotron": dict(dense_bias=True, rope_frac=2),
    "chatglm": dict(fused_qkv="bias", combined_gateup=True, rope_frac=2),
    "glm4": dict(rope_frac=2, norm_weight_only=True),
    "qwen": dict(fused_qkv="bias", double_ff=True),
    "plamo3": dict(fused_qkv=True, combined_gateup=True,
                   bare_post_norms=True),
    "paddleocr": dict(),
    "deepseek2-ocr": dict(moe=True, moe_shexp=True, moe_probs_b=True,
                          dense_lead=1, ff_exp=True),
    "hunyuan_vl": dict(),
    "cogvlm": dict(fused_qkv=True, visexp=True),
    "mimo2": dict(swa_layers=(1, 1, 0, 1), sinks=True, value_scale=0.9,
                  moe=True, moe_probs_b=True, ff_exp=True),
    "step35": dict(swa_layers=(1, 0, 1, 1), attn_gate_head=True,
                   moe=True, moe_probs_b=True, moe_shexp=True, ff_exp=True),
    "gptneox": dict(ffn_norm_parallel=True),
    "arcee": dict(attn_scale_kv=0.125),
    # MoE family quirks: router probs bias, always-on shared experts,
    # leading dense layers, sigmoid gating (build_moe_ffn contract A.6)
    "ernie4_5-moe": dict(moe=True, moe_probs_b=True, moe_shexp=True,
                         dense_lead=1, gating=2, ew_scale=1.5, ew_norm=True),
    "glm4moe": dict(moe=True, moe_probs_b=True, moe_shexp=True, dense_lead=1,
                    gating=2, ffn_norm_name="post_attention_norm"),
    "phimoe": dict(moe=True),
    "exaone-moe": dict(moe=True, moe_probs_b=True, moe_shexp=True,
                       dense_lead=1, gating=2),
    "dots1": dict(moe=True, moe_probs_b=True, dense_lead=1, ew_norm=True),
    "bailingmoe": dict(moe=True, moe_shexp=True, dense_lead=1,
                       ew_scale=2.0, ew_norm=True),
    "hunyuan-moe": dict(moe=True, moe_shexp=True),
    "granitemoe": dict(moe=True, residual_scale=0.5),
    # jais2: biases on attn output + up/down MLP (src/models/jais2.cpp)
    "jais2": dict(dense_bias=True),
    # pangu-embedded: only the attention output projection has a bias
    "pangu-embedded": dict(wo_bias=True),
    # minimax-m2: all-MoE, sigmoid routing with probs bias, flat qk norms
    "minimax-m2": dict(moe=True, moe_probs_b=True, gating=2,
                       qk_norm_flat=True),
    # grok-1: every-layer GELU MoE + parallel dense FFN, post norms under
    # grok's own tensor names (src/models/grok.cpp load_arch_tensors)
    "grok": dict(moe=True, moe_plus_dense=True, ff_exp=True, ew_norm=True,
                 post_attn_name="attn_output_norm"),
    # arctic: n_embd-wide dense MLP + parallel MoE with its own input norm
    "arctic": dict(moe=True, moe_plus_dense=True, dense_ff_embd=True,
                   ffn_norm_exps=True, ew_norm=True),
    # chameleon: per-head LAYERNORM q/k norms with bias
    "chameleon": dict(qk_norm_per_head_ln=True),
    # apertus: global per-layer xIELU activation parameter arrays
    "apertus": dict(xielu=True),
    # bailingmoe2: fused wqkv, dense lead, sigmoid router with probs bias,
    # shared expert (src/models/bailingmoe2.cpp)
    "bailingmoe2": dict(fused_qkv=True, moe=True, moe_probs_b=True,
                        moe_shexp=True, dense_lead=1, gating=2, ff_exp=True,
                        ew_norm=True),
    # grovemoe: adjugate chunk-expert banks + group keys
    "grovemoe": dict(moe=True, ff_exp=True, moe_chexps=2, ew_norm=True),
    # afmoe: attention gate projection, dual norms (afmoe tensor names),
    # iSWA 3:1, sigmoid MoE with REQUIRED probs bias + shared expert
    "afmoe": dict(moe=True, moe_probs_b=True, moe_shexp=True, dense_lead=1,
                  gating=2, ff_exp=True, attn_gate=True, swa=(32, 4),
                  post_attn_name="attn_post_norm",
                  post_ffn_name="ffn_post_norm"),
    # rnd1: qwen3moe tensor set in diffusion mode
    "rnd1": dict(moe=True, ff_exp=True),
    # qwen3vlmoe: qwen3moe tensor set (text side)
    "qwen3vlmoe": dict(moe=True, ff_exp=True, ew_norm=True),
    # bitnet: sub-norms + per-tensor scales, lm_head tied to tok_embd
    "bitnet": dict(sub_norms=True, no_output=True, tensor_scales=True),
}


def build_arch_gguf(path: str, arch: str, *, vocab_size: int = 256,
                    n_embd: int = 64, n_layer: int = 2, n_head: int = 4,
                    n_head_kv: int = 2, n_ff: int = 96,
                    qtype: GGMLType = GGMLType.Q8_0, seed: int = 0,
                    scale: float = 0.05) -> str:
    """Structurally-correct tiny checkpoint for ANY registry arch.

    Consults ARCH_REGISTRY flags + SYNTH_HINTS and writes exactly the
    tensors that arch's graph needs (biases, qk-norms, post-norms, MoE
    experts, sinks, ...) — the per-arch synthetic fixture behind the
    snapshot harness, mirroring the reference's tests/gguf-model-data.h +
    test-llama-archs.cpp."""
    from ..models.registry import get_arch

    flags = get_arch(arch)
    hints = SYNTH_HINTS.get(arch, {})
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", f"synth-{arch}")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length",
                 2 * n_ff if hints.get("double_ff") else n_ff)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.rope.dimension_count",
                 head_dim // hints.get("rope_frac", 1))
    w.add_float32(f"{arch}.rope.freq_base", 10000.0)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_float32(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if hints.get("swa_layers"):  # explicit per-layer 0/1 SWA array
        w.add_uint32(f"{arch}.attention.sliding_window", 32)
        w.add_array(f"{arch}.attention.sliding_window_pattern",
                    np.asarray(hints["swa_layers"][:n_layer], np.uint32))
        w.add_float32(f"{arch}.rope.freq_base_swa", 10000.0)
    elif hints.get("swa"):
        win, pat = hints["swa"]
        w.add_uint32(f"{arch}.attention.sliding_window", win)
        w.add_uint32(f"{arch}.attention.sliding_window_pattern", pat)
    elif flags.get("swa_pattern", 1) > 1 or arch == "cohere2":
        w.add_uint32(f"{arch}.attention.sliding_window", 32)
    if hints.get("alibi"):
        w.add_float32(f"{arch}.attention.max_alibi_bias", hints["alibi"])
    if hints.get("clamp"):
        w.add_float32(f"{arch}.attention.clamp_kqv", hints["clamp"])
    if hints.get("logit_scale"):
        w.add_float32(f"{arch}.logit_scale", hints["logit_scale"])
    if hints.get("attn_scale_kv"):
        w.add_float32(f"{arch}.attention.scale", hints["attn_scale_kv"])
    if hints.get("value_scale"):  # mimo2 attention.value_scale
        w.add_float32(f"{arch}.attention.value_scale", hints["value_scale"])
    if hints.get("residual_scale"):
        w.add_float32(f"{arch}.residual_scale", hints["residual_scale"])
    moe = hints.get("moe", arch.endswith("moe") or arch in ("mixtral", "dbrx"))
    n_expert = 4 if moe else 0
    dense_lead = hints.get("dense_lead", 0)
    if moe:
        w.add_uint32(f"{arch}.expert_count", n_expert)
        w.add_uint32(f"{arch}.expert_used_count", 2)
        if hints.get("ff_exp"):
            w.add_uint32(f"{arch}.expert_feed_forward_length", n_ff)
        if dense_lead:
            w.add_uint32(f"{arch}.leading_dense_block_count", dense_lead)
        if hints.get("gating"):
            w.add_uint32(f"{arch}.expert_gating_func", hints["gating"])
        if hints.get("ew_scale"):
            w.add_float32(f"{arch}.expert_weights_scale", hints["ew_scale"])
        if hints.get("ew_norm"):
            w.add_bool(f"{arch}.expert_weights_norm", True)
    if flags.get("diffusion"):
        # diffusion LMs need a MASK token + the logit-shift switch; the
        # pass-through chat template keeps the reference diffusion-cli
        # (which always formats) off chatml specials the toy vocab lacks
        w.add_uint32("tokenizer.ggml.mask_token_id", vocab_size - 1)
        w.add_bool("diffusion.shift_logits", True)
        w.add_string("tokenizer.chat_template",
                     "{% for m in messages %}{{ m['content'] }}"
                     "{% endfor %}")
    if hints.get("xielu"):  # apertus per-layer activation parameters
        w.add_array("xielu.alpha_n", (0.8 + 0.02 * np.arange(n_layer)).astype(np.float32))
        w.add_array("xielu.alpha_p", (0.8 - 0.01 * np.arange(n_layer)).astype(np.float32))
        w.add_array("xielu.beta", np.full(n_layer, 0.5, np.float32))
        w.add_array("xielu.eps", np.full(n_layer, -1e-6, np.float32))
    if hints.get("moe_chexps"):
        w.add_uint32(f"{arch}.experts_per_group", hints["moe_chexps"])
        w.add_float32(f"{arch}.expert_group_scale", 0.05)
        w.add_uint32(f"{arch}.expert_chunk_feed_forward_length",
                     2 * n_ff if hints.get("double_ff") else n_ff)
    add_spm_toy_vocab(w, vocab_size)

    norm_type = flags.get("norm_type", "rmsnorm")
    ffn_gate = flags.get("ffn_gate", True)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def addq(name, arr):
        _add_quant_tensor(w, name, arr, qtype)

    weightless = hints.get("weightless_norm", False)

    def norm_pair(name, n):
        if weightless:  # olmo: build_norm with NULL weight/bias
            return
        w.add_tensor(name + ".weight", np.ones(n, np.float32) + rand(n))
        if norm_type == "layernorm" and not hints.get("norm_weight_only"):
            w.add_tensor(name + ".bias", rand(n))

    addq("token_embd.weight", rand(vocab_size, n_embd))
    if not hints.get("no_output"):
        addq("output.weight", rand(vocab_size, n_embd))
    norm_pair("output_norm", n_embd)
    if hints.get("pos_embd"):
        w.add_tensor("position_embd.weight", rand(512, n_embd))
    if hints.get("tok_norm"):
        w.add_tensor("token_embd_norm.weight",
                     np.ones(n_embd, np.float32) + rand(n_embd))
        w.add_tensor("token_embd_norm.bias", rand(n_embd))
    nqkv = (n_head + 2 * n_head_kv) * head_dim
    pre_norm = flags.get("pre_norm", True)
    for i in range(n_layer):
        p = f"blk.{i}."
        if pre_norm:
            norm_pair(p + "attn_norm", n_embd)
        if hints.get("attn_norm_2"):
            norm_pair(p + "attn_norm_2", n_embd)
        if pre_norm and (not flags.get("parallel_residual")
                         or hints.get("ffn_norm_parallel")):
            norm_pair(p + (hints.get("ffn_norm_name", "ffn_norm")) , n_embd)
        if hints.get("fused_qkv"):
            addq(p + "attn_qkv.weight", rand(nqkv, n_embd))
            if hints["fused_qkv"] == "bias":
                w.add_tensor(p + "attn_qkv.bias", rand(nqkv))
            addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
        else:
            # order matters: rand() consumption must match the committed
            # snapshots (q/k/v, output, THEN biases)
            addq(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
            addq(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
            if flags.get("attn_bias"):
                w.add_tensor(p + "attn_q.bias", rand(n_head * head_dim))
                w.add_tensor(p + "attn_k.bias", rand(n_head_kv * head_dim))
                w.add_tensor(p + "attn_v.bias", rand(n_head_kv * head_dim))
        if hints.get("dense_bias") or hints.get("wo_bias"):
            w.add_tensor(p + "attn_output.bias", rand(n_embd))
        if hints.get("sub_norms"):
            w.add_tensor(p + "attn_sub_norm.weight",
                         np.ones(n_embd, np.float32) + rand(n_embd))
            w.add_tensor(p + "ffn_sub_norm.weight",
                         np.ones(n_ff, np.float32) + rand(n_ff))
        if hints.get("tensor_scales"):
            for t in ("attn_q", "attn_k", "attn_v", "attn_output",
                      "ffn_gate", "ffn_up", "ffn_down"):
                w.add_tensor(p + t + ".scale",
                             np.full(1, 0.9 + 0.05 * i, np.float32))
        if hints.get("attn_gate"):  # afmoe: attn output gate projection
            addq(p + "attn_gate.weight", rand(n_head * head_dim, n_embd))
        if hints.get("qk_norm_per_head_ln"):
            # chameleon: (head_dim, n_head) LAYERNORM weights + biases
            w.add_tensor(p + "attn_q_norm.weight",
                         np.ones((n_head, head_dim), np.float32)
                         + rand(n_head, head_dim))
            w.add_tensor(p + "attn_q_norm.bias", rand(n_head, head_dim))
            w.add_tensor(p + "attn_k_norm.weight",
                         np.ones((n_head_kv, head_dim), np.float32)
                         + rand(n_head_kv, head_dim))
            w.add_tensor(p + "attn_k_norm.bias", rand(n_head_kv, head_dim))
        elif flags.get("attn_qk_norm"):
            w.add_tensor(p + "attn_q_norm.weight",
                         np.ones(head_dim, np.float32) + rand(head_dim))
            w.add_tensor(p + "attn_k_norm.weight",
                         np.ones(head_dim, np.float32) + rand(head_dim))
        if hints.get("qk_norm_flat"):  # mpt qk_ln / olmoe: flat-row norms
            w.add_tensor(p + "attn_q_norm.weight",
                         np.ones(n_head * head_dim, np.float32)
                         + rand(n_head * head_dim))
            w.add_tensor(p + "attn_k_norm.weight",
                         np.ones(n_head_kv * head_dim, np.float32)
                         + rand(n_head_kv * head_dim))
            if norm_type == "layernorm":
                w.add_tensor(p + "attn_q_norm.bias", rand(n_head * head_dim))
                w.add_tensor(p + "attn_k_norm.bias",
                             rand(n_head_kv * head_dim))
        if flags.get("post_norms"):
            if hints.get("bare_post_norms"):
                # plamo3: 2-arg tn() -> NO .weight suffix (plamo3.cpp:52)
                w.add_tensor(p + "post_attention_norm",
                             np.ones(n_embd, np.float32) + rand(n_embd))
                w.add_tensor(p + "post_ffw_norm",
                             np.ones(n_embd, np.float32) + rand(n_embd))
            else:
                norm_pair(p + hints.get("post_attn_name",
                                        "post_attention_norm"), n_embd)
                norm_pair(p + hints.get("post_ffn_name", "post_ffw_norm"),
                          n_embd)
        if arch == "gpt-oss" or hints.get("sinks"):
            w.add_tensor(p + "attn_sinks.weight", rand(n_head) * 4.0)
        if hints.get("attn_gate_head"):  # step35 per-head g_proj
            addq(p + "attn_gate.weight", rand(n_head, n_embd))
        if hints.get("visexp"):  # cogvlm vision-expert weight set
            addq(p + "vis_attn_qkv.weight", rand(3 * n_head * head_dim,
                                                 n_embd))
            addq(p + "vis_attn_output.weight",
                 rand(n_embd, n_head * head_dim))
            addq(p + "vis_gate.weight", rand(n_ff, n_embd))
            addq(p + "vis_up.weight", rand(n_ff, n_embd))
            addq(p + "vis_down.weight", rand(n_embd, n_ff))
        if moe and i >= dense_lead:
            w.add_tensor(p + "ffn_gate_inp.weight", rand(n_expert, n_embd))
            _add_quant_tensor(w, p + "ffn_gate_exps.weight",
                              rand(n_expert, n_ff, n_embd), qtype)
            _add_quant_tensor(w, p + "ffn_up_exps.weight",
                              rand(n_expert, n_ff, n_embd), qtype)
            _add_quant_tensor(w, p + "ffn_down_exps.weight",
                              rand(n_expert, n_embd, n_ff), qtype)
            if hints.get("moe_probs_b"):
                w.add_tensor(p + "exp_probs_b.bias", rand(n_expert))
            if hints.get("moe_shexp"):
                addq(p + "ffn_gate_shexp.weight", rand(n_ff, n_embd))
                addq(p + "ffn_up_shexp.weight", rand(n_ff, n_embd))
                addq(p + "ffn_down_shexp.weight", rand(n_embd, n_ff))
            if hints.get("moe_chexps"):
                n_chunk = n_expert // hints["moe_chexps"]
                _add_quant_tensor(w, p + "ffn_gate_chexps.weight",
                                  rand(n_chunk, n_ff, n_embd), qtype)
                _add_quant_tensor(w, p + "ffn_up_chexps.weight",
                                  rand(n_chunk, n_ff, n_embd), qtype)
                _add_quant_tensor(w, p + "ffn_down_chexps.weight",
                                  rand(n_chunk, n_embd, n_ff), qtype)
            if hints.get("moe_plus_dense"):
                dff = n_embd if hints.get("dense_ff_embd") else n_ff
                addq(p + "ffn_gate.weight", rand(dff, n_embd))
                addq(p + "ffn_up.weight", rand(dff, n_embd))
                addq(p + "ffn_down.weight", rand(n_embd, dff))
                if hints.get("ffn_norm_exps"):
                    w.add_tensor(p + "ffn_norm_exps.weight",
                                 np.ones(n_embd, np.float32) + rand(n_embd))
        elif hints.get("combined_gateup"):  # chatglm: one [gate;up] tensor
            addq(p + "ffn_up.weight", rand(2 * n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
        elif ffn_gate:
            addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
            if hints.get("gate_bias"):
                w.add_tensor(p + "ffn_gate.bias", rand(n_ff))
        else:
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
        if hints.get("dense_bias"):
            w.add_tensor(p + "ffn_up.bias", rand(n_ff))
            w.add_tensor(p + "ffn_down.bias", rand(n_embd))
    w.write()
    return path


def build_jamba_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_layer: int = 4,
    attn_every: int = 4,  # layer i is attention iff (i % attn_every) == 1
    n_head: int = 4,
    n_head_kv: int = 2,
    d_state: int = 16,
    d_conv: int = 4,
    n_ff: int = 96,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
    with_vocab: bool = True,
) -> str:
    """Synthetic Jamba (hybrid attention+mamba) checkpoint.

    Per-layer head_count_kv ARRAY with zeros on recurrent layers selects the
    family (src/models/jamba.cpp:12); every layer carries the shared
    attn_norm/ffn_norm/FFN, attention layers add wq/wk/wv/wo, mamba layers
    the ssm_* set."""
    rng = np.random.default_rng(seed)
    d_inner = 2 * n_embd
    dt_rank = max(1, (n_embd + 15) // 16)
    head_dim = n_embd // n_head
    arch = "jamba"
    kv_pattern = [n_head_kv if (i % attn_every) == 1 else 0
                  for i in range(n_layer)]
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-jamba")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray(kv_pattern, np.uint32))
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_uint32(f"{arch}.ssm.inner_size", d_inner)
    w.add_uint32(f"{arch}.ssm.state_size", d_state)
    w.add_uint32(f"{arch}.ssm.time_step_rank", dt_rank)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if with_vocab:
        add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr)

    def addq(name, arr):
        _add_quant_tensor(w, name, arr, qtype) if qtype not in (
            GGMLType.F32,) else w.add_tensor(name, arr)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    add("output_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    for i in range(n_layer):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        add(p + "ffn_norm.weight", np.ones(n_embd, np.float32) + rand(n_embd))
        if kv_pattern[i] > 0:
            addq(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
            addq(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd))
            addq(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
        else:
            addq(p + "ssm_in.weight", rand(2 * d_inner, n_embd))
            add(p + "ssm_conv1d.weight", rand(d_inner, d_conv))
            add(p + "ssm_conv1d.bias", rand(d_inner))
            addq(p + "ssm_x.weight", rand(dt_rank + 2 * d_state, d_inner))
            addq(p + "ssm_dt.weight", rand(d_inner, dt_rank))
            add(p + "ssm_dt.bias", rand(d_inner) + 0.5)
            add(p + "ssm_a", -np.exp(rand(d_inner, d_state)))
            add(p + "ssm_d", np.ones(d_inner, np.float32) + rand(d_inner))
            addq(p + "ssm_out.weight", rand(n_embd, d_inner))
        addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
        addq(p + "ffn_up.weight", rand(n_ff, n_embd))
        addq(p + "ffn_down.weight", rand(n_embd, n_ff))
    w.write()
    return path


def build_rwkv7_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_layer: int = 2,
    head_size: int = 16,
    lora_decay: int = 16,
    lora_iclr: int = 16,
    lora_gate: int = 16,
    n_ff: int = 128,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
    with_vocab: bool = True,
) -> str:
    """Synthetic RWKV7 checkpoint (tensor set per src/models/rwkv7.cpp
    load_arch_tensors; equal LoRA ranks so layer 0's v0/v1/v2 stack with the
    rest)."""
    rng = np.random.default_rng(seed)
    arch = "rwkv7"
    C = n_embd
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-rwkv7")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", C)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.attention.head_count", 0)
    w.add_uint32(f"{arch}.wkv.head_size", head_size)
    w.add_uint32(f"{arch}.attention.decay_lora_rank", lora_decay)
    w.add_uint32(f"{arch}.attention.iclr_lora_rank", lora_iclr)
    w.add_uint32(f"{arch}.attention.value_residual_mix_lora_rank", lora_iclr)
    w.add_uint32(f"{arch}.attention.gate_lora_rank", lora_gate)
    w.add_uint32(f"{arch}.token_shift_count", 2)
    w.add_float32(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if with_vocab:
        add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, C))
    add("token_embd_norm.weight", np.ones(C, np.float32) + rand(C))
    add("token_embd_norm.bias", rand(C))
    addq("output.weight", rand(vocab_size, C))
    add("output_norm.weight", np.ones(C, np.float32) + rand(C))
    add("output_norm.bias", rand(C))
    for i in range(n_layer):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", np.ones(C, np.float32) + rand(C))
        add(p + "attn_norm.bias", rand(C))
        add(p + "attn_norm_2.weight", np.ones(C, np.float32) + rand(C))
        add(p + "attn_norm_2.bias", rand(C))
        add(p + "time_mix_w0.weight", rand(C))
        add(p + "time_mix_w1.weight", rand(lora_decay, C))
        add(p + "time_mix_w2.weight", rand(C, lora_decay))
        add(p + "time_mix_a0.weight", rand(C))
        add(p + "time_mix_a1.weight", rand(lora_iclr, C))
        add(p + "time_mix_a2.weight", rand(C, lora_iclr))
        add(p + "time_mix_v0.weight", rand(C))
        add(p + "time_mix_v1.weight", rand(lora_iclr, C))
        add(p + "time_mix_v2.weight", rand(C, lora_iclr))
        add(p + "time_mix_g1.weight", rand(lora_gate, C))
        add(p + "time_mix_g2.weight", rand(C, lora_gate))
        add(p + "time_mix_lerp_fused.weight",
            rand(6, 1, 1, C) * 0.5 + 0.5)
        add(p + "time_mix_k_k.weight", rand(C) + 0.8)
        add(p + "time_mix_k_a.weight", rand(C) + 0.8)
        add(p + "time_mix_r_k.weight", rand(C))
        addq(p + "time_mix_key.weight", rand(C, C))
        addq(p + "time_mix_value.weight", rand(C, C))
        addq(p + "time_mix_receptance.weight", rand(C, C))
        add(p + "time_mix_ln.weight", np.ones(C, np.float32) + rand(C))
        add(p + "time_mix_ln.bias", rand(C))
        addq(p + "time_mix_output.weight", rand(C, C))
        add(p + "channel_mix_lerp_k.weight", rand(1, 1, C) * 0.5 + 0.5)
        addq(p + "channel_mix_key.weight", rand(n_ff, C))
        addq(p + "channel_mix_value.weight", rand(C, n_ff))
    w.write()
    return path


def build_rwkv6_gguf(
    path: str,
    *,
    arch: str = "rwkv6",
    vocab_size: int = 256,
    n_embd: int = 64,
    n_layer: int = 2,
    head_size: int = 16,
    n_head_kv: int = 0,  # rwkv6qwen2 GQA (0: full heads)
    mix_extra: int = 16,
    decay_extra: int = 16,
    n_ff: int = 128,
    rescale_every: int = 0,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
    with_vocab: bool = True,
) -> str:
    """Synthetic RWKV6 / rwkv6qwen2 checkpoint (tensor sets per
    src/models/rwkv6.cpp and rwkv6qwen2.cpp load_arch_tensors)."""
    rng = np.random.default_rng(seed)
    C = n_embd
    H = C // head_size
    qrwkv = arch == "rwkv6qwen2"
    kv_size = (n_head_kv or H) * head_size
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", f"synth-{arch}")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", C)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.attention.head_count", H if qrwkv else 0)
    if qrwkv and n_head_kv:
        w.add_uint32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_uint32(f"{arch}.wkv.head_size", head_size)
    w.add_uint32(f"{arch}.time_mix_extra_dim", mix_extra)
    w.add_uint32(f"{arch}.time_decay_extra_dim", decay_extra)
    w.add_uint32(f"{arch}.token_shift_count", 1 if qrwkv else 2)
    if rescale_every:
        w.add_uint32(f"{arch}.rescale_every_n_layers", rescale_every)
    w.add_float32(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if with_vocab:
        add_spm_toy_vocab(w, vocab_size)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, C))
    if not qrwkv:
        add("token_embd_norm.weight", np.ones(C, np.float32) + rand(C))
        add("token_embd_norm.bias", rand(C))
    addq("output.weight", rand(vocab_size, C))
    add("output_norm.weight", np.ones(C, np.float32) + rand(C))
    if not qrwkv:
        add("output_norm.bias", rand(C))
    for i in range(n_layer):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", np.ones(C, np.float32) + rand(C))
        if not qrwkv:
            add(p + "attn_norm.bias", rand(C))
            add(p + "attn_norm_2.weight", np.ones(C, np.float32) + rand(C))
            add(p + "attn_norm_2.bias", rand(C))
        add(p + "time_mix_w1.weight", rand(mix_extra * 5, C))
        add(p + "time_mix_w2.weight", rand(5, C, mix_extra))
        add(p + "time_mix_lerp_x.weight", rand(1, 1, C) * 0.5 + 0.5)
        add(p + "time_mix_lerp_fused.weight", rand(5, 1, 1, C) * 0.5 + 0.5)
        if not qrwkv:
            add(p + "time_mix_first.weight", rand(H, head_size))
        add(p + "time_mix_decay.weight", rand(C))
        add(p + "time_mix_decay_w1.weight", rand(decay_extra, C))
        add(p + "time_mix_decay_w2.weight", rand(C, decay_extra))
        addq(p + "time_mix_key.weight", rand(kv_size, C))
        addq(p + "time_mix_value.weight", rand(kv_size, C))
        addq(p + "time_mix_receptance.weight", rand(C, C))
        addq(p + "time_mix_gate.weight", rand(C, C))
        if qrwkv:
            add(p + "time_mix_key.bias", rand(kv_size))
            add(p + "time_mix_value.bias", rand(kv_size))
            add(p + "time_mix_receptance.bias", rand(C))
        else:
            add(p + "time_mix_ln.weight", np.ones(C, np.float32) + rand(C))
            add(p + "time_mix_ln.bias", rand(C))
        addq(p + "time_mix_output.weight", rand(C, C))
        if qrwkv:
            add(p + "ffn_norm.weight", np.ones(C, np.float32) + rand(C))
            addq(p + "ffn_gate.weight", rand(n_ff, C))
            addq(p + "ffn_up.weight", rand(n_ff, C))
            addq(p + "ffn_down.weight", rand(C, n_ff))
        else:
            add(p + "channel_mix_lerp_k.weight", rand(1, 1, C) * 0.5 + 0.5)
            add(p + "channel_mix_lerp_r.weight", rand(1, 1, C) * 0.5 + 0.5)
            addq(p + "channel_mix_key.weight", rand(n_ff, C))
            addq(p + "channel_mix_receptance.weight", rand(C, C))
            addq(p + "channel_mix_value.weight", rand(C, n_ff))
    w.write()
    return path


def build_t5_gguf(
    path: str,
    *,
    vocab_size: int = 256,
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_ff: int = 96,
    n_buckets: int = 32,
    gated: bool = True,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    scale: float = 0.05,
    with_vocab: bool = True,
) -> str:
    """Synthetic T5 encoder-decoder checkpoint (enc.blk.*/dec.blk.* tensor
    names per src/models/t5.cpp; rel-pos bias table on layer 0 only, as real
    converts emit)."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    arch = "t5"
    w = GGUFWriter(path, arch=arch)
    w.add_string("general.name", "synth-t5")
    w.add_uint32(f"{arch}.context_length", 512)
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", n_layer)
    w.add_uint32(f"{arch}.decoder_block_count", n_layer)
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv", n_head)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.attention.relative_buckets_count", n_buckets)
    w.add_uint32(f"{arch}.decoder_start_token_id", 1)
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_uint32(f"{arch}.vocab_size", vocab_size)
    if with_vocab:
        # UGM (t5) vocab: scores + the SPM-toy pieces reused
        add_spm_toy_vocab(w, vocab_size)
        # overwrite model name for the UGM tokenizer
        w.add_string("tokenizer.ggml.model", "t5")
        w.add_array("tokenizer.ggml.scores",
                    -np.abs(rng.normal(2, 1, vocab_size)).astype(np.float32))
        w.add_bool("tokenizer.ggml.add_bos_token", False)
        w.add_bool("tokenizer.ggml.add_eos_token", True)

    def rand(*shape):
        return (rng.normal(0, scale, size=shape)).astype(np.float32)

    def addq(name, arr):
        if qtype == GGMLType.F32:
            w.add_tensor(name, arr)
        else:
            _add_quant_tensor(w, name, arr, qtype)

    addq("token_embd.weight", rand(vocab_size, n_embd))
    addq("output.weight", rand(vocab_size, n_embd))
    w.add_tensor("enc.output_norm.weight",
                 np.ones(n_embd, np.float32) + rand(n_embd))
    w.add_tensor("dec.output_norm.weight",
                 np.ones(n_embd, np.float32) + rand(n_embd))
    for prefix in ("enc", "dec"):
        for i in range(n_layer):
            p = f"{prefix}.blk.{i}."
            w.add_tensor(p + "attn_norm.weight",
                         np.ones(n_embd, np.float32) + rand(n_embd))
            w.add_tensor(p + "ffn_norm.weight",
                         np.ones(n_embd, np.float32) + rand(n_embd))
            addq(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
            addq(p + "attn_k.weight", rand(n_head * head_dim, n_embd))
            addq(p + "attn_v.weight", rand(n_head * head_dim, n_embd))
            addq(p + "attn_o.weight", rand(n_embd, n_head * head_dim))
            if i == 0:
                w.add_tensor(p + "attn_rel_b.weight",
                             rand(n_buckets, n_head))
            if prefix == "dec":
                w.add_tensor(p + "cross_attn_norm.weight",
                             np.ones(n_embd, np.float32) + rand(n_embd))
                addq(p + "cross_attn_q.weight", rand(n_head * head_dim, n_embd))
                addq(p + "cross_attn_k.weight", rand(n_head * head_dim, n_embd))
                addq(p + "cross_attn_v.weight", rand(n_head * head_dim, n_embd))
                addq(p + "cross_attn_o.weight", rand(n_embd, n_head * head_dim))
            if gated:
                addq(p + "ffn_gate.weight", rand(n_ff, n_embd))
            addq(p + "ffn_up.weight", rand(n_ff, n_embd))
            addq(p + "ffn_down.weight", rand(n_embd, n_ff))
    w.write()
    return path


def build_audio_mmproj_gguf(
    path: str,
    proj: str = "ultravox",
    n_embd: int = 32,
    n_ff: int = 48,
    n_layer: int = 2,
    n_head: int = 4,
    n_mel: int = 16,
    stack_factor: int = 4,
    lm_embd: int = 64,
    max_pos: int = 1500,
    seed: int = 7,
) -> str:
    """Fabricate a whisper-style audio mmproj GGUF (clip-impl.h audio
    schema: clip.audio.* keys + a.* tensors)."""
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    w = GGUFWriter(path, arch="clip")
    w.add_bool("clip.has_audio_encoder", True)
    w.add_string("clip.projector_type", proj)
    w.add_uint32("clip.audio.embedding_length", n_embd)
    w.add_uint32("clip.audio.feed_forward_length", n_ff)
    w.add_uint32("clip.audio.block_count", n_layer)
    w.add_uint32("clip.audio.attention.head_count", n_head)
    w.add_uint32("clip.audio.num_mel_bins", n_mel)
    if proj == "ultravox":
        w.add_uint32("clip.audio.projector.stack_factor", stack_factor)
    w.add_float32("clip.audio.attention.layer_norm_epsilon", 1e-5)

    w.add_tensor("a.conv1d.1.weight", rand(n_embd, n_mel, 3))
    w.add_tensor("a.conv1d.1.bias", rand(n_embd))
    w.add_tensor("a.conv1d.2.weight", rand(n_embd, n_embd, 3))
    w.add_tensor("a.conv1d.2.bias", rand(n_embd))
    w.add_tensor("a.position_embd.weight", rand(max_pos, n_embd))
    for i in range(n_layer):
        p = f"a.blk.{i}."
        for ln in ("ln1", "ln2"):
            w.add_tensor(p + ln + ".weight",
                         np.ones(n_embd, np.float32) + rand(n_embd))
            w.add_tensor(p + ln + ".bias", rand(n_embd))
        w.add_tensor(p + "attn_q.weight", rand(n_embd, n_embd))
        w.add_tensor(p + "attn_q.bias", rand(n_embd))
        w.add_tensor(p + "attn_k.weight", rand(n_embd, n_embd))
        w.add_tensor(p + "attn_v.weight", rand(n_embd, n_embd))
        w.add_tensor(p + "attn_v.bias", rand(n_embd))
        w.add_tensor(p + "attn_out.weight", rand(n_embd, n_embd))
        w.add_tensor(p + "attn_out.bias", rand(n_embd))
        w.add_tensor(p + "ffn_up.weight", rand(n_ff, n_embd))
        w.add_tensor(p + "ffn_up.bias", rand(n_ff))
        w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff))
        w.add_tensor(p + "ffn_down.bias", rand(n_embd))
    w.add_tensor("a.post_ln.weight", np.ones(n_embd, np.float32) + rand(n_embd))
    w.add_tensor("a.post_ln.bias", rand(n_embd))
    if proj == "ultravox":
        mid = 2 * lm_embd
        w.add_tensor("mm.a.norm_pre.weight",
                     np.ones(n_embd * stack_factor, np.float32)
                     + rand(n_embd * stack_factor))
        w.add_tensor("mm.a.mlp.1.weight", rand(2 * mid, n_embd * stack_factor))
        w.add_tensor("mm.a.norm_mid.weight",
                     np.ones(mid, np.float32) + rand(mid))
        w.add_tensor("mm.a.mlp.2.weight", rand(lm_embd, mid))
    elif proj == "qwen2a":
        w.add_tensor("mm.a.fc.weight", rand(lm_embd, n_embd))
        w.add_tensor("mm.a.fc.bias", rand(lm_embd))
    w.write()
    return path


def build_mmproj_gguf(
    path: str,
    proj: str = "mlp",
    n_embd: int = 32,
    n_ff: int = 48,
    n_layer: int = 2,
    n_head: int = 4,
    image_size: int = 24,
    patch_size: int = 8,
    lm_embd: int = 64,
    n_merge: int = 1,
    class_embd: bool | None = None,
    seed: int = 7,
) -> str:
    """Fabricate a vision mmproj GGUF (tools/mtmd/clip-impl.h schema)."""
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    if class_embd is None:
        class_embd = proj in ("mlp", "mlp_norm")  # CLIP-style towers
    w = GGUFWriter(path, arch="clip")
    w.add_kv("clip.projector_type", proj)
    w.add_kv("clip.has_vision_encoder", True)
    w.add_uint32("clip.vision.embedding_length", n_embd)
    w.add_uint32("clip.vision.feed_forward_length", n_ff)
    w.add_uint32("clip.vision.block_count", n_layer)
    w.add_uint32("clip.vision.attention.head_count", n_head)
    w.add_uint32("clip.vision.image_size", image_size)
    w.add_uint32("clip.vision.patch_size", patch_size)
    w.add_uint32("clip.vision.projection_dim", lm_embd)
    w.add_float32("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.use_gelu", proj in ("mlp", "mlp_norm"))
    if n_merge > 1:
        w.add_uint32("clip.vision.projector.scale_factor", n_merge)
    w.add_array("clip.vision.image_mean", np.float32([0.5, 0.5, 0.5]))
    w.add_array("clip.vision.image_std", np.float32([0.5, 0.5, 0.5]))

    side = image_size // patch_size
    n_pos = side * side + (1 if class_embd else 0)
    w.add_tensor("v.patch_embd.weight", rand(n_embd, 3, patch_size, patch_size))
    w.add_tensor("v.patch_embd.bias", rand(n_embd))
    if class_embd:
        w.add_tensor("v.class_embd", rand(n_embd))
    w.add_tensor("v.position_embd.weight", rand(n_pos, n_embd))
    w.add_tensor("v.pre_ln.weight", 1 + rand(n_embd))
    w.add_tensor("v.pre_ln.bias", rand(n_embd))
    w.add_tensor("v.post_ln.weight", 1 + rand(n_embd))
    w.add_tensor("v.post_ln.bias", rand(n_embd))
    for i in range(n_layer):
        p = f"v.blk.{i}."
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", rand(n_embd, n_embd))
            w.add_tensor(p + nm + ".bias", rand(n_embd))
        for nm in ("ln1", "ln2"):
            w.add_tensor(p + nm + ".weight", 1 + rand(n_embd))
            w.add_tensor(p + nm + ".bias", rand(n_embd))
        w.add_tensor(p + "ffn_up.weight", rand(n_ff, n_embd))
        w.add_tensor(p + "ffn_up.bias", rand(n_ff))
        w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff))
        w.add_tensor(p + "ffn_down.bias", rand(n_embd))

    if proj == "mlp":
        w.add_tensor("mm.0.weight", rand(lm_embd, n_embd))
        w.add_tensor("mm.0.bias", rand(lm_embd))
        w.add_tensor("mm.2.weight", rand(lm_embd, lm_embd))
        w.add_tensor("mm.2.bias", rand(lm_embd))
    elif proj == "mlp_norm":
        w.add_tensor("mm.0.weight", rand(lm_embd, n_embd))
        w.add_tensor("mm.0.bias", rand(lm_embd))
        w.add_tensor("mm.1.weight", 1 + rand(lm_embd))
        w.add_tensor("mm.1.bias", rand(lm_embd))
        w.add_tensor("mm.3.weight", rand(lm_embd, lm_embd))
        w.add_tensor("mm.3.bias", rand(lm_embd))
        w.add_tensor("mm.4.weight", 1 + rand(lm_embd))
        w.add_tensor("mm.4.bias", rand(lm_embd))
    elif proj == "gemma3":
        w.add_tensor("mm.soft_emb_norm.weight", 1 + rand(n_embd))
        w.add_tensor("mm.input_projection.weight", rand(n_embd, lm_embd))
    elif proj == "idefics3":
        w.add_tensor("mm.model.fc.weight",
                     rand(lm_embd, n_embd * n_merge * n_merge))
    elif proj == "internvl":
        m = n_embd * n_merge * n_merge
        w.add_tensor("mm.0.weight", 1 + rand(m))
        w.add_tensor("mm.0.bias", rand(m))
        w.add_tensor("mm.1.weight", rand(lm_embd, m))
        w.add_tensor("mm.1.bias", rand(lm_embd))
        w.add_tensor("mm.3.weight", rand(lm_embd, lm_embd))
        w.add_tensor("mm.3.bias", rand(lm_embd))
    else:
        raise ValueError(proj)
    w.write()
    return path
