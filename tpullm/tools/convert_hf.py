"""HF checkpoint -> GGUF converter (convert_hf_to_gguf.py analogue).

The reference ships a 14k-LoC Python converter covering ~180 model classes;
this is the same role built on tpullm's own GGUF writer, covering the
llama-family architectures the engine serves (llama/mistral/qwen2/qwen3/
gemma/gemma2/phi3/stablelm...). Pure numpy: safetensors is parsed directly
(8-byte header length + JSON directory + raw blob), no torch needed.

Key conversion semantics (matching the reference converter):
- llama-family q/k projections are PERMUTED from HF's half-split rotary
  layout to ggml's interleaved ("norm") rope order
  (convert_hf_to_gguf.py LlamaModel.permute); neox-rope archs (qwen2...)
  are copied as-is
- BPE tokenizers convert from tokenizer.json (vocab + merges); the
  pre-tokenizer is recorded via tokenizer.ggml.pre
- weights quantize to --outtype (f32/f16/bf16/q8_0/q4_k/q5_k/q6_k...)

Usage:
  python -m tpullm.tools.convert_hf /path/to/hf_dir -o model.gguf \
         [--outtype f16]
"""
from __future__ import annotations

import argparse
import json
import os
import struct
import sys

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter

_ST_DTYPES = {
    "F32": np.float32, "F16": np.float16, "BF16": np.uint16,
    "I32": np.int32, "I64": np.int64, "U8": np.uint8, "I8": np.int8,
    "F64": np.float64,
}


def read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Parse a .safetensors file with numpy (bf16 upcast to f32)."""
    out = {}
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(n))
        base = 8 + n
        data = np.memmap(path, np.uint8, mode="r")
        for name, info in header.items():
            if name == "__metadata__":
                continue
            s, e = info["data_offsets"]
            raw = np.asarray(data[base + s: base + e])
            dt = _ST_DTYPES[info["dtype"]]
            arr = raw.view(dt).reshape(info["shape"])
            if info["dtype"] == "BF16":
                arr = (arr.astype(np.uint32) << 16).view(np.float32)
            out[name] = np.ascontiguousarray(arr)
    return out


def write_safetensors(path: str, tensors: dict[str, np.ndarray]) -> None:
    """Minimal writer (tests fabricate HF checkpoints with it)."""
    header = {}
    off = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr, np.float32)
        b = arr.tobytes()
        header[name] = {"dtype": "F32", "shape": list(arr.shape),
                        "data_offsets": [off, off + len(b)]}
        off += len(b)
        blobs.append(b)
    hj = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for b in blobs:
            f.write(b)


def load_hf_weights(d: str) -> dict[str, np.ndarray]:
    idx = os.path.join(d, "model.safetensors.index.json")
    tensors: dict[str, np.ndarray] = {}
    if os.path.exists(idx):
        with open(idx) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        for s in shards:
            tensors.update(read_safetensors(os.path.join(d, s)))
    else:
        tensors.update(read_safetensors(os.path.join(d, "model.safetensors")))
    return tensors


# HF model_type -> gguf arch (the subset the engine serves)
_ARCHS = {
    "llama": "llama", "mistral": "llama", "qwen2": "qwen2", "qwen3": "qwen3",
    "gemma": "gemma", "gemma2": "gemma2", "gemma3_text": "gemma3",
    "phi3": "phi3", "stablelm": "stablelm", "mixtral": "mixtral",
    "olmo2": "olmo2",
}
# archs whose q/k need the HF->ggml rope permute (rope type "norm")
_PERMUTE = {"llama", "mistral", "mixtral"}

_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
}

_QTYPES = {
    "f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16,
    "q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0, "q4_k": GGMLType.Q4_K,
    "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K,
}


def _permute(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF half-split rotary rows -> ggml interleaved ("norm") rope order
    (convert_hf_to_gguf.py LlamaModel.permute)."""
    out, k = w.shape
    return (w.reshape(n_head, 2, out // n_head // 2, k)
            .swapaxes(1, 2).reshape(out, k))


def convert_tokenizer(w: GGUFWriter, d: str, cfg: dict) -> None:
    tj = os.path.join(d, "tokenizer.json")
    if not os.path.exists(tj):
        print("warning: no tokenizer.json — writing modelless vocab",
              file=sys.stderr)
        return
    with open(tj) as f:
        tk = json.load(f)
    model = tk.get("model", {})
    if model.get("type") != "BPE":
        print(f"warning: tokenizer type {model.get('type')} unsupported "
              "(only BPE from tokenizer.json); skipping vocab", file=sys.stderr)
        return
    vocab = model["vocab"]
    tokens = [None] * len(vocab)
    for t, i in vocab.items():
        tokens[i] = t
    added = {a["id"]: a for a in tk.get("added_tokens", [])}
    for i, a in added.items():
        if i >= len(tokens):
            tokens.extend([None] * (i + 1 - len(tokens)))
        tokens[i] = a["content"]
    ttype = [3 if (i in added and added[i].get("special")) else 1
             for i in range(len(tokens))]
    merges = [" ".join(m) if isinstance(m, list) else m
              for m in model.get("merges", [])]
    w.add_string("tokenizer.ggml.model", "gpt2")
    pre = {"llama": "llama-bpe", "mistral": "llama-bpe", "qwen2": "qwen2",
           "qwen3": "qwen2", "gemma": "default", "gemma2": "default",
           "phi3": "default"}.get(cfg.get("model_type"), "default")
    w.add_string("tokenizer.ggml.pre", pre)
    w.add_array("tokenizer.ggml.tokens", [t or "" for t in tokens])
    w.add_array("tokenizer.ggml.token_type", np.asarray(ttype, np.int32))
    w.add_array("tokenizer.ggml.merges", merges)
    for key, hf in (("bos_token_id", "bos_token_id"),
                    ("eos_token_id", "eos_token_id")):
        if cfg.get(hf) is not None:
            v = cfg[hf]
            w.add_kv(f"tokenizer.ggml.{key.split('_token')[0]}_token_id",
                     int(v[0] if isinstance(v, list) else v))


def convert(hf_dir: str, out_path: str, outtype: str = "f16") -> str:
    with open(os.path.join(hf_dir, "config.json")) as f:
        cfg = json.load(f)
    mt = cfg.get("model_type", "llama")
    if mt not in _ARCHS:
        raise SystemExit(f"unsupported model_type {mt!r} "
                         f"(supported: {sorted(_ARCHS)})")
    arch = _ARCHS[mt]
    qt = _QTYPES[outtype]
    n_head = int(cfg["num_attention_heads"])
    n_kv = int(cfg.get("num_key_value_heads", n_head))
    n_embd = int(cfg["hidden_size"])
    head_dim = int(cfg.get("head_dim", n_embd // n_head))

    w = GGUFWriter(out_path, arch=arch)
    w.add_string("general.name", cfg.get("_name_or_path", os.path.basename(
        os.path.abspath(hf_dir))))
    w.add_uint32(f"{arch}.context_length",
                 int(cfg.get("max_position_embeddings", 4096)))
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", int(cfg["num_hidden_layers"]))
    w.add_uint32(f"{arch}.feed_forward_length", int(cfg["intermediate_size"]))
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv", n_kv)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    w.add_uint32(f"{arch}.rope.dimension_count", head_dim)
    w.add_float32(f"{arch}.rope.freq_base",
                  float(cfg.get("rope_theta", 10000.0)))
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon",
                  float(cfg.get("rms_norm_eps", 1e-5)))
    w.add_uint32(f"{arch}.vocab_size", int(cfg["vocab_size"]))
    rs = cfg.get("rope_scaling") or {}
    if rs.get("rope_type") == "linear" or rs.get("type") == "linear":
        w.add_string(f"{arch}.rope.scaling.type", "linear")
        w.add_float32(f"{arch}.rope.scaling.factor", float(rs["factor"]))
    convert_tokenizer(w, hf_dir, cfg)

    tensors = load_hf_weights(hf_dir)
    permute = arch in _PERMUTE

    def addw(name, arr, quantize=True):
        from ..quant import quantize as q

        t = qt if (quantize and arr.ndim == 2
                   and arr.shape[-1] % 32 == 0) else GGMLType.F32
        raw = q(arr.astype(np.float32), t)
        w.add_tensor(name, raw.tobytes(), t, tuple(reversed(arr.shape)))

    addw("token_embd.weight", tensors["model.embed_tokens.weight"])
    if "lm_head.weight" in tensors:
        addw("output.weight", tensors["lm_head.weight"])
    addw("output_norm.weight", tensors["model.norm.weight"], quantize=False)
    n_layer = int(cfg["num_hidden_layers"])
    for i in range(n_layer):
        for hf_sfx, gg_sfx in _LAYER_MAP.items():
            name = f"model.layers.{i}.{hf_sfx}"
            if name not in tensors:
                continue
            arr = tensors[name]
            if permute and hf_sfx == "self_attn.q_proj.weight":
                arr = _permute(arr, n_head)
            elif permute and hf_sfx == "self_attn.k_proj.weight":
                arr = _permute(arr, n_kv)
            addw(f"blk.{i}.{gg_sfx}", arr,
                 quantize=gg_sfx.endswith("weight") and "norm" not in gg_sfx)
    w.write()
    print(f"wrote {out_path} ({arch}, {outtype})", file=sys.stderr)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.convert_hf")
    ap.add_argument("hf_dir", help="HF checkpoint directory")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--outtype", default="f16", choices=sorted(_QTYPES))
    args = ap.parse_args(argv)
    convert(args.hf_dir, args.out, args.outtype)


if __name__ == "__main__":
    main()
