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
    "qwen3_moe": "qwen3moe", "mixtral": "mixtral",
    "gemma": "gemma", "gemma2": "gemma2", "gemma3_text": "gemma3",
    "phi3": "phi3", "stablelm": "stablelm",
    "olmo2": "olmo2", "gpt_oss": "gpt-oss",
    "mamba": "mamba", "mamba2": "mamba2",
    # round-5 breadth (reference classes: convert_hf_to_gguf.py)
    "granite": "granite", "granitemoe": "granitemoe",
    "cohere": "command-r", "cohere2": "cohere2",
    "starcoder2": "starcoder2", "olmoe": "olmoe",
    "nemotron": "nemotron", "smollm3": "smollm3",
    "arcee": "arcee", "ernie4_5": "ernie4_5",
    "seed_oss": "seed_oss", "glm4": "glm4",
    "qwen2_moe": "qwen2moe", "exaone4": "exaone4",
    "phi": "phi2", "minicpm": "minicpm", "orion": "orion",
    "apertus": "apertus", "helium": "llama", "olmo3": "olmo2",
    "ernie4_5_moe": "ernie4_5-moe", "dots1": "dots1",
    "bitnet": "bitnet-b1.58",
}
# archs whose q/k need the HF->ggml rope permute: ggml "norm" (interleaved)
# rope order vs HF's half-split (convert_hf_to_gguf.py LlamaModel.permute).
# Derived from the engine's per-arch rope type at call time; this set covers
# archs registered with rope_type "norm".
_PERMUTE = {"llama", "mistral", "mixtral", "granite", "granitemoe",
            "smollm3", "arcee", "minicpm"}
# gemma-family RMSNorm stores (w) with output x*(1+w): GGUF adds the 1
# (convert_hf_to_gguf.py GemmaModel.modify_tensors); nemotron layernorm1p
# gets the same +1 fold (NemotronModel.modify_tensors)
_NORM_PLUS_ONE = {"gemma", "gemma2", "gemma3", "nemotron"}

_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.o_proj.bias": "attn_output.bias",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "self_attn.sinks": "attn_sinks.weight",
    "self_attn.qkv_proj.weight": "attn_qkv.weight",  # phi3 fused
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "mlp.gate_up_proj.weight": "ffn_up.weight",  # phi3 fused [gate; up]
    "mlp.gate.weight": "ffn_gate_inp.weight",  # qwen-moe router
    "mlp.router.weight": "ffn_gate_inp.weight",  # gpt-oss router
    "mlp.router.bias": "ffn_gate_inp.bias",
    "block_sparse_moe.gate.weight": "ffn_gate_inp.weight",  # mixtral
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
}
# gemma2/3: post_attention_layernorm is the POST-attention norm, the ffn
# norm is pre_feedforward_layernorm (convert_hf_to_gguf Gemma2Model)
_GEMMA2_OVERRIDES = {
    "post_attention_layernorm.weight": "post_attention_norm.weight",
}
# glm4: sandwich norms named post_self_attn/post_mlp (Glm4Model)
_GLM4_OVERRIDES = {
    "post_self_attn_layernorm.weight": "post_attention_norm.weight",
    "post_mlp_layernorm.weight": "post_ffw_norm.weight",
}
# phi2: parallel-residual block with dense/fc naming (Phi2Model); layernorm
# biases ride along via the generic .bias twin rule below
_PHI2_OVERRIDES = {
    "self_attn.dense.weight": "attn_output.weight",
    "self_attn.dense.bias": "attn_output.bias",
    "mlp.fc1.weight": "ffn_up.weight",
    "mlp.fc1.bias": "ffn_up.bias",
    "mlp.fc2.weight": "ffn_down.weight",
    "mlp.fc2.bias": "ffn_down.bias",
    "input_layernorm.bias": "attn_norm.bias",
}
# starcoder2: c_fc/c_proj MLP + layernorm biases (StarCoder2Model)
_SC2_OVERRIDES = {
    "mlp.c_fc.weight": "ffn_up.weight",
    "mlp.c_fc.bias": "ffn_up.bias",
    "mlp.c_proj.weight": "ffn_down.weight",
    "mlp.c_proj.bias": "ffn_down.bias",
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.bias": "ffn_norm.bias",
}
# qwen2moe/olmoe shared-expert block (Qwen2MoeModel)
_SHEXP_MAP = {
    "mlp.shared_expert.gate_proj.weight": "ffn_gate_shexp.weight",
    "mlp.shared_expert.up_proj.weight": "ffn_up_shexp.weight",
    "mlp.shared_expert.down_proj.weight": "ffn_down_shexp.weight",
    "mlp.shared_expert_gate.weight": "ffn_gate_inp_shexp.weight",
}
# per-expert tensors collected then stacked [n_expert, ...]
_EXPERT_MAP = {
    # qwen3moe
    "mlp.experts.{e}.gate_proj.weight": "ffn_gate_exps.weight",
    "mlp.experts.{e}.up_proj.weight": "ffn_up_exps.weight",
    "mlp.experts.{e}.down_proj.weight": "ffn_down_exps.weight",
    # mixtral
    "block_sparse_moe.experts.{e}.w1.weight": "ffn_gate_exps.weight",
    "block_sparse_moe.experts.{e}.w3.weight": "ffn_up_exps.weight",
    "block_sparse_moe.experts.{e}.w2.weight": "ffn_down_exps.weight",
}
# mamba/mamba2 (backbone.* namespace; src convert_hf_to_gguf MambaModel)
_MAMBA_MAP = {
    "mixer.in_proj.weight": "ssm_in.weight",
    "mixer.conv1d.weight": "ssm_conv1d.weight",
    "mixer.conv1d.bias": "ssm_conv1d.bias",
    "mixer.x_proj.weight": "ssm_x.weight",
    "mixer.dt_proj.weight": "ssm_dt.weight",
    "mixer.dt_proj.bias": "ssm_dt.bias",
    "mixer.dt_bias": "ssm_dt.bias",  # mamba2
    "mixer.A_log": "ssm_a",  # stored as log; engine applies -exp
    "mixer.D": "ssm_d",
    "mixer.norm.weight": "ssm_norm.weight",  # mamba2
    "mixer.out_proj.weight": "ssm_out.weight",
    "norm.weight": "attn_norm.weight",
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


def _convert_mamba(w, cfg, tensors, arch, addw):
    """backbone.* namespace -> mamba/mamba2 GGUF (convert_hf_to_gguf
    MambaModel / Mamba2Model)."""
    d_inner = int(cfg.get("intermediate_size")
                  or cfg.get("d_inner") or 2 * cfg["hidden_size"])
    d_conv = int(cfg.get("conv_kernel", cfg.get("d_conv", 4)))
    d_state = int(cfg.get("state_size", cfg.get("d_state", 16)))
    if arch == "mamba2":
        nh = int(cfg.get("n_heads", d_inner // int(cfg.get("head_dim", 64))))
        n_group = int(cfg.get("n_groups", 1))
        w.add_uint32(f"{arch}.ssm.time_step_rank", nh)
        w.add_uint32(f"{arch}.ssm.group_count", n_group)
        w.add_uint32(f"{arch}.attention.head_count", nh)
    else:
        dt_rank = cfg.get("time_step_rank")
        if dt_rank in (None, "auto"):
            dt_rank = (cfg["hidden_size"] + 15) // 16
        w.add_uint32(f"{arch}.ssm.time_step_rank", int(dt_rank))
        w.add_uint32(f"{arch}.attention.head_count", 0)
    w.add_uint32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_uint32(f"{arch}.ssm.inner_size", d_inner)
    w.add_uint32(f"{arch}.ssm.state_size", d_state)

    addw("token_embd.weight", tensors["backbone.embeddings.weight"])
    if "lm_head.weight" in tensors:
        addw("output.weight", tensors["lm_head.weight"])
    addw("output_norm.weight", tensors["backbone.norm_f.weight"],
         quantize=False)
    n_layer = int(cfg["num_hidden_layers"])
    for i in range(n_layer):
        for hf_sfx, gg_sfx in _MAMBA_MAP.items():
            name = f"backbone.layers.{i}.{hf_sfx}"
            if name not in tensors:
                continue
            arr = tensors[name].astype(np.float32)
            if hf_sfx == "mixer.A_log":
                arr = -np.exp(arr)
                if arr.ndim == 1:  # mamba2 per-head scalars -> {1, nh}
                    arr = arr[:, None]
            elif hf_sfx == "mixer.D" and arch == "mamba2" and arr.ndim == 1:
                arr = arr[:, None]
            elif hf_sfx == "mixer.conv1d.weight":
                arr = arr.squeeze(1)  # (C, 1, dc) -> (C, dc)
            quant = gg_sfx.endswith(".weight") and "norm" not in gg_sfx \
                and "conv" not in gg_sfx and arr.ndim == 2
            addw(f"blk.{i}.{gg_sfx}", arr, quantize=quant)


def convert(hf_dir: str, out_path: str, outtype: str = "f16") -> str:
    with open(os.path.join(hf_dir, "config.json")) as f:
        cfg = json.load(f)
    mt = cfg.get("model_type", "llama")
    if mt not in _ARCHS:
        raise SystemExit(f"unsupported model_type {mt!r} "
                         f"(supported: {sorted(_ARCHS)})")
    arch = _ARCHS[mt]
    qt = _QTYPES[outtype]
    is_mamba = arch in ("mamba", "mamba2")
    n_head = int(cfg.get("num_attention_heads", 0) or 0)
    n_kv = int(cfg.get("num_key_value_heads", n_head) or n_head)
    n_embd = int(cfg["hidden_size"])
    head_dim = int(cfg.get("head_dim") or (n_embd // max(n_head, 1)))

    w = GGUFWriter(out_path, arch=arch)
    w.add_string("general.name", cfg.get("_name_or_path", os.path.basename(
        os.path.abspath(hf_dir))))
    w.add_uint32(f"{arch}.context_length",
                 int(cfg.get("max_position_embeddings", 4096)))
    w.add_uint32(f"{arch}.embedding_length", n_embd)
    w.add_uint32(f"{arch}.block_count", int(cfg["num_hidden_layers"]))
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon",
                  float(cfg.get("rms_norm_eps",
                                cfg.get("layer_norm_epsilon", 1e-5))))
    w.add_uint32(f"{arch}.vocab_size", int(cfg["vocab_size"]))

    def addw(name, arr, quantize=True):
        from ..quant import quantize as q

        t = qt if (quantize and arr.ndim >= 2
                   and arr.shape[-1] % 32 == 0) else GGMLType.F32
        raw = q(arr.astype(np.float32), t)
        w.add_tensor(name, raw.tobytes(), t, tuple(reversed(arr.shape)))

    tensors = load_hf_weights(hf_dir)
    if is_mamba:
        w.add_uint32(f"{arch}.feed_forward_length", 0)
        convert_tokenizer(w, hf_dir, cfg)
        _convert_mamba(w, cfg, tensors, arch, addw)
        w.write()
        print(f"wrote {out_path} ({arch}, {outtype})", file=sys.stderr)
        return out_path

    w.add_uint32(f"{arch}.feed_forward_length", int(cfg["intermediate_size"]))
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv", n_kv)
    w.add_uint32(f"{arch}.attention.key_length", head_dim)
    w.add_uint32(f"{arch}.attention.value_length", head_dim)
    rot_pct = float(cfg.get("partial_rotary_factor",
                             0.5 if mt == "glm4" else 1.0))
    w.add_uint32(f"{arch}.rope.dimension_count", int(rot_pct * head_dim))
    w.add_float32(f"{arch}.rope.freq_base",
                  float(cfg.get("rope_theta", 10000.0)))
    rs = cfg.get("rope_scaling") or {}
    if rs.get("rope_type") == "linear" or rs.get("type") == "linear":
        w.add_string(f"{arch}.rope.scaling.type", "linear")
        w.add_float32(f"{arch}.rope.scaling.factor", float(rs["factor"]))
    # MoE hparams
    n_expert = int(cfg.get("num_local_experts",
                           cfg.get("num_experts", 0)) or 0)
    if n_expert:
        w.add_uint32(f"{arch}.expert_count", n_expert)
        w.add_uint32(f"{arch}.expert_used_count",
                     int(cfg.get("num_experts_per_tok", 2)))
        if cfg.get("moe_intermediate_size"):
            w.add_uint32(f"{arch}.expert_feed_forward_length",
                         int(cfg["moe_intermediate_size"]))
        elif arch == "gpt-oss":
            w.add_uint32(f"{arch}.expert_feed_forward_length",
                         int(cfg["intermediate_size"]))
    # sliding window (gemma2/3, gpt-oss, cohere2, exaone4)
    if cfg.get("sliding_window"):
        w.add_uint32(f"{arch}.attention.sliding_window",
                     int(cfg["sliding_window"]))
        if cfg.get("layer_types"):  # per-layer swa arrays (exaone4/olmo3)
            w.add_array(f"{arch}.attention.sliding_window_pattern",
                        np.asarray([t == "sliding_attention"
                                    for t in cfg["layer_types"]], np.uint32))
        elif isinstance(cfg.get("sliding_window_pattern"), int):
            w.add_uint32(f"{arch}.attention.sliding_window_pattern",
                         int(cfg["sliding_window_pattern"]))
    # per-arch scale/eps keys (reference converter class behaviors)
    if mt in ("granite", "granitemoe"):  # GraniteModel.set_gguf_parameters
        for hf_k, gg_k in (("attention_multiplier", "attention.scale"),
                           ("embedding_multiplier", "embedding_scale"),
                           ("residual_multiplier", "residual_scale"),
                           ("logits_scaling", "logit_scale")):
            if cfg.get(hf_k):
                w.add_float32(f"{arch}.{gg_k}", float(cfg[hf_k]))
        if cfg.get("shared_intermediate_size"):
            w.add_uint32(f"{arch}.expert_shared_feed_forward_length",
                         int(cfg["shared_intermediate_size"]))
    if mt == "minicpm":  # MiniCPMModel: derived scale triple
        w.add_float32(f"{arch}.embedding_scale", float(cfg["scale_emb"]))
        w.add_float32(f"{arch}.residual_scale",
                      float(cfg["scale_depth"])
                      / float(cfg["num_hidden_layers"]) ** 0.5)
        w.add_float32(f"{arch}.logit_scale",
                      float(cfg["hidden_size"])
                      / float(cfg["dim_model_base"]))
    if mt in ("cohere", "cohere2") and cfg.get("logit_scale"):
        w.add_float32(f"{arch}.logit_scale", float(cfg["logit_scale"]))
    if cfg.get("layer_norm_eps") is not None:
        w.add_float32(f"{arch}.attention.layer_norm_epsilon",
                      float(cfg["layer_norm_eps"]))
    if mt == "qwen2_moe":  # Qwen2MoeModel
        if cfg.get("shared_expert_intermediate_size"):
            w.add_uint32(f"{arch}.expert_shared_feed_forward_length",
                         int(cfg["shared_expert_intermediate_size"]))
    # gemma2 softcaps
    if cfg.get("attn_logit_softcapping"):
        w.add_float32(f"{arch}.attn_logit_softcapping",
                      float(cfg["attn_logit_softcapping"]))
    if cfg.get("final_logit_softcapping"):
        w.add_float32(f"{arch}.final_logit_softcapping",
                      float(cfg["final_logit_softcapping"]))
    convert_tokenizer(w, hf_dir, cfg)

    permute = arch in _PERMUTE
    plus_one = arch in _NORM_PLUS_ONE
    layer_map = dict(_LAYER_MAP)
    if arch in ("gemma2", "gemma3", "olmo2"):
        layer_map.update(_GEMMA2_OVERRIDES)
    if arch == "glm4":
        layer_map.update(_GLM4_OVERRIDES)
    if arch == "phi2":
        layer_map.update(_PHI2_OVERRIDES)
    if arch == "starcoder2":
        layer_map.update(_SC2_OVERRIDES)
    if arch in ("qwen2moe", "olmoe"):
        layer_map.update(_SHEXP_MAP)
    if arch == "granitemoe":
        # JetMoe-style parallel experts: router + fused input_linear
        # split into gate/up below (GraniteMoeModel.modify_tensors)
        layer_map["block_sparse_moe.router.layer.weight"] = \
            "ffn_gate_inp.weight"
    if arch in ("olmo2", "exaone4"):
        # post-norm archs reading HF's post_attention_layernorm as the
        # POST-attention norm with q/k norms (Olmo2Model)
        layer_map.update(_GEMMA2_OVERRIDES)

    def norm_fix(arr):
        return arr.astype(np.float32) + 1.0 if plus_one else arr

    # apertus xIELU per-layer activation scalars -> global arrays
    # (ApertusModel.modify_tensors)
    if mt == "apertus":
        n_l = int(cfg["num_hidden_layers"])
        for pname, key in (("alpha_n", "xielu.alpha_n"),
                           ("alpha_p", "xielu.alpha_p"),
                           ("beta", "xielu.beta"), ("eps", "xielu.eps")):
            vals = []
            for i in range(n_l):
                t = tensors.get(f"model.layers.{i}.mlp.act_fn.{pname}")
                if t is None:
                    break
                vals.append(float(np.asarray(t).reshape(-1)[0]))
            if len(vals) == n_l:
                w.add_array(key, np.asarray(vals, np.float32))

    addw("token_embd.weight", tensors["model.embed_tokens.weight"])
    if "lm_head.weight" in tensors:
        addw("output.weight", tensors["lm_head.weight"])
    if "lm_head.bias" in tensors:  # phi2
        addw("output.bias", tensors["lm_head.bias"], quantize=False)
    fin = tensors.get("model.norm.weight")
    if fin is None:  # phi2 names the final norm final_layernorm
        fin = tensors["model.final_layernorm.weight"]
        fb = tensors.get("model.final_layernorm.bias")
        if fb is not None:
            addw("output_norm.bias", fb, quantize=False)
    addw("output_norm.weight", norm_fix(fin), quantize=False)
    n_layer = int(cfg["num_hidden_layers"])
    for i in range(n_layer):
        pre = f"model.layers.{i}."
        for hf_sfx, gg_sfx in layer_map.items():
            name = pre + hf_sfx
            if name not in tensors:
                continue
            arr = tensors[name]
            if permute and hf_sfx == "self_attn.q_proj.weight":
                arr = _permute(arr, n_head)
            elif permute and hf_sfx == "self_attn.k_proj.weight":
                arr = _permute(arr, n_kv)
            if "norm" in gg_sfx:
                arr = norm_fix(arr)
            addw(f"blk.{i}.{gg_sfx}", arr,
                 quantize=gg_sfx.endswith("weight") and "norm" not in gg_sfx)
        # stacked experts (qwen-moe individual tensors; mixtral w1/w2/w3)
        for tmpl, gg_sfx in _EXPERT_MAP.items():
            first = pre + tmpl.format(e=0)
            if first not in tensors:
                continue
            stack = np.stack([tensors[pre + tmpl.format(e=e)]
                              for e in range(n_expert)])
            addw(f"blk.{i}.{gg_sfx}", stack)
        # gpt-oss: experts arrive PRE-STACKED with interleaved gate/up
        # (convert_hf_to_gguf GptOssModel: [..., ::2]=gate, [..., 1::2]=up)
        gu = pre + "mlp.experts.gate_up_proj"
        if gu in tensors:
            g = tensors[gu]  # (E, D, 2F)
            gate = np.ascontiguousarray(g[..., ::2].swapaxes(1, 2))
            up = np.ascontiguousarray(g[..., 1::2].swapaxes(1, 2))
            down = np.ascontiguousarray(
                tensors[pre + "mlp.experts.down_proj"].swapaxes(1, 2))
            addw(f"blk.{i}.ffn_gate_exps.weight", gate)
            addw(f"blk.{i}.ffn_up_exps.weight", up)
            addw(f"blk.{i}.ffn_down_exps.weight", down)
            gub = tensors.get(pre + "mlp.experts.gate_up_proj_bias")
            if gub is not None:
                addw(f"blk.{i}.ffn_gate_exps.bias",
                     np.ascontiguousarray(gub[..., ::2]), quantize=False)
                addw(f"blk.{i}.ffn_up_exps.bias",
                     np.ascontiguousarray(gub[..., 1::2]), quantize=False)
            db = tensors.get(pre + "mlp.experts.down_proj_bias")
            if db is not None:
                addw(f"blk.{i}.ffn_down_exps.bias", db, quantize=False)
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
