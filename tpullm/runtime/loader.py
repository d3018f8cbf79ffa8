"""GGUF checkpoint -> device params pytree.

Counterpart of the reference model loader (src/llama-model-loader.cpp +
per-arch load_tensors): reads tensor payloads from the mmap, decodes each
quantized weight into planar arrays (the load-time relayout, SURVEY §7), and
stacks per-layer tensors along a leading layer axis so the decoder can
``lax.scan`` over depth. Upload happens once per stacked tensor.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFFile
from ..models.config import ModelConfig, config_from_gguf
from ..ops.qtensor import QTensor, qtensor_from_bytes
from ..quant.layout import PLANAR_TYPES, decode_planar

# GGUF tensor-name suffix -> params key (per-layer tensors, "blk.{i}." prefix)
LAYER_TENSORS = {
    "attn_norm.weight": "attn_norm",
    "attn_norm.bias": "attn_norm_b",
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_qkv.weight": "wqkv_cat",  # GGUF-fused [q;k;v] (phi/gptneox style)
    "attn_qkv.bias": "bqkv_cat",
    "attn_output.weight": "wo",
    "attn_q.bias": "bq",
    "attn_k.bias": "bk",
    "attn_v.bias": "bv",
    "attn_output.bias": "bo",
    "attn_q_norm.weight": "q_norm",
    "attn_q_norm.bias": "q_norm_b",
    "attn_k_norm.bias": "k_norm_b",
    "attn_k_norm.weight": "k_norm",
    # MLA (deepseek2 family, src/models/deepseek2.cpp load_arch_tensors)
    "attn_q_a.weight": "wq_a",
    "attn_q_b.weight": "wq_b",
    "attn_q_a_norm.weight": "q_a_norm",
    "attn_kv_a_mqa.weight": "wkv_a",
    "attn_kv_a_norm.weight": "kv_a_norm",
    "attn_k_b.weight": "wk_b",
    "attn_v_b.weight": "wv_b",
    "attn_kv_b.weight": "wkv_b",  # legacy unsplit; split at load
    "attn_sinks.weight": "attn_sinks",  # per-head sink logits (gpt-oss)
    # bitnet sub-norms + per-tensor output scales (src/models/bitnet.cpp)
    "attn_sub_norm.weight": "attn_sub_norm",
    "ffn_sub_norm.weight": "ffn_sub_norm",
    "attn_q.scale": "wq_s",
    "attn_k.scale": "wk_s",
    "attn_v.scale": "wv_s",
    "attn_output.scale": "wo_s",
    "ffn_gate.scale": "ffn_gate_s",
    "ffn_up.scale": "ffn_up_s",
    "ffn_down.scale": "ffn_down_s",
    "ffn_norm.weight": "ffn_norm",
    # falcon-h1 stores the ffn norm with NO .weight suffix
    # (src/models/falcon-h1.cpp: tn(LLM_TENSOR_FFN_NORM, i))
    "ffn_norm": "ffn_norm",
    "ffn_norm.bias": "ffn_norm_b",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
    "post_attention_norm.weight": "post_attn_norm",
    "post_ffw_norm.weight": "post_ffn_norm",
    # gemma4 per-layer-input block + layer output scale (llama-arch:432-434)
    "inp_gate.weight": "per_layer_inp_gate",
    "proj.weight": "per_layer_proj",
    "post_norm.weight": "per_layer_post_norm",
    "layer_output_scale.weight": "out_scale",
    # gemma3n altup + laurel (llama-arch.cpp:435-442)
    "altup_correct_coef.weight": "altup_correct_coef",
    "altup_correct_scale.weight": "altup_correct_scale",
    "altup_predict_coef.weight": "altup_predict_coef",
    "altup_router.weight": "altup_router",
    "altup_router_norm.weight": "altup_router_norm",
    "laurel_l.weight": "laurel_l",
    "laurel_r.weight": "laurel_r",
    "laurel_post_norm.weight": "laurel_post_norm",
    # plamo2 writes the sandwich norms WITHOUT the .weight suffix
    # (src/models/plamo2.cpp: 2-arg tn(LLM_TENSOR_ATTN_POST_NORM, i))
    "post_attention_norm": "post_attn_norm",
    "post_ffw_norm": "post_ffn_norm",
    "attn_post_norm.weight": "post_attn_norm",
    "ffn_post_norm.weight": "post_ffn_norm",
    # MoE
    "ffn_gate_inp.weight": "moe_gate_inp",
    "ffn_gate_exps.weight": "moe_gate_exps",
    "ffn_up_exps.weight": "moe_up_exps",
    "ffn_down_exps.weight": "moe_down_exps",
    "ffn_norm_exps.weight": "ffn_norm_exps",  # arctic parallel-MoE norm
    # grovemoe adjugate chunk-expert banks (src/models/grovemoe.cpp)
    "ffn_gate_chexps.weight": "moe_gate_chexps",
    "ffn_up_chexps.weight": "moe_up_chexps",
    "ffn_down_chexps.weight": "moe_down_chexps",
    # nemotron-h-moe latent MoE projections (nemotron-h.cpp:99-100)
    "ffn_latent_down.weight": "moe_latent_down",
    "ffn_latent_up.weight": "moe_latent_up",
    "ffn_gate_shexp.weight": "ffn_gate_shexp",
    "ffn_up_shexp.weight": "ffn_up_shexp",
    "ffn_down_shexp.weight": "ffn_down_shexp",
    # qwen2moe/qwen3next shared-expert sigmoid gate (one scalar per token)
    "ffn_gate_inp_shexp.weight": "moe_gate_inp_shexp",
    "exp_probs_b.bias": "moe_probs_b",
    "ffn_gate_exps.bias": "moe_gate_exps_b",  # gpt-oss expert biases
    "ffn_up_exps.bias": "moe_up_exps_b",
    "ffn_down_exps.bias": "moe_down_exps_b",
    "ffn_gate_inp.bias": "moe_gate_inp_b",
    # recurrent SSM (Mamba) family — src/models/mamba.cpp load_arch_tensors
    "ssm_in.weight": "ssm_in",
    "ssm_conv1d.weight": "ssm_conv1d",
    "ssm_conv1d.bias": "ssm_conv1d_b",
    "ssm_x.weight": "ssm_x",
    "ssm_dt.weight": "ssm_dt",
    "ssm_dt.bias": "ssm_dt_b",
    "ssm_a": "ssm_a",  # no .weight suffix in GGUF
    "ssm_d": "ssm_d",
    "ssm_norm.weight": "ssm_norm",  # mamba2 grouped rmsnorm
    "ssm_out.weight": "ssm_out",
    # PLaMo-2 per-part SSM norms (src/models/plamo2.cpp load_arch_tensors)
    "ssm_dt_norm": "ssm_dt_norm",
    "ssm_dt_norm.weight": "ssm_dt_norm",
    "ssm_b_norm": "ssm_b_norm",
    "ssm_b_norm.weight": "ssm_b_norm",
    "ssm_c_norm": "ssm_c_norm",
    "ssm_c_norm.weight": "ssm_c_norm",
    # LFM2 short-convolution mixer (src/models/lfm2.cpp)
    "shortconv.conv.weight": "shortconv_conv",
    "shortconv.in_proj.weight": "shortconv_in",
    "shortconv.out_proj.weight": "shortconv_out",
    # gated delta net (qwen3next, src/models/qwen3next.cpp): packed
    # [q|k|v] projection reuses attn_qkv; attn_gate is the z gate
    "attn_gate.weight": "wqkv_gate",
    "ssm_ba.weight": "ssm_ba",
    # qwen35 split beta/alpha projections (src/models/qwen35.cpp:79-80)
    "ssm_beta.weight": "ssm_beta",
    "ssm_alpha.weight": "ssm_alpha",
    # kimi-linear KDA (src/models/kimi-linear.cpp:60-105)
    "ssm_conv1d_q.weight": "ssm_conv_q",
    "ssm_conv1d_k.weight": "ssm_conv_k",
    "ssm_conv1d_v.weight": "ssm_conv_v",
    "ssm_f_a.weight": "ssm_f_a",
    "ssm_f_b.weight": "ssm_f_b",
    "ssm_g_a.weight": "ssm_g_a",
    "ssm_g_b.weight": "ssm_g_b",
    # RWKV6 family — src/models/rwkv6.cpp / rwkv6qwen2.cpp load_arch_tensors
    "time_mix_lerp_x.weight": "tm_lerp_x",
    "time_mix_lerp_w.weight": "tm_lerp_w",
    "time_mix_lerp_k.weight": "tm_lerp_k",
    "time_mix_lerp_v.weight": "tm_lerp_v",
    "time_mix_lerp_r.weight": "tm_lerp_r",
    "time_mix_lerp_g.weight": "tm_lerp_g",
    "time_mix_first.weight": "tm_first",
    "time_mix_decay.weight": "tm_decay",
    "time_mix_decay_w1.weight": "tm_decay_w1",
    "time_mix_decay_w2.weight": "tm_decay_w2",
    "time_mix_gate.weight": "tm_g",
    "time_mix_key.bias": "tm_k_b",
    "time_mix_value.bias": "tm_v_b",
    "time_mix_receptance.bias": "tm_r_b",
    "channel_mix_lerp_r.weight": "cm_lerp_r",
    "channel_mix_receptance.weight": "cm_r",
    # RWKV7 family — src/models/rwkv7.cpp load_arch_tensors
    "time_mix_w0.weight": "tm_w0",
    "time_mix_w1.weight": "tm_w1",
    "time_mix_w2.weight": "tm_w2",
    "time_mix_a0.weight": "tm_a0",
    "time_mix_a1.weight": "tm_a1",
    "time_mix_a2.weight": "tm_a2",
    "time_mix_v0.weight": "tm_v0",
    "time_mix_v1.weight": "tm_v1",
    "time_mix_v2.weight": "tm_v2",
    "time_mix_g1.weight": "tm_g1",
    "time_mix_g2.weight": "tm_g2",
    "time_mix_lerp_fused.weight": "tm_lerp_fused",
    "time_mix_k_k.weight": "tm_k_k",
    "time_mix_k_a.weight": "tm_k_a",
    "time_mix_r_k.weight": "tm_r_k",
    "time_mix_key.weight": "tm_k",
    "time_mix_value.weight": "tm_v",
    "time_mix_receptance.weight": "tm_r",
    "time_mix_output.weight": "tm_out",
    "time_mix_ln.weight": "tm_ln",
    "time_mix_ln.bias": "tm_ln_b",
    "attn_norm_2.weight": "attn_norm_2",
    "attn_norm_2.bias": "attn_norm_2_b",
    "channel_mix_lerp_k.weight": "cm_lerp_k",
    "channel_mix_key.weight": "cm_k",
    "channel_mix_value.weight": "cm_v",
    # encoder (BERT) family: post-LN norms + FFN biases
    "attn_output_norm.weight": "attn_out_norm",
    "attn_output_norm.bias": "attn_out_norm_b",
    "layer_output_norm.weight": "layer_out_norm",
    "layer_output_norm.bias": "layer_out_norm_b",
    "ffn_up.bias": "ffn_up_b",
    "ffn_down.bias": "ffn_down_b",
    "ffn_gate.bias": "ffn_gate_b",
}

GLOBAL_TENSORS = {
    "token_embd.weight": "tok_embd",
    # gemma4/gemma3n per-layer token-embedding stream (llama-arch.cpp:427)
    "per_layer_token_embd.weight": "per_layer_tok_embd",
    "per_layer_model_proj.weight": "per_layer_model_proj",
    "per_layer_proj_norm.weight": "per_layer_proj_norm",
    # gemma3n altup stream expansion / merge (llama-arch.cpp:430-431)
    "altup_proj.weight": "altup_proj",
    "altup_unembd_proj.weight": "altup_unembd_proj",
    "output.weight": "output",
    "output_norm.weight": "output_norm",
    "output_norm.bias": "output_norm_b",
    "rope_freqs.weight": "rope_freqs",
    # encoder (BERT) family: extra embeddings + pooling head
    "position_embd.weight": "pos_embd",
    "token_types.weight": "type_embd",
    "token_embd_norm.weight": "tok_norm",
    "token_embd_norm.bias": "tok_norm_b",
    "cls.weight": "cls_w",
    "cls.bias": "cls_b",
    "cls.output.weight": "cls_out_w",
    "cls.output.bias": "cls_out_b",
    "cls.norm.weight": "cls_norm",  # modern-bert head norm
    "enc.output_norm.weight": "output_norm_enc",  # neo-bert / t5 encoder
}

# global tensors kept as plain f32 arrays (small, or added elementwise)
_FLOAT_GLOBALS = {
    "per_layer_proj_norm", "altup_proj", "altup_unembd_proj",
    "output_norm", "output_norm_b", "rope_freqs", "pos_embd", "type_embd",
    "tok_norm", "tok_norm_b", "cls_w", "cls_b", "cls_out_w", "cls_out_b",
    "cls_norm", "output_norm_enc",
}

_FLOAT_TYPES = {GGMLType.F32, GGMLType.F16, GGMLType.BF16}


def _to_float_array(g: GGUFFile, name: str) -> np.ndarray:
    """Small norm/bias tensors -> f32 numpy."""
    from ..quant.numpy_impl import dequantize

    ti = g.tensors[name]
    raw = g.tensor_data(name)
    n_in = ti.shape[0]
    rows = ti.n_elements // n_in
    y = dequantize(raw.reshape(rows, -1), ti.ggml_type).reshape(ti.np_shape)
    return y.astype(np.float32)


def _load_qtensor(g: GGUFFile, name: str, device_put=True) -> QTensor:
    ti = g.tensors[name]
    return qtensor_from_bytes(g.tensor_data(name), ti.ggml_type, ti.np_shape, device_put)


def _stack_qtensors(items: list[QTensor], device_put: bool = True) -> QTensor:
    """Stack per-layer QTensors (same qtype/shape) along a new leading axis."""
    t0 = items[0]
    assert all(t.qtype == t0.qtype and t.shape == t0.shape for t in items)
    data = {k: np.stack([np.asarray(t.data[k]) for t in items]) for k in t0.data}
    if device_put:
        data = {k: jnp.asarray(v) for k, v in data.items()}
    return QTensor(t0.qtype, (len(items),) + t0.shape, data)


def _mla_prepare(layers: dict, cfg) -> dict:
    """Materialize the MLA absorption projections as dense f32 arrays.

    wk_b: (L, H, kv_lora, nope) so q_nope absorbs into the compressed space
    (q_abs = q_nope @ wk_b^T per head); wv_b: (L, H, v, kv_lora) to project
    attention output back out. A legacy unsplit attn_kv_b {kv_lora,
    H*(nope+v)} is split here, matching the reference's MLA back-compat
    (src/models/deepseek2.cpp load_arch_tensors is_mla branch)."""
    nope = cfg.head_dim - cfg.rope_dim
    H, v, lora = cfg.n_head, cfg.head_dim_v, cfg.kv_lora_rank
    if "wkv_b" in layers and "wk_b" not in layers:
        kvb = np.asarray(layers.pop("wkv_b").dequant(jnp.float32), np.float32)
        L = kvb.shape[0]
        kvb = kvb.reshape(L, H, nope + v, lora)
        layers["wk_b"] = np.ascontiguousarray(np.swapaxes(kvb[:, :, :nope, :], 2, 3))
        layers["wv_b"] = np.ascontiguousarray(kvb[:, :, nope:, :])
    else:
        for k in ("wk_b", "wv_b"):
            if k in layers and isinstance(layers[k], QTensor):
                layers[k] = np.asarray(layers[k].dequant(jnp.float32), np.float32)
    return layers


def load_model(path: str, device_put: bool = True, fuse: bool = True,
               override_kv: dict | None = None):
    """Returns (config, params dict, GGUFFile).

    fuse: concatenate QKV / gate-up into single kmajor weights (one fused
    kernel launch per block pair; tpullm.ops.fuse).
    override_kv: metadata overrides applied before hparam parsing
    (--override-kv, llama.h:268-279)."""
    g = GGUFFile(path)
    if override_kv:
        g.metadata.update(override_kv)
    cfg = config_from_gguf(g)
    if cfg.arch in ("t5", "t5encoder"):
        from ..models.t5 import load_t5

        return cfg, load_t5(g, cfg, device_put=device_put), g
    if cfg.arch == "wavtokenizer-dec":
        from ..models.wavtokenizer import load_wavtokenizer

        return cfg, load_wavtokenizer(g, cfg, device_put=device_put), g
    if not cfg.causal:
        fuse = False  # encoder graph reads unfused q/k/v (+ biases)
    lfm2_fix = cfg.arch.startswith("lfm2")
    params: dict[str, Any] = {}

    for tname, key in GLOBAL_TENSORS.items():
        if tname not in g.tensors:
            continue
        ti = g.tensors[tname]
        if key in _FLOAT_GLOBALS:
            arr = _to_float_array(g, tname)
            params[key] = jnp.asarray(arr) if device_put else arr
        else:
            params[key] = _load_qtensor(g, tname, device_put=False)

    if "output" not in params:
        params["output"] = params["tok_embd"]  # tied embeddings
        cfg.tie_embeddings = True

    # per-layer tensors: collect -> stack. Keys may exist only on a SUBSET
    # of layers (e.g. deepseek2's leading dense-FFN layers vs MoE layers) —
    # tracked per layer index, segmented below.
    per_key: dict[str, dict[int, Any]] = {}
    # gemma3n ships K/V projections for its shared-KV layers but the graph
    # never runs them (gemma3n.cpp:177-193 Q-only branch) — drop them so
    # the shared layers group separately and waste no HBM
    nks = cfg.n_layer_kv_from_start
    shared_kv_dead = (
        {"wk", "wv", "k_norm", "bk", "bv"}
        if (cfg.altup_n and 0 <= nks < cfg.n_layer) else frozenset())
    for i in range(cfg.n_layer):
        prefix = f"blk.{i}."
        for suffix, key in LAYER_TENSORS.items():
            tname = prefix + suffix
            if tname not in g.tensors:
                continue
            if i >= nks and key in shared_kv_dead:
                continue
            ti = g.tensors[tname]
            if ti.ggml_type in _FLOAT_TYPES and (
                "norm" in key or key.startswith("b")
                # ssm_f_b/ssm_g_b are kimi-linear low-rank PROJECTIONS,
                # not biases, despite the _b suffix
                or (key.endswith("_b") and key not in ("ssm_f_b", "ssm_g_b"))
                or key in ("moe_probs_b", "out_scale",
                           "altup_correct_coef", "altup_correct_scale",
                           "altup_predict_coef", "altup_router",
                           "laurel_l", "laurel_r",
                           "ssm_a", "ssm_d", "ssm_conv1d",
                           "ssm_conv_q", "ssm_conv_k", "ssm_conv_v",
                           "shortconv_conv",
                           "attn_sinks", "moe_gate_inp_shexp")
                or key.startswith("tm_") and key not in ("tm_k", "tm_v",
                                                         "tm_r", "tm_out",
                                                         "tm_g")
                or key.startswith("cm_lerp")
            ):
                per_key.setdefault(key, {})[i] = _to_float_array(g, tname)
            else:
                per_key.setdefault(key, {})[i] = _load_qtensor(
                    g, tname, device_put=False)

    # Mixed per-layer quant types (ftype policies bump attn_v/ffn_down for a
    # subset of layers, src/llama-quant.cpp:661) and structural depth mixes
    # (dense-lead vs MoE layers) can't share one stacked array: split the
    # depth into contiguous segments of uniform signature and stack per
    # segment. forward() scans each group in turn.
    def sig(i):
        return tuple(
            (k, v[i].qtype, v[i].shape) if isinstance(v[i], QTensor)
            else (k, "arr", v[i].shape)
            for k, v in sorted(per_key.items()) if i in v
        )

    bounds = [0]
    for i in range(1, cfg.n_layer):
        if sig(i) != sig(i - 1):
            bounds.append(i)
    bounds.append(cfg.n_layer)

    def build_group(lo, hi):
        layers: dict[str, Any] = {}
        for key, items in per_key.items():
            if lo not in items:  # key absent in this depth segment
                continue
            seg = [items[i] for i in range(lo, hi)]
            if isinstance(seg[0], QTensor):
                layers[key] = _stack_qtensors(seg, device_put=False)
            else:
                layers[key] = np.stack(seg)
        if cfg.arch == "grok" and "attn_out_norm" in layers:
            # grok's post-attention norm ships as attn_output_norm
            # (src/models/grok.cpp ATTN_OUT_NORM -> our post_norms slot)
            layers["post_attn_norm"] = layers.pop("attn_out_norm")
        if cfg.arch == "dbrx" and "attn_out_norm" in layers:
            # dbrx's attn_output_norm plays the ffn_norm role
            # (src/models/dbrx.cpp: build_norm(ffn_inp, attn_out_norm))
            layers["ffn_norm"] = layers.pop("attn_out_norm")
            layers.pop("attn_out_norm_b", None)
        if (cfg.arch == "glm4moe" and "post_attn_norm" in layers
                and "ffn_norm" not in layers):
            # glm4moe's post_attention_norm IS the pre-ffn norm
            # (src/models/glm4-moe.cpp: build_norm(ffn_inp, attn_post_norm))
            layers["ffn_norm"] = layers.pop("post_attn_norm")
        if cfg.kv_lora_rank > 0:
            layers = _mla_prepare(layers, cfg)
        if fuse:
            from ..ops.fuse import fuse_layer_weights

            layers = fuse_layer_weights(layers, cfg)
        if device_put:
            def _up(v):
                if isinstance(v, QTensor):
                    return QTensor(v.qtype, v.shape,
                                   {k: jnp.asarray(a) for k, a in v.data.items()})
                return jnp.asarray(v)

            layers = {k: _up(v) for k, v in layers.items()}
        return layers

    groups = [build_group(lo, hi) for lo, hi in zip(bounds[:-1], bounds[1:])]
    params["layers"] = groups[0] if len(groups) == 1 else {"__groups__": groups}

    if lfm2_fix and "tok_norm" in params:
        # lfm2 ships its FINAL norm under the historical name
        # token_embd_norm (LLM_TENSOR_OUTPUT_NORM_LFM2, llama-arch.cpp:347)
        params["output_norm"] = params.pop("tok_norm")
    if device_put:
        for key in ("tok_embd", "output", "per_layer_tok_embd",
                    "per_layer_model_proj"):
            if key not in params:
                continue
            qt = params[key]
            if isinstance(qt, QTensor) and isinstance(next(iter(qt.data.values())), np.ndarray):
                params[key] = QTensor(
                    qt.qtype, qt.shape, {k: jnp.asarray(v) for k, v in qt.data.items()}
                )
        if cfg.tie_embeddings:
            params["output"] = params["tok_embd"]
    return cfg, params, g
