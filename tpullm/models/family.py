"""Model-family dispatch: which memory/forward a config needs.

The reference routes this through llama_model::create_memory
(src/llama-model.cpp): attention models get llama_kv_cache, pure
recurrent models llama_memory_recurrent, mixed models
llama_memory_hybrid. tpullm keys the same decision off the config and
hands the server/engine a uniform (state_create, forward) pair for the
recurrent families — mamba and rwkv share one serving path because both
forwards take (params, tokens, state, n_valid, logits_idx).
"""
from __future__ import annotations

from .config import ModelConfig


def model_family(cfg: ModelConfig) -> str:
    """"attn" | "ssm" | "rwkv" | "hybrid" | "t5"."""
    if cfg.arch in ("t5", "t5encoder"):
        return "t5"
    if cfg.wkv_head_size > 0:
        return "rwkv"
    if cfg.hybrid_graph:  # deci/openelm: per-layer-shape attention archs
        return "hybrid"
    rec = cfg.ssm_d_conv > 0
    attn = any(h > 0 for h in cfg.kv_head_pattern)
    if rec and attn:
        return "hybrid"
    if rec:
        return "ssm"
    return "attn"


def recurrent_ops(family: str):
    """(state_create(cfg, batch), forward) for a stateless-cache family."""
    if family == "rwkv":
        from .rwkv import RwkvState, forward

        return RwkvState.create, forward
    if family == "ssm":
        from .mamba import RecurrentState, forward

        return RecurrentState.create, forward
    raise ValueError(f"not a recurrent family: {family}")
