"""Model hyperparameters parsed from GGUF metadata.

Counterpart of the reference's hparams loader (src/llama-hparams.h:1-359 +
per-arch KV reads in src/llama-model.cpp). One flat dataclass covers the
transformer families; arch-specific quirks (parallel residual, expert gating,
sliding window patterns) are fields with defaults.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..gguf.reader import GGUFFile


@dataclass
class ModelConfig:
    arch: str = "llama"
    vocab_size: int = 32000
    n_embd: int = 2048
    n_layer: int = 22
    n_head: int = 32
    n_head_kv: int = 4
    head_dim: int = 64  # key_length
    head_dim_v: int = 64
    n_ff: int = 5632
    n_ctx_train: int = 2048
    rms_eps: float = 1e-5
    norm_eps: float = 0.0  # layernorm (non-RMS) archs
    rope_base: float = 10000.0
    rope_dim: int = 64
    rope_type: str = "norm"  # "norm" (interleaved pairs) | "neox" (half split)
    rope_scaling: str = "none"  # none | linear | yarn
    rope_scale: float = 1.0
    rope_orig_ctx: int = 0
    rope_yarn_low: float = 1.0
    rope_yarn_high: float = 4.0
    rope_attn_factor: float = 1.0
    # MoE
    n_expert: int = 0
    n_expert_used: int = 0
    expert_gating: str = "softmax"  # softmax | sigmoid
    expert_weights_norm: bool = False
    expert_weights_scale: float = 1.0
    n_ff_exp: int = 0
    n_expert_shared: int = 0
    # attention details
    sliding_window: int = 0
    swa_pattern: int = 1  # every Nth layer is full-attention (1 = all full)
    swa_layer_pattern: tuple = ()  # explicit per-layer is-SWA flags (mimo2)
    swa_chunked: bool = False  # llama4: chunk-aligned windows, not sliding
    swa_dense_first: bool = False  # smallthinker: layer il%p==0 is dense
    no_rope_offset: int = 1  # (li+offset) % interval == 0 -> no rope
    moe_router_pre_norm: bool = False  # smallthinker: router reads inpL
    # llama4 iRoPE: every Nth layer has NO rope; its Q is temperature-scaled
    no_rope_interval: int = 0
    attn_temp_scale: float = 0.0
    attn_temp_floor: int = 8192
    attn_temp_offset: float = 1.0
    qk_l2_norm: bool = False  # weightless rms over the head dim (rope layers)
    attn_logit_softcap: float = 0.0
    final_logit_softcap: float = 0.0
    # per-head q/k norm flavor: chameleon uses LAYERNORM (with bias) over
    # the head dim with PER-HEAD weights (src/models/chameleon.cpp:90-104)
    qk_norm_type: str = "rmsnorm"  # rmsnorm | layernorm
    # apertus xIELU activation: per-layer (alpha_n, alpha_p, beta, eps)
    # AFTER the build-time softplus transform (ggml/src/ggml.c ggml_xielu)
    xielu: tuple = ()
    # dense FFN runs IN PARALLEL with the MoE branch:
    #   "grok":   out = sqrt(2)/2 * (dense(h2) + moe(h2))  (grok.cpp:171-183)
    #   "arctic": out = (dense(h2)+ffn_inp) + moe(norm_exps(x0))  (arctic.cpp)
    moe_dense_parallel: str = ""
    # grovemoe adjugate "chunk" experts: second expert bank indexed by
    # main_expert_id // n_group_experts, same router probs (grovemoe.cpp)
    n_group_experts: int = 0
    expert_group_scale: float = 1.0
    n_ff_chexp: int = 0
    # afmoe: attention output gated by sigmoid(wqkv_gate @ attn_input)
    # BEFORE the output projection (src/models/afmoe.cpp:177-190)
    attn_gate_proj: bool = False
    # bitnet (src/models/bitnet.cpp): RMS sub-norms applied to the
    # attention output BEFORE wo and to the FFN hidden BEFORE down,
    # plus optional per-tensor {1} output scales (wq_s, ffn_up_s, ...)
    sub_norms: bool = False
    # nomic-bert-moe: layer i is MoE iff i %% moe_every_n == 1
    # (src/models/nomic-bert.cpp LLM_KV_MOE_EVERY_N_LAYERS)
    moe_every_n: int = 0
    # encoder symmetric SWA (modern-bert/gemma-embedding): local layers may
    # rope at a different frequency base (LLM_KV_ROPE_FREQ_BASE_SWA)
    rope_base_swa: float = 0.0
    attn_scale: float = 0.0  # 0 -> 1/sqrt(head_dim)
    attn_out_scale: float = 0.0  # mimo2: scale on the attn OUTPUT (post-wo)
    # gemma4/gemma3n: per-layer token-embedding stream width (0 = off)
    n_embd_per_layer: int = 0
    # gemma4/gemma3n: layers >= this REUSE the cache of layer
    # n_kv_from_start - (2 if swa else 1) (llama-model.cpp:2005 reuse cb)
    n_layer_kv_from_start: int = -1
    gemma4_attn: bool = False  # weightless V norm, optional wv (v=k)
    # gemma3n AltUp (src/models/gemma3n.cpp): the residual stream is a
    # STACK of altup_n streams; stream altup_act runs the layer, a
    # router-predicted mix corrects the rest (llama-hparams.h:189-193
    # fixed defaults: n_altup=4, i_altup_act=0)
    altup_n: int = 0
    altup_act: int = 0
    # gemma3n activation sparsity: first N layers relu-cut the FFN gate at
    # mean + std*mul (models.h:735-736 fixed: 10, icdf(0.95))
    n_layer_sparsity: int = 0
    sparsity_std_mul: float = 1.6448533535003662
    clamp_kqv: float = 0.0
    # ALiBi position bias (mpt/bloom/jais/baichuan-13b families): slope_h *
    # (kv_pos - q_pos) added to scores (ggml_soft_max_ext max_bias semantics)
    alibi_max_bias: float = 0.0
    use_rope: bool = True  # gpt2/starcoder/bloom/mpt: no rotary embedding
    # q/k norm over the FLATTENED projection (n_embd rows) instead of
    # per-head (mpt qk_ln, olmoe): build_norm on the 2-D Qcur/Kcur
    attn_qk_norm_flat: bool = False
    logit_scale: float = 1.0  # final logits multiplier (command-r, jais)
    # structure flags
    parallel_residual: bool = False
    residual_scale: float = 1.0  # granite/minicpm f_residual_scale
    tie_embeddings: bool = False
    norm_type: str = "rmsnorm"  # rmsnorm | layernorm
    act_fn: str = "silu"  # silu | gelu | relu2 | swiglu_oai
    ffn_gate: bool = True  # gated (SwiGLU-style) FFN
    attn_qk_norm: bool = False
    # maincoder (src/models/maincoder.cpp): per-head q/k RMS applied AFTER
    # rope instead of the usual pre-rope placement (qwen3 et al.)
    qk_norm_post_rope: bool = False
    attn_bias: bool = False
    post_norms: bool = False  # gemma-style post-attn/post-ffn norms
    embedding_scale: float = 1.0
    # encoder (BERT-family) models
    causal: bool = True
    pooling_type: str = "none"  # none | mean | cls | last | rank
    n_cls_out: int = 1
    # MLA (deepseek2 family): compressed-KV attention
    q_lora_rank: int = 0
    kv_lora_rank: int = 0  # >0 enables the MLA graph + compressed cache
    n_layer_dense_lead: int = 0  # leading layers with dense (non-MoE) FFN
    rope_yarn_log_mul: float = 0.0
    # hybrid attention+recurrent (Jamba family): per-layer kv head counts,
    # 0 = recurrent layer (src/models/jamba.cpp:12)
    kv_head_pattern: tuple = ()
    head_pattern: tuple = ()  # per-layer n_head (openelm/deci; 0 = no attn)
    hybrid_graph: bool = False  # route through the hybrid group walker
    # even without recurrent layers (deci/openelm per-layer-shape archs)
    ffn_only_layers: bool = False  # nemotron-h: kv==0 AND ff>0 marks an
    # FFN-only layer (not recurrent); other hybrids put FFN on every layer
    # T5 family: relative position buckets (no rope)
    n_rel_attn_bkts: int = 0
    # RWKV family
    wkv_head_size: int = 0  # >0 selects the RWKV graph (rwkv7.cpp)
    rescale_every: int = 0  # rwkv6: halve activations every N layers
    n_ff_pattern: tuple = ()  # per-layer n_ff (nemotron-h: 0 = no-FFN layer)
    mrope_sections: tuple = ()  # qwen2vl M-RoPE t/h/w/e freq sections
    diffusion: bool = False  # llada/dream: bidirectional diffusion LM
    pre_norm: bool = True  # olmo2/exaone4: False = post-norms ONLY
    hybrid_parallel: bool = False  # falcon-h1: attn + mamba2 in EVERY layer
    hybrid_rope: bool = False  # hybrid attn layers rope (falcon-h1/granite)
    # qwen3next: Q projection emits [query | sigmoid output gate] per head
    attn_out_gate: bool = False
    # qwen3next: every Nth layer is full attention, the rest gated delta
    # net (LLM_KV_FULL_ATTENTION_INTERVAL, src/models/qwen3next.cpp:17-23)
    full_attn_interval: int = 0
    # recurrent (Mamba/SSM) models
    ssm_d_conv: int = 0  # conv kernel width (0 = not an SSM arch)
    ssm_d_inner: int = 0
    ssm_d_state: int = 0
    ssm_dt_rank: int = 0  # mamba2: the SSM head count
    ssm_n_group: int = 0  # mamba2: B/C group count
    ssm_dt_b_c_rms: bool = False  # FalconMamba: RMS-norm dt/B/C
    raw_kv: dict = field(default_factory=dict, repr=False)

    @property
    def n_gqa_groups(self) -> int:
        return self.n_head // max(self.n_head_kv, 1)


def _k(g: GGUFFile, key: str, default: Any = None, arch: str | None = None) -> Any:
    a = arch or g.architecture
    return g.get(key.format(arch=a), default)


def config_from_gguf(g: GGUFFile) -> ModelConfig:
    arch = g.architecture
    n_embd = int(_k(g, "{arch}.embedding_length", 2048))
    # head_count may be a per-layer ARRAY (openelm/deci variable-head
    # layers; 0 = attention-free): scalar keeps the max for sizing
    nh_raw = _k(g, "{arch}.attention.head_count", 32)
    head_pattern = ()
    if isinstance(nh_raw, (list, tuple, np.ndarray)):
        head_pattern = tuple(int(h) for h in nh_raw)
        n_head = max(head_pattern)
    else:
        n_head = int(nh_raw)
    head_dim = int(_k(g, "{arch}.attention.key_length", n_embd // max(n_head, 1)))
    n_vocab = _k(g, "{arch}.vocab_size")
    if n_vocab is None:
        toks = g.get("tokenizer.ggml.tokens")
        n_vocab = len(toks) if toks is not None else 32000
    # head_count_kv may be a per-layer ARRAY (hybrid archs: 0 = recurrent
    # layer); the scalar config keeps the max, the pattern the full vector
    hkv_raw = _k(g, "{arch}.attention.head_count_kv", n_head)
    kv_pattern = ()
    if isinstance(hkv_raw, (list, tuple, np.ndarray)):
        kv_pattern = tuple(int(h) for h in hkv_raw)
        n_head_kv_scalar = max(kv_pattern)
    else:
        n_head_kv_scalar = int(hkv_raw)
    # feed_forward_length may also be per-layer (nemotron-h: 0 marks
    # ssm/attention layers); the scalar keeps the max for buffer sizing
    ff_raw = _k(g, "{arch}.feed_forward_length", 4 * n_embd)
    ff_pattern = ()
    if isinstance(ff_raw, (list, tuple, np.ndarray)):
        ff_pattern = tuple(int(f) for f in ff_raw)
        ff_scalar = max(ff_pattern)
    else:
        ff_scalar = int(ff_raw)
    cfg = ModelConfig(
        arch=arch,
        vocab_size=int(n_vocab),
        n_embd=n_embd,
        n_layer=int(_k(g, "{arch}.block_count", 22)),
        n_head=n_head,
        n_head_kv=n_head_kv_scalar,
        head_dim=head_dim,
        head_dim_v=int(_k(g, "{arch}.attention.value_length", head_dim)),
        n_ff=ff_scalar,
        n_ctx_train=int(_k(g, "{arch}.context_length", 2048)),
        rms_eps=float(_k(g, "{arch}.attention.layer_norm_rms_epsilon", 1e-5)),
        norm_eps=float(_k(g, "{arch}.attention.layer_norm_epsilon", 0.0)),
        rope_base=float(_k(g, "{arch}.rope.freq_base", 10000.0)),
        rope_dim=int(_k(g, "{arch}.rope.dimension_count", head_dim)),
        n_expert=int(_k(g, "{arch}.expert_count", 0)),
        n_expert_used=int(_k(g, "{arch}.expert_used_count", 0)),
        n_ff_exp=int(_k(g, "{arch}.expert_feed_forward_length", 0)),
        n_expert_shared=int(_k(g, "{arch}.expert_shared_count", 0)),
        sliding_window=int(_k(g, "{arch}.attention.sliding_window", 0)),
        raw_kv=dict(g.metadata),
    )
    # MLA hparams (src/models/deepseek2.cpp load_arch_hparams): head_dim is
    # the MHA-equivalent ("decompressed") head size; *_mla keys override
    cfg.q_lora_rank = int(_k(g, "{arch}.attention.q_lora_rank", 0) or 0)
    cfg.kv_lora_rank = int(_k(g, "{arch}.attention.kv_lora_rank", 0) or 0)
    if cfg.kv_lora_rank:
        k_mla = _k(g, "{arch}.attention.key_length_mla")
        v_mla = _k(g, "{arch}.attention.value_length_mla")
        if k_mla:
            cfg.head_dim = int(k_mla)
        if v_mla:
            cfg.head_dim_v = int(v_mla)
        # stored value is 0.1*log_mul (convert-script factor); reference
        # divides it back out ([TAG_DEEPSEEK2_YARN_LOG_MUL_FIX])
        cfg.rope_yarn_log_mul = float(
            _k(g, "{arch}.rope.scaling.yarn_log_multiplier", 0.0) or 0.0) / 0.1
    cfg.n_layer_dense_lead = int(
        _k(g, "{arch}.leading_dense_block_count", 0) or 0)
    # NextN/MTP layers are preserved-but-unused in the reference (glm4moe/
    # glm-dsa TENSOR_SKIP, src/models/glm-dsa.cpp:81-85): the decode depth
    # excludes them
    nextn = int(_k(g, "{arch}.nextn_predict_layers", 0) or 0)
    if nextn:
        cfg.n_layer -= nextn
    es = _k(g, "{arch}.embedding_scale")
    if es is not None:
        cfg.embedding_scale = float(es)
    rs = _k(g, "{arch}.residual_scale")
    if rs is not None:
        cfg.residual_scale = float(rs)
    ew_scale = _k(g, "{arch}.expert_weights_scale")
    if ew_scale is not None:
        cfg.expert_weights_scale = float(ew_scale)
    ew_norm = _k(g, "{arch}.expert_weights_norm")
    if ew_norm is not None:
        cfg.expert_weights_norm = bool(ew_norm)
    gf = _k(g, "{arch}.expert_gating_func")
    if gf is not None:
        cfg.expert_gating = {2: "sigmoid"}.get(int(gf), "softmax")
    cfg.kv_head_pattern = kv_pattern
    cfg.n_ff_pattern = ff_pattern
    cfg.head_pattern = head_pattern
    # sliding_window_pattern: scalar period (gemma3-style) or a per-layer
    # 0/1 ARRAY (mimo2/step35/gemma4 swa_layers via get_key_or_arr)
    swp = _k(g, "{arch}.attention.sliding_window_pattern", 0)
    if isinstance(swp, (list, tuple, np.ndarray)):
        cfg.swa_layer_pattern = tuple(bool(x) for x in swp)
        cfg.swa_pattern = 2  # any-swa marker for dual-cache gating
    else:
        cfg.swa_pattern = int(swp or 1)
    sect = _k(g, "{arch}.rope.dimension_sections")
    if sect is not None:
        cfg.mrope_sections = tuple(int(s) for s in sect)
    cfg.wkv_head_size = int(_k(g, "{arch}.wkv.head_size", 0) or 0)
    cfg.rescale_every = int(_k(g, "{arch}.rescale_every_n_layers", 0) or 0)
    cfg.n_rel_attn_bkts = int(
        _k(g, "{arch}.attention.relative_buckets_count", 0) or 0)
    # recurrent (SSM) hparams (llama-model.cpp mamba load_arch_hparams)
    cfg.ssm_d_conv = int(_k(g, "{arch}.ssm.conv_kernel", 0))
    cfg.ssm_d_inner = int(_k(g, "{arch}.ssm.inner_size", 0))
    cfg.ssm_d_state = int(_k(g, "{arch}.ssm.state_size", 0))
    cfg.ssm_dt_rank = int(_k(g, "{arch}.ssm.time_step_rank", 0))
    cfg.ssm_n_group = int(_k(g, "{arch}.ssm.group_count", 0))
    kda_hd = int(_k(g, "{arch}.kda.head_dim", 0) or 0)
    if kda_hd:  # kimi-linear KDA: state/conv sizes derive from head_dim
        cfg.ssm_d_state = kda_hd
        cfg.ssm_d_inner = cfg.n_head * kda_hd
    cfg.ssm_dt_b_c_rms = bool(_k(g, "{arch}.ssm.dt_b_c_rms", False))
    # encoder models: pooling enum (llama.h LLAMA_POOLING_TYPE_*) + causality
    _POOL = {0: "none", 1: "mean", 2: "cls", 3: "last", 4: "rank"}
    pt = _k(g, "{arch}.pooling_type")
    if pt is not None:
        cfg.pooling_type = _POOL.get(int(pt), "none")
    causal = _k(g, "{arch}.attention.causal")
    if causal is not None:
        cfg.causal = bool(causal)
    scaling = _k(g, "{arch}.rope.scaling.type", "none") or "none"
    cfg.rope_scaling = str(scaling)
    cfg.rope_scale = float(_k(g, "{arch}.rope.scaling.factor", 1.0))
    cfg.rope_orig_ctx = int(_k(g, "{arch}.rope.scaling.original_context_length", 0))
    cfg.alibi_max_bias = float(
        _k(g, "{arch}.attention.max_alibi_bias", 0.0) or 0.0)
    cl = _k(g, "{arch}.attention.clamp_kqv")
    if cl is not None:
        cfg.clamp_kqv = float(cl)
    ls = _k(g, "{arch}.logit_scale")
    if ls is not None:
        cfg.logit_scale = float(ls)
    pl = _k(g, "{arch}.embedding_length_per_layer_input")
    if pl:
        cfg.n_embd_per_layer = int(pl)
    shared_kv = _k(g, "{arch}.attention.shared_kv_layers")
    if shared_kv:
        cfg.n_layer_kv_from_start = cfg.n_layer - int(shared_kv)
    if arch == "gemma3n":
        # reference HARDCODES the altup geometry (gemma3n.cpp:9 +
        # llama-hparams.h:189-193); the per-layer width still reads its key
        cfg.n_layer_kv_from_start = min(20, cfg.n_layer)
    al = _k(g, "{arch}.rope.scaling.alpha")
    if al is not None and float(al) > 0:
        # XDRoPE / NTK-aware alpha: base *= alpha^(dim/(dim-2))
        # (src/models/hunyuan-vl.cpp:8-12, hunyuan-moe alike)
        d = float(cfg.rope_dim)
        cfg.rope_base = cfg.rope_base * float(al) ** (d / (d - 2.0))
    vsc = _k(g, "{arch}.attention.value_scale")
    if vsc is not None and float(vsc) != 1.0:  # mimo2 f_attn_value_scale
        cfg.attn_out_scale = float(vsc)
    asc = _k(g, "{arch}.attention.scale")
    if asc is not None:
        cfg.attn_scale = float(asc)
    for key, attr in (("{arch}.attn_logit_softcapping", "attn_logit_softcap"),
                      ("{arch}.final_logit_softcapping", "final_logit_softcap")):
        v = _k(g, key)
        if v is not None:
            setattr(cfg, attr, float(v))
    # apertus xIELU: global (arch-unprefixed) per-layer arrays; stored raw
    # alphas get the reference's build-time softplus fold (ggml_xielu)
    xa_n = g.get("xielu.alpha_n")
    if xa_n is not None:
        def _arr(k):
            v = g.get(k)
            v = [v] * cfg.n_layer if np.isscalar(v) else list(v)
            return [float(x) for x in v]
        sp = lambda x: float(np.log1p(np.exp(min(x, 30.0))) if x < 30 else x)
        a_n, a_p = _arr("xielu.alpha_n"), _arr("xielu.alpha_p")
        beta = _arr("xielu.beta") if g.get("xielu.beta") is not None else [0.5] * cfg.n_layer
        eps = _arr("xielu.eps") if g.get("xielu.eps") is not None else [-1e-6] * cfg.n_layer
        cfg.xielu = tuple((beta[i] + sp(a_n[i]), sp(a_p[i]), beta[i], eps[i])
                          for i in range(cfg.n_layer))
    nge = _k(g, "{arch}.experts_per_group")
    if nge is not None:
        cfg.n_group_experts = int(nge)
    egs = _k(g, "{arch}.expert_group_scale")
    if egs is not None:
        cfg.expert_group_scale = float(egs)
    cfg.n_ff_chexp = int(_k(g, "{arch}.expert_chunk_feed_forward_length", 0)
                         or 0)
    cfg.moe_every_n = int(_k(g, "{arch}.moe_every_n_layers", 0) or 0)
    lc = _k(g, "{arch}.shortconv.l_cache")
    if lc:  # lfm2: conv mixer state sized like a d_conv=l_cache SSM conv
        cfg.ssm_d_conv = int(lc)
        cfg.ssm_d_inner = n_embd
    cfg.rope_base_swa = float(_k(g, "{arch}.rope.freq_base_swa", 0.0) or 0.0)
    if arch == "qwen":  # qwen-v1 GGUF stores DOUBLE the ffn width
        cfg.n_ff //= 2
    if arch == "plamo2" and not cfg.attn_scale:
        # plamo2 scales attention by 1/sqrt(v_dim), not qk_dim
        # (src/models/plamo2.cpp build_plamo2_attn_layer)
        cfg.attn_scale = 1.0 / float(np.sqrt(cfg.head_dim_v))
    from .registry import apply_arch_defaults

    apply_arch_defaults(cfg)
    # qwen3next marks recurrency by interval, not a per-layer kv array
    # (src/models/qwen3next.cpp:17-23: recurrent iff (i+1) % interval != 0)
    fai = _k(g, "{arch}.full_attention_interval")
    if fai is not None:
        cfg.full_attn_interval = int(fai)
    if cfg.full_attn_interval and not cfg.kv_head_pattern:
        cfg.kv_head_pattern = tuple(
            cfg.n_head_kv if (i + 1) % cfg.full_attn_interval == 0 else 0
            for i in range(cfg.n_layer))
    if cfg.alibi_max_bias > 0:  # ALiBi replaces rope (baichuan-13b etc.)
        cfg.use_rope = False
    if arch == "smallthinker" and cfg.sliding_window:
        # swa layers rope; the periodic dense layers do NOT
        # (src/models/smallthinker.cpp:108)
        cfg.no_rope_interval = cfg.swa_pattern
    # granite-hybrid: rope_finetuned acts as the rope on/off switch
    # (src/models/granite-hybrid.cpp load_arch_hparams)
    rft = _k(g, "{arch}.rope.scaling.finetuned")
    if rft is not None and cfg.hybrid_rope:
        cfg.hybrid_rope = bool(rft)
    return cfg
