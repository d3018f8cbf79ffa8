"""Architecture registry: per-arch defaults and graph-builder dispatch.

Counterpart of src/llama-arch.{h,cpp} (127 archs) + the graph-builder dispatch
in src/llama-model.cpp:2056. Each entry sets structural flags on ModelConfig;
the decoder-graph function itself is shared where the dataflow is identical
(most Llama-family archs differ only in flags, which is why one functional
builder + a flag table covers many of the reference's 128 builder classes).
"""
from __future__ import annotations

from typing import Callable

ARCH_REGISTRY: dict[str, dict] = {
    # rope_type: "norm" = interleaved pairs (ggml GGML_ROPE_TYPE_NORM),
    # "neox" = half-split. Matches llama_model_rope_type() per arch.
    "llama": dict(rope_type="norm"),
    # llama4 (src/models/llama4.cpp): 3-chunked-1-full attention pattern,
    # iRoPE (every 4th layer NoPE + floor-scaled attn temperature), QK
    # L2-norm on rope layers, sigmoid-gated MoE
    "llama4": dict(rope_type="norm", swa_pattern=4, swa_chunked=True,
                   no_rope_interval=4, attn_temp_scale=0.1,
                   qk_l2_norm=True, expert_gating="sigmoid"),
    "mistral": dict(rope_type="norm"),
    # mistral3 (src/models/mistral3.cpp): llama graph + optional attention
    # temperature scaling; mistral4 subclasses deepseek2 (MLA attention,
    # src/models/models.h llama_model_mistral4)
    "mistral3": dict(rope_type="norm"),
    "mistral4": dict(rope_type="neox"),
    # llama-embed (src/models/models.h llama_model_llama_embed): the llama
    # graph in embedding mode — same weights/dataflow, pooled output
    "llama-embed": dict(rope_type="norm"),
    "qwen2": dict(rope_type="neox", attn_bias=True),
    # qwen2vl (src/models/qwen2vl.cpp): the qwen2 graph with M-RoPE
    # (ggml_rope_multi + rope.dimension_sections). For TEXT tokens all
    # position channels are equal, under which the M-RoPE sector walk
    # (ggml-cpu/ops.cpp ggml_mrope_cache_init) reduces EXACTLY to neox
    # rope; image-grid positions route through the mtmd path
    "qwen2vl": dict(rope_type="neox", attn_bias=True),
    "qwen3": dict(rope_type="neox", attn_qk_norm=True),
    "qwen3moe": dict(rope_type="neox", attn_qk_norm=True,
                     expert_weights_norm=True),
    "qwen2moe": dict(rope_type="neox", attn_bias=True),
    "gemma": dict(rope_type="neox", act_fn="gelu", embedding_scale=-1.0),
    "gemma2": dict(rope_type="neox", act_fn="gelu", post_norms=True,
                   embedding_scale=-1.0, swa_pattern=2,
                   # reference defaults when the GGUF lacks the keys
                   # (src/models/gemma2.cpp: ml.get_key(..., false) over
                   # hparams.h defaults 50/30)
                   attn_logit_softcap=50.0, final_logit_softcap=30.0),
    "gemma3": dict(rope_type="neox", act_fn="gelu", post_norms=True, attn_qk_norm=True, embedding_scale=-1.0, swa_pattern=6),
    "phi2": dict(rope_type="neox", parallel_residual=True, norm_type="layernorm", act_fn="gelu", ffn_gate=False, attn_bias=True),
    "phi3": dict(rope_type="neox"),
    # mixtral (llama MoE branch, src/models/llama.cpp:208): top-k
    # router weights are RENORMALIZED (build_moe_ffn norm_w=true)
    "mixtral": dict(rope_type="norm", expert_weights_norm=True),
    "deepseek": dict(rope_type="norm"),
    "deepseek2": dict(rope_type="neox"),
    "gpt-oss": dict(rope_type="neox", act_fn="swiglu_oai", attn_bias=True),
    "starcoder2": dict(rope_type="neox", norm_type="layernorm", act_fn="gelu", ffn_gate=False, attn_bias=True),
    "gptneox": dict(rope_type="neox", norm_type="layernorm", act_fn="gelu", ffn_gate=False, parallel_residual=True, attn_bias=True),
    "stablelm": dict(rope_type="neox", norm_type="layernorm"),
    # olmo2 (src/models/olmo2.cpp:45): FLAT q/k RMS norms over the
    # full row ({n_embd} / {n_kv*head_dim}), applied before rope
    "olmo2": dict(rope_type="neox", post_norms=True, pre_norm=False,
              attn_qk_norm_flat=True),
    "smollm3": dict(rope_type="norm"),
    "granite": dict(rope_type="norm"),
    "internlm2": dict(rope_type="norm"),
    "exaone": dict(rope_type="norm"),
    # exaone4 (src/models/exaone4.cpp): post-norm ONLY like olmo2
    "exaone4": dict(rope_type="neox", post_norms=True, pre_norm=False,
                    attn_qk_norm=True),
    "minicpm": dict(rope_type="norm"),
    "cohere2": dict(rope_type="norm", norm_type="layernorm", swa_pattern=4),
    # recurrent SSM family — src/models/mamba.cpp (+falcon-mamba via
    # ssm.dt_b_c_rms KV on the same arch)
    "mamba": dict(),
    "mamba2": dict(),
    # hybrid attention+recurrent — src/models/jamba.cpp (no rope on the
    # attention layers; per-layer head_count_kv array selects the family)
    "jamba": dict(),
    # hybrid mamba2+attention — src/models/nemotron-h.cpp: each layer is
    # exactly ONE of {mamba2, attention, relu^2-FFN}; attention has no rope
    "nemotron_h": dict(ffn_gate=False, ffn_only_layers=True),
    # nemotron-h-moe (src/models/nemotron-h-moe.cpp reuses the nemotron-h
    # graph): MoE-FFN layers with UNGATED relu^2 experts in an optional
    # latent space (ffn_latent_down/up), sigmoid gating (hardcoded in
    # build_ffn_layer) + probs bias, ungated relu^2 shared expert
    "nemotron_h_moe": dict(ffn_gate=False, ffn_only_layers=True,
                           expert_gating="sigmoid"),
    # granite-hybrid (src/models/granite-hybrid.cpp): jamba-shaped layers
    # (mixer + FFN each) with granite scales and roped attention
    "granitehybrid": dict(rope_type="norm", hybrid_rope=True),
    # falcon-h1 (src/models/falcon-h1.cpp): attention AND mamba2 run in
    # PARALLEL on the same norm in every layer, then a gated FFN
    "falcon-h1": dict(rope_type="neox", hybrid_parallel=True,
                      hybrid_rope=True),
    # RWKV6 recurrent family — src/models/rwkv6.cpp (layernorm + dynamic
    # 5-way lerp + wkv6 bonus kernel); rwkv6qwen2 wraps the rwkv6 time-mix
    # in a qwen2 block (rmsnorm, gated silu FFN, GLA kernel, no LN0)
    "rwkv6": dict(norm_type="layernorm"),
    "rwkv6qwen2": dict(),
    # RWKV7 recurrent family — src/models/rwkv7.cpp (layernorm everywhere)
    "rwkv7": dict(norm_type="layernorm"),
    "arwkv7": dict(norm_type="layernorm"),
    # encoder-decoder family — src/models/t5.cpp (rel-pos buckets, no rope)
    "t5": dict(),
    "t5encoder": dict(causal=False),
    # encoder (bidirectional) family — src/models/bert.cpp shares one
    # post-LN graph across bert/nomic/jina; modern/neo/euro/gemma-embedding
    # have pre-norm graphs (models/bert.py covers all of them)
    "bert": dict(norm_type="layernorm", act_fn="gelu", ffn_gate=False,
                 attn_bias=True, causal=False),
    # nomic-bert (src/models/nomic-bert.cpp): rope (neox) + gated-SILU MLP
    "nomic-bert": dict(rope_type="neox", norm_type="layernorm",
                       causal=False),
    # nomic-bert-moe: GELU MoE every 2nd layer, bert-style dense layers
    "nomic-bert-moe": dict(rope_type="neox", norm_type="layernorm",
                           act_fn="gelu", ffn_gate=False, causal=False),
    # jina-bert-v2 (src/models/jina-bert-v2.cpp): bidirectional ALiBi,
    # optional flat LN qk-norm, gated-GELU MLP, no positions
    "jina-bert-v2": dict(norm_type="layernorm", act_fn="gelu",
                         attn_bias=True, alibi_max_bias=8.0,
                         attn_qk_norm_flat=True, causal=False),
    # jina-bert-v3: the bert graph + neox rope, no learned positions
    "jina-bert-v3": dict(rope_type="neox", norm_type="layernorm",
                         act_fn="gelu", ffn_gate=False, causal=False),
    # modern-bert (src/models/modern-bert.cpp): pre-LN, fused wqkv, GEGLU
    # (fused [gate;up]), symmetric local attention 2-of-3 layers
    "modern-bert": dict(rope_type="neox", norm_type="layernorm",
                        act_fn="gelu", swa_pattern=3, swa_dense_first=True,
                        causal=False),
    # neo-bert (src/models/neo-bert.cpp): pre-LN RMS, fused-SWIGLU MLP
    "neo-bert": dict(rope_type="norm", causal=False),
    # eurobert (src/models/eurobert.cpp): pre-LN RMS llama-shaped encoder
    "eurobert": dict(rope_type="neox", causal=False),
    # gemma-embedding (src/models/gemma-embedding.cpp): gemma3 block in
    # bidirectional embedding mode (scaled embeddings, qk RMS, post norms,
    # symmetric SWA with its own rope base)
    "gemma-embedding": dict(rope_type="neox", act_fn="gelu",
                            attn_qk_norm=True, post_norms=True,
                            embedding_scale=-1.0, swa_pattern=6,
                            causal=False),
    "command-r": dict(rope_type="norm", norm_type="layernorm", parallel_residual=True),
    # ---- legacy GPT family (layernorm + biases, learned/ALiBi positions,
    # src/models/{gpt2,starcoder,bloom,mpt,jais,codeshell}.cpp) ----
    "gpt2": dict(norm_type="layernorm", act_fn="gelu", ffn_gate=False,
                 attn_bias=True, use_rope=False),
    "starcoder": dict(norm_type="layernorm", act_fn="gelu", ffn_gate=False,
                      attn_bias=True, use_rope=False),
    "codeshell": dict(rope_type="neox", norm_type="layernorm", act_fn="gelu",
                      ffn_gate=False, attn_bias=True),
    "bloom": dict(norm_type="layernorm", act_fn="gelu", ffn_gate=False,
                  attn_bias=True, use_rope=False),
    "mpt": dict(norm_type="layernorm", act_fn="gelu", ffn_gate=False,
                use_rope=False, attn_qk_norm_flat=True),
    "jais": dict(norm_type="layernorm", act_fn="silu", attn_bias=True,
                 use_rope=False),
    # falcon (src/models/falcon.cpp): parallel attention+FFN off the attn
    # norm (7B) or a second norm (40B, attn_norm_2)
    "falcon": dict(rope_type="neox", norm_type="layernorm", act_fn="gelu",
                   ffn_gate=False, parallel_residual=True),
    # olmo-1 (src/models/olmo.cpp): weightless layernorm, optional clamp
    "olmo": dict(rope_type="norm", norm_type="layernorm"),
    "olmoe": dict(rope_type="neox", attn_qk_norm_flat=True),
    "dbrx": dict(rope_type="neox", norm_type="layernorm",
                 expert_weights_norm=True),
    "nemotron": dict(rope_type="neox", norm_type="layernorm", act_fn="relu2",
                     ffn_gate=False, attn_bias=True),
    # chatglm/glm4 (src/models/{chatglm,glm4}.cpp): partial rope; glm4 adds
    # gemma2-style post norms
    "chatglm": dict(rope_type="norm", attn_bias=True),
    "glm4": dict(rope_type="norm", post_norms=True),
    "orion": dict(rope_type="neox", norm_type="layernorm"),
    "baichuan": dict(rope_type="norm"),
    "xverse": dict(rope_type="norm"),
    "qwen": dict(rope_type="neox", attn_bias=True),
    "plamo": dict(rope_type="neox", parallel_residual=True),
    # PLaMo-2 hybrid (src/models/plamo2.cpp): mamba layers with per-head
    # scalar decay + dt/B/C norms interleaved with roped attention; both
    # mixer AND ffn are post-normed before the residual (sandwich); the
    # attention scale is 1/sqrt(v_dim) (build_plamo2_attn_layer)
    "plamo2": dict(rope_type="neox", hybrid_rope=True, post_norms=True,
                   attn_qk_norm=True),
    # PLaMo-3 (src/models/plamo3.cpp): dense transformer, fused QKV +
    # shared per-head-dim q/k norms (pre-rope), sandwich post-norms, fused
    # swiglu ffn_up, optional SWA pattern
    "plamo3": dict(rope_type="neox", post_norms=True, attn_qk_norm=True),
    # deci / nemotron-NAS (src/models/deci.cpp): llama blocks with
    # per-layer (n_head, n_head_kv, n_ff) — attention-free layers,
    # "linear attention" (norm->wo only) layers, FFN-free layers; routed
    # through the hybrid group walker (per-group shapes)
    "deci": dict(rope_type="norm", hybrid_graph=True, hybrid_rope=True),
    # openelm (src/models/openelm.cpp): per-layer head counts, fused QKV
    # ordered by heads, shared per-head-dim q/k RMS norms (pre-rope),
    # neox rope, tied embeddings
    "openelm": dict(rope_type="neox", hybrid_graph=True, hybrid_rope=True,
                    attn_qk_norm=True),
    # gptj: enum-only in the reference (no loader/graph there,
    # src/llama-arch.cpp:17 with no llama_model_gptj) — covered here by
    # the flag table: parallel residual, gelu MLP, first-rot-dims rope
    "gptj": dict(rope_type="norm", parallel_residual=True, act_fn="gelu",
                 ffn_gate=False),
    # llama-shaped singles (src/models/{arcee,ernie4-5,seed-oss,...}.cpp)
    "arcee": dict(rope_type="norm", act_fn="relu2", ffn_gate=False),
    "ernie4_5": dict(rope_type="norm"),
    "seed_oss": dict(rope_type="neox"),
    "hunyuan-dense": dict(rope_type="neox", attn_qk_norm=True),
    "granitemoe": dict(rope_type="norm"),
    # ---- MoE family batch (src/models/{ernie4-5-moe,glm4-moe,phimoe,
    # exaone-moe,dots1,bailingmoe,hunyuan-moe}.cpp) ----
    "ernie4_5-moe": dict(rope_type="norm"),
    "glm4moe": dict(rope_type="neox", attn_qk_norm=True),
    # gemma4 (src/models/gemma4.cpp): per-layer token-embedding stream
    # (gated into each layer's output), trailing layers share the last KV
    # layers' caches, optional wv (v = k), WEIGHTLESS V rms-norm, NO
    # attention scaling (f_attention_scale = 1.0), gelu FFN, sandwich
    # norms, per-layer out_scale, final logit softcap
    "gemma4": dict(rope_type="neox", act_fn="gelu", post_norms=True,
                   attn_qk_norm=True, attn_scale=1.0, gemma4_attn=True,
                   embedding_scale=-1.0),
    # gemma3n (src/models/gemma3n.cpp): AltUp 4-stream residual stack +
    # laurel low-rank bypass + per-layer token-embedding stream +
    # activation sparsity on the first 10 layers + trailing shared-KV
    # layers (>=20); weightless V norm, no attention scaling, swa period 5
    "gemma3n": dict(rope_type="neox", act_fn="gelu", post_norms=True,
                    attn_qk_norm=True, attn_scale=1.0, gemma4_attn=True,
                    embedding_scale=-1.0, swa_pattern=5, altup_n=4,
                    n_layer_sparsity=10, final_logit_softcap=30.0),
    # deepseek2-ocr (src/models/deepseek2ocr.cpp + deepseek2.cpp is_ocr
    # branch): PLAIN MHA (no MLA) with full-head neox rope hardcoded in
    # the graph, deepseek-style gated MoE + shared experts after a dense
    # lead
    "deepseek2-ocr": dict(rope_type="neox"),
    # hunyuan_vl (src/models/hunyuan-vl.cpp): qwen2vl-shaped with
    # POST-rope per-head qk RMS norms and XDRoPE alpha freq-base scaling
    "hunyuan_vl": dict(rope_type="neox", attn_qk_norm=True,
                       qk_norm_post_rope=True),
    # cogvlm (src/models/cogvlm.cpp): fused-QKV llama block with a
    # parallel VISION-EXPERT weight set (visexp_*) selected per token
    # kind; text serving uses the language weights
    "cogvlm": dict(rope_type="neox"),
    # paddleocr (src/models/paddleocr.cpp): "same with qwen2vl.cpp, but
    # bias tensors are optional" — M-RoPE text reduction applies
    "paddleocr": dict(rope_type="neox", attn_bias=True),
    # mimo2 (src/models/mimo2.cpp): per-layer SWA array + swa rope base,
    # optional per-layer attention sinks, attention-output value scale,
    # sigmoid MoE with probs bias, nextn trim
    "mimo2": dict(rope_type="neox", expert_gating="sigmoid"),
    # step35 (src/models/step35.cpp): qk norms, per-layer SWA array,
    # per-HEAD sigmoid attention gate (g_proj -> (n_head,)), MoE + shexp
    "step35": dict(rope_type="neox", attn_qk_norm=True,
                   attn_gate_proj=True),
    # kimi-linear (src/models/kimi-linear.cpp): KDA (per-key-channel-decay
    # delta attention w/ separate q/k/v convs + sigmoid-gated output norm)
    # on kv==0 layers, ROPELESS absorbed-MQA MLA on the rest, renormalized
    # MoE + gated shared expert after a dense lead
    "kimi-linear": dict(),
    # glm-dsa (src/models/glm-dsa.cpp): deepseek2's MLA graph verbatim
    # (models.h:1013 `using graph = llama_model_deepseek2::graph`) +
    # sigmoid-gated MoE w/ probs bias; the DSA indexer tensors are loaded
    # but UNUSED by the reference graph (sparse top-k not implemented
    # there) — mirrored here by ignoring them at load
    "glm-dsa": dict(rope_type="neox", expert_gating="sigmoid"),
    "phimoe": dict(rope_type="neox", norm_type="layernorm"),
    "exaone-moe": dict(rope_type="neox", attn_qk_norm=True),
    "dots1": dict(rope_type="neox", attn_qk_norm=True),
    "bailingmoe": dict(rope_type="norm"),
    "hunyuan-moe": dict(rope_type="neox", attn_qk_norm=True),
    # minicpm3 (src/models/minicpm3.cpp): MLA attention like deepseek2
    "minicpm3": dict(rope_type="neox"),
    # refact (src/models/refact.cpp): ALiBi hardcoded to 8.0 (no GGUF KV),
    # which also disables rope (llama_model_rope_type -> NONE)
    "refact": dict(alibi_max_bias=8.0),
    # jais2 (src/models/jais2.cpp): layernorm + relu2 no-gate MLP, biases on
    # attention and FFN projections
    "jais2": dict(rope_type="neox", norm_type="layernorm", act_fn="relu2",
                  ffn_gate=False, attn_bias=True),
    # pangu-embedded (src/models/pangu-embed.cpp): llama-shape, wo bias
    "pangu-embedded": dict(rope_type="neox"),
    # maincoder (src/models/maincoder.cpp): per-head qk norm AFTER rope
    "maincoder": dict(rope_type="norm", attn_qk_norm=True,
                      qk_norm_post_rope=True),
    # smallthinker (src/models/smallthinker.cpp): every-layer relu MoE with
    # the ROUTER reading the raw layer input (pre-norm), renormalized top-k,
    # dense-first SWA pattern whose dense layers skip rope
    "smallthinker": dict(rope_type="neox", act_fn="relu",
                         expert_weights_norm=True, moe_router_pre_norm=True,
                         swa_dense_first=True, no_rope_offset=0),
    # qwen3next (src/models/qwen3next.cpp): gated-delta-net linear
    # attention on 3 of every 4 layers (full_attention_interval), gated
    # full attention (Q emits [query|gate], per-head qk RMS + rope) on the
    # rest; every layer MoE (renormalized softmax top-k) + sigmoid-gated
    # shared expert
    "qwen3next": dict(rope_type="neox", attn_qk_norm=True,
                      attn_out_gate=True, hybrid_rope=True,
                      expert_weights_norm=True, full_attn_interval=4),
    # qwen35 / qwen35moe (src/models/qwen35.cpp, qwen35moe.cpp): the
    # qwen3next hybrid shape with SEPARATE beta/alpha GDN projections
    # (TILED k-head repeat via plain ggml_repeat, not interleave), M-RoPE
    # sections on the full-attention layers (text reduces to neox), dense
    # silu FFN (qwen35) or renorm-softmax MoE + sigmoid-gated shared
    # expert (qwen35moe)
    "qwen35": dict(rope_type="neox", attn_qk_norm=True, attn_out_gate=True,
                   hybrid_rope=True, full_attn_interval=4),
    "qwen35moe": dict(rope_type="neox", attn_qk_norm=True,
                      attn_out_gate=True, hybrid_rope=True,
                      expert_weights_norm=True, full_attn_interval=4),
    # minimax-m2 (src/models/minimax-m2.cpp): flat (full-row) qk RMS before
    # rope, every layer MoE with router probs bias
    "minimax-m2": dict(rope_type="neox", attn_qk_norm_flat=True),
    # qwen3vl/qwen3vlmoe (src/models/qwen3vl.cpp): the qwen3 graph with
    # interleaved M-RoPE (ggml_rope_multi IMROPE). For TEXT tokens every
    # position channel is equal, under which each interleaved section
    # rotates by the same angle as plain neox rope — image-grid positions
    # route through the mtmd path. Deepstack visual layers only act on
    # image embeddings (n_deepstack_layers extra channels).
    "qwen3vl": dict(rope_type="neox", attn_qk_norm=True),
    "qwen3vlmoe": dict(rope_type="neox", attn_qk_norm=True,
                       expert_weights_norm=True),
    # lfm2 / lfm2moe (src/models/lfm2.cpp): hybrid of short-convolution
    # mixers (recurrent layers) and qk-normed roped attention; per-layer
    # head_count_kv zeros mark the conv layers. lfm2moe adds sigmoid MoE
    # with probs bias past the dense lead.
    "lfm2": dict(rope_type="neox", attn_qk_norm=True, hybrid_rope=True),
    "lfm2moe": dict(rope_type="neox", attn_qk_norm=True, hybrid_rope=True,
                    expert_gating="sigmoid"),
    # wavtokenizer-dec (src/models/wavtokenizer-dec.cpp): the TTS vocoder —
    # codes -> conv/PosNet/ConvNeXt -> ISTFT head (models/wavtokenizer.py)
    "wavtokenizer-dec": dict(norm_type="layernorm", causal=False,
                             use_rope=False),
    # bitnet b1.58 (src/models/bitnet.cpp): RMS sub-norms inside the
    # attention/FFN blocks, per-tensor output scales, tied lm_head
    "bitnet": dict(rope_type="neox", sub_norms=True),
    # grok-1 (src/models/grok.cpp): attention logits softcapped at 30 with
    # the scale applied INSIDE the tanh (build_attn LLM_ARCH_GROK branch,
    # llama-graph.cpp:2009-2020), post-attn/ffn norms, scaled embeddings +
    # logits, GELU MoE with renormalized router, optional dense FFN summed
    # with the MoE output at sqrt(2)/2. (The router_logit_softcapping hparam
    # is loaded by the reference but never applied in its graph.)
    "grok": dict(rope_type="neox", act_fn="gelu", post_norms=True,
                 expert_weights_norm=True, attn_logit_softcap=30.0,
                 attn_scale=0.08838834764831845,
                 embedding_scale=78.38367176906169,
                 logit_scale=0.5773502691896257,
                 moe_dense_parallel="grok"),
    # arctic (src/models/arctic.cpp): dense n_embd-wide residual MLP plus a
    # parallel MoE read from its own norm of the LAYER INPUT (ffn_norm_exps)
    "arctic": dict(rope_type="norm", expert_weights_norm=True,
                   moe_dense_parallel="arctic"),
    # chameleon (src/models/chameleon.cpp): per-head LAYERNORM q/k-norm
    # (with bias) before rope; swin_norm variant not fabricated
    "chameleon": dict(rope_type="norm", attn_qk_norm=True,
                      qk_norm_type="layernorm"),
    # plm (src/models/plm.cpp): MLA attention (direct wq + legacy wkv_b)
    # with a relu^2 ungated MLP
    "plm": dict(rope_type="norm", act_fn="relu2", ffn_gate=False),
    # apertus (src/models/apertus.cpp): qk RMS norm + ungated xIELU MLP
    "apertus": dict(rope_type="neox", attn_qk_norm=True, ffn_gate=False,
                    act_fn="xielu"),
    # bailingmoe2 (src/models/bailingmoe2.cpp): fused wqkv, per-head
    # qk-norm, leading dense layers, router probs bias + shared experts,
    # gating func from GGUF (sigmoid in shipped checkpoints)
    "bailingmoe2": dict(rope_type="neox", attn_qk_norm=True),
    # grovemoe (src/models/grovemoe.cpp): qwen3-style attention; MoE plus
    # adjugate "chunk" experts indexed main_id // experts_per_group, scaled
    # by expert_group_scale, sharing the main router's sigmoid probs
    "grovemoe": dict(rope_type="neox", attn_qk_norm=True,
                     expert_weights_norm=True),
    # afmoe (src/models/afmoe.cpp): gemma-scaled embeddings, iSWA 3:1 with
    # iRoPE-style no-rope on every 4th layer, per-head qk-norm, attention
    # output gate (sigmoid of a separate projection of the attn input),
    # dual pre/post norms, sigmoid MoE with probs bias + shared expert
    "afmoe": dict(rope_type="neox", attn_qk_norm=True, post_norms=True,
                  attn_gate_proj=True, embedding_scale=-1.0,
                  no_rope_interval=4, swa_pattern=4,
                  expert_gating="sigmoid"),
    # rnd1 (src/models/rnd1.cpp): qwen3moe graph in diffusion mode
    "rnd1": dict(rope_type="neox", attn_qk_norm=True,
                 expert_weights_norm=True, diffusion=True),
    # diffusion LMs (src/models/llada.cpp, dream.cpp, llada-moe.cpp):
    # hparams.causal_attn = false; generation runs the iterative denoising
    # loop in runtime/diffusion.py (examples/diffusion/diffusion.cpp)
    "llada": dict(rope_type="norm", diffusion=True),
    "dream": dict(rope_type="neox", attn_bias=True, diffusion=True),
    "llada-moe": dict(rope_type="neox", attn_qk_norm=True, diffusion=True),
}


def get_arch(name: str) -> dict:
    return ARCH_REGISTRY.get(name, {})


def apply_arch_defaults(cfg) -> None:
    """Registry rows are per-arch DEFAULTS, not overrides: a value the GGUF
    set explicitly (i.e. the field no longer holds its dataclass default)
    wins — matching the reference's hparams pattern of presetting defaults
    then ml.get_key(..., required=false) (e.g. src/models/grok.cpp:4-22)."""
    import dataclasses

    field_defaults = {f.name: f.default for f in dataclasses.fields(type(cfg))}
    for k, v in get_arch(cfg.arch).items():
        if k in field_defaults and getattr(cfg, k) != field_defaults[k]:
            continue  # GGUF-provided value takes precedence
        if k == "embedding_scale" and v == -1.0:
            cfg.embedding_scale = float(cfg.n_embd) ** 0.5
        else:
            setattr(cfg, k, v)
