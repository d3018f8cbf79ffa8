"""Generic decoder-only transformer graph (Llama family) in functional JAX.

One builder covers the many reference graph-builders whose dataflow is
identical up to flags (src/models/llama.cpp, qwen2/3, mistral, gemma*, ...):
RMS/LayerNorm -> QKV -> RoPE -> GQA attention over a KV cache -> output proj
-> gated FFN, with optional parallel residual, QK-norm, post-norms, softcaps.

Weights are QTensor pytrees stacked over the layer axis; the layer loop is a
``lax.scan`` so compile time is depth-independent and XLA pipelines the
per-layer HBM streams. The KV cache is a preallocated device array updated
with dynamic_update_slice (the SET_ROWS analogue, SURVEY §2.1).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qtensor import QTensor
from .config import ModelConfig


def swa_flags(cfg: ModelConfig) -> list:
    """Per-layer is-SWA flags for interleaved local/global models
    (src/llama-hparams.h:132 set_swa_pattern: every swa_pattern-th layer
    is full attention)."""
    if cfg.sliding_window and cfg.swa_layer_pattern:
        # explicit per-layer flags (mimo2/step35/gemma4 swa_layers array)
        return [bool(f) for f in cfg.swa_layer_pattern[:cfg.n_layer]]
    if cfg.sliding_window and cfg.swa_pattern > 1:
        if cfg.swa_dense_first:  # smallthinker: layer il%p==0 is dense
            return [(li % cfg.swa_pattern) != 0 for li in range(cfg.n_layer)]
        return [((li + 1) % cfg.swa_pattern) != 0
                for li in range(cfg.n_layer)]
    return [False] * cfg.n_layer


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    """Per-model KV cache: k/v HEAD-MAJOR (L, B, H_kv, S_max, D).

    Head-major is the TPU-native layout: each head's (S, D) plane is a
    contiguous HBM stream, so the decode flash-attention kernel
    (ops/flash_decode.py) reads KV tiles as free outer-dim slices (no
    sublane relayout) and the prefill kernel needs no per-call transpose.

    Quantized mode (type_k/type_v q8 analogue, llama.h:357): k/v are int8
    with per-(head, pos) f32 row scales ks/vs — ~2x cache capacity; rows are
    quantized on write and dequantized at attention time.

    iSWA dual mode (llama_kv_cache_iswa, src/llama-kv-cache-iswa.*): for
    interleaved local/global models (gemma2/3 style), SWA layers keep only
    a ring of ``ring`` recent rows in kw/vw while full-attention layers
    keep the whole context in k/v — the reference's dual-cache memory win.
    ``ring`` must be >= sliding_window + the largest T any single forward
    writes (ring slots overwritten within one chunk are then provably
    outside every query's window)."""

    k: Any
    v: Any
    ks: Any = None  # (L, B, H_kv, S) f32 row scales when quantized
    vs: Any = None
    kw: Any = None  # (L_swa, B, H_kv, ring, D) iSWA ring bank
    vw: Any = None
    ring: int = 0  # static ring size (0 = single-cache mode)

    def tree_flatten(self):
        return (self.k, self.v, self.ks, self.vs, self.kw, self.vw), self.ring

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, ring=aux)

    @staticmethod
    def create(cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
               iswa: bool = False, max_chunk: int = 0):
        if cfg.kv_lora_rank:
            # MLA (deepseek2): the cache holds the COMPRESSED per-token state
            # [c_kv (kv_lora); k_pe (rope_dim)] as a single MQA head — this
            # is the whole point of MLA (src/llama-kv-cache + build_attn_mla)
            hkv = 1
            dk = cfg.kv_lora_rank + cfg.rope_dim
            dv = cfg.kv_lora_rank
        else:
            hkv, dk, dv = cfg.n_head_kv, cfg.head_dim, cfg.head_dim_v
        # gemma4 shared-KV: only the leading n_layer_kv_from_start layers
        # own cache rows; trailing layers reuse them (no banks allocated)
        n_kv = (cfg.n_layer if cfg.n_layer_kv_from_start < 0
                else cfg.n_layer_kv_from_start)
        flags = swa_flags(cfg)[:n_kv]
        dual = (iswa and any(flags) and not cfg.swa_chunked
                and not cfg.gemma4_attn
                and not cfg.kv_lora_rank and dtype not in ("q8", "int8"))
        n_full = n_kv - sum(flags) if dual else n_kv
        shape_k = (n_full, batch, hkv, max_len, dk)
        shape_v = (n_full, batch, hkv, max_len, dv)
        if dtype in ("q8", "int8"):
            return KVCache(
                jnp.zeros(shape_k, jnp.int8), jnp.zeros(shape_v, jnp.int8),
                jnp.zeros(shape_k[:-1], jnp.float32),
                jnp.zeros(shape_v[:-1], jnp.float32),
            )
        if not dual:
            return KVCache(jnp.zeros(shape_k, dtype), jnp.zeros(shape_v, dtype))
        ring = min(cfg.sliding_window + max(max_chunk, 1), max_len)
        n_swa = sum(flags)
        return KVCache(
            jnp.zeros(shape_k, dtype), jnp.zeros(shape_v, dtype),
            kw=jnp.zeros((n_swa, batch, hkv, ring, dk), dtype),
            vw=jnp.zeros((n_swa, batch, hkv, ring, dv), dtype),
            ring=ring,
        )

    @property
    def quantized(self) -> bool:
        return self.ks is not None

    @property
    def dual(self) -> bool:
        return self.kw is not None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def _kv_quant(x):
    """(B, T, H, D) -> (int8 values, (B, T, H) f32 scales)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    if w is not None:  # olmo-style weightless norm (build_norm NULL weight)
        y = y * w.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        y = y * w.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def rope_cache(cfg: ModelConfig, positions):
    """positions (B, T) -> (cos, sin) each (B, T, rope_dim//2), f32.

    Matches ggml_rope_ext semantics (ggml/include/ggml.h:2200-2260): theta_i =
    pos * base^(-2i/d), with linear/YaRN scaling applied to the frequency.
    """
    half = cfg.rope_dim // 2
    inv_freq = cfg.rope_base ** (-np.arange(0, half, dtype=np.float32) * 2.0 / cfg.rope_dim)
    inv_freq = jnp.asarray(inv_freq)
    pos = positions.astype(jnp.float32)[..., None]  # (B, T, 1)
    if cfg.rope_scaling == "linear" and cfg.rope_scale != 1.0:
        pos = pos / cfg.rope_scale
    theta = pos * inv_freq
    mscale = 1.0
    if cfg.rope_scaling == "yarn" and cfg.rope_orig_ctx:
        # YaRN ramp (reference: ggml rope_yarn, ggml/src/ggml-cpu/ops.cpp)
        freq = 1.0 / inv_freq
        lo = max(cfg.rope_yarn_low, 0.001)
        hi = max(cfg.rope_yarn_high, lo + 0.001)
        # dims wavelength thresholds
        d = np.arange(0, half, dtype=np.float32)
        wavelen = 2 * np.pi * cfg.rope_base ** (d * 2.0 / cfg.rope_dim)
        low_rot = cfg.rope_orig_ctx / hi
        high_rot = cfg.rope_orig_ctx / lo
        ramp = np.clip(
            (d - _rot_dim(low_rot, cfg)) / max(_rot_dim(high_rot, cfg) - _rot_dim(low_rot, cfg), 1e-3),
            0,
            1,
        )
        ramp = jnp.asarray(1 - ramp)
        theta_extrap = pos * inv_freq
        theta_interp = pos * inv_freq / cfg.rope_scale
        theta = theta_interp * (1 - ramp) + theta_extrap * ramp
        mscale = float(0.1 * np.log(cfg.rope_scale) + 1.0) if cfg.rope_scale > 1 else 1.0
        mscale *= cfg.rope_attn_factor
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def _rot_dim(n_rot: float, cfg: ModelConfig) -> float:
    return (
        cfg.rope_dim
        * np.log(cfg.n_ctx_train / (n_rot * 2 * np.pi))
        / (2 * np.log(cfg.rope_base))
    )


def apply_rope(x, cos, sin, rope_type: str, rope_dim: int):
    """x: (B, T, H, D). Rotates the first rope_dim dims of D."""
    B, T, H, D = x.shape
    xr = x[..., :rope_dim]
    rest = x[..., rope_dim:]
    c = cos[:, :, None, :].astype(x.dtype)  # (B, T, 1, half)
    s = sin[:, :, None, :].astype(x.dtype)
    if rope_type == "neox":
        half = rope_dim // 2
        x1, x2 = xr[..., :half], xr[..., half:]
        out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    else:  # "norm": interleaved pairs (x[2i], x[2i+1])
        x1 = xr[..., 0::2]
        x2 = xr[..., 1::2]
        r1 = x1 * c - x2 * s
        r2 = x2 * c + x1 * s
        out = jnp.stack([r1, r2], axis=-1).reshape(*xr.shape)
    return jnp.concatenate([out, rest], axis=-1) if rest.shape[-1] else out


def _mm(x, qt: QTensor, dtype, layer=None):
    """x (..., n_in) @ W^T for a QTensor W (n_out, n_in); fused Pallas
    dequant-matmul on TPU (tpullm.ops.qmm), dequant+dot elsewhere. ``layer``
    indexes layer-stacked weights inside the kernel (scalar prefetch), so the
    scan over depth never materializes per-layer weight slices."""
    from ..ops.qmm import qmm

    return qmm(x, qt, dtype, layer=layer)


def attention(q, k_all, v_all, q_slots, kv_positions, positions, valid_from,
              cfg: ModelConfig, layer_is_swa=False, window=None, sinks=None,
              scale=None, ring=0, kv_q8=None):
    """q: (B,T,H,Dk), k_all/v_all HEAD-MAJOR: (B,Hkv,S,D*). Returns
    (B,T,H,Dv).

    Masking is slot-based: kv slot s is attendable by the query at slot
    ``q_slots[b, t]`` iff ``valid_from[b] <= s <= q_slots[b, t]``. This
    replaces the reference's host-built KQ mask upload (SURVEY §A.8) with
    on-device positional comparisons. SWA additionally windows on real
    positions. GQA is grouped via reshape (no KV head replication).

    sinks (H,): per-head attention-sink logits (gpt-oss). The sink joins
    the softmax as a virtual extra key (max and denominator corrections,
    ggml_compute_forward_soft_max, ops.cpp:5369) without a value row — the
    output is scaled by 1 - p_sink.

    kv_q8: optional (k_int8, v_int8, k_scales, v_scales) raw quantized cache
    views (head-major); when the decode kernel path is taken it consumes the
    int8 rows directly (halved cache stream) instead of the XLA-dequantized
    k_all/v_all — the unused dequant is dead-code-eliminated.
    """
    B, T, H, Dk = q.shape
    Hkv, S = k_all.shape[1], k_all.shape[2]
    G = H // Hkv
    Dv = v_all.shape[-1]
    from ..ops.flash_attention import flash_attention, flash_supported
    from ..ops.flash_decode import flash_decode, flash_decode_supported
    from ..ops.qmm import use_pallas

    if (window is None and sinks is None and scale is None and not ring
            and cfg.alibi_max_bias == 0 and not cfg.diffusion
            and use_pallas() and flash_supported(T, S, Dk, Dv)):
        # prefill: online-softmax kernel, KV streamed in tiles (no O(T*S)
        # score materialization)
        return flash_attention(q, k_all, v_all, q_slots, kv_positions,
                               positions, valid_from, cfg, layer_is_swa)
    static_swa = isinstance(layer_is_swa, bool) and (
        window is None or isinstance(window, int))
    if (not ring and use_pallas() and static_swa
            and cfg.alibi_max_bias == 0 and not cfg.diffusion
            and flash_decode_supported(B, T, S, Dk, Dv, Hkv)):
        # decode / short verify bursts: KV-resident online-softmax kernel —
        # reads only ceil(pos/TS) cache tiles instead of the full padded S.
        # Falls through to XLA when the window is a traced per-layer value
        # (interleaved SWA inside one scan) — that path uses the dual cache
        # or the einsum fallback.
        win = 0
        if layer_is_swa and (cfg.sliding_window or window is not None):
            win = int(window if window is not None else cfg.sliding_window)
        if kv_q8 is not None:
            kq, vq, ksc, vsc = kv_q8
            return flash_decode(q, kq, vq, q_slots, positions, valid_from,
                                cfg, window=win, sinks=sinks, scale=scale,
                                k_scales=ksc, v_scales=vsc)
        return flash_decode(q, k_all, v_all, q_slots, positions, valid_from,
                            cfg, window=win, sinks=sinks, scale=scale)
    if scale is None:
        scale = cfg.attn_scale if cfg.attn_scale else 1.0 / float(np.sqrt(cfg.head_dim))
    qf = q.reshape(B, T, Hkv, G, Dk)
    scores = jnp.einsum("bthgd,bhsd->bhgts", qf, k_all,
                        preferred_element_type=jnp.float32)
    scores = scores * scale
    if cfg.alibi_max_bias > 0:
        # ALiBi: scores += slope_h * (kv_pos - q_pos); slope schedule per
        # ggml_compute_forward_soft_max (ops.cpp) max_bias semantics
        sl = jnp.asarray(alibi_slopes(H, cfg.alibi_max_bias)
                         ).reshape(1, Hkv, G, 1, 1)
        delta = (kv_positions[:, None, None, None, :].astype(jnp.float32)
                 - positions[:, None, None, :, None].astype(jnp.float32))
        scores = scores + sl * delta
    if cfg.attn_logit_softcap:
        scores = jnp.tanh(scores / cfg.attn_logit_softcap) * cfg.attn_logit_softcap
    kv_slot = jnp.arange(S)[None, None, None, None, :]  # (1,1,1,1,S)
    q_slot = q_slots[:, None, None, :, None]  # (B,1,1,T,1)
    if ring:
        # SWA ring bank (S == ring): slot j, as seen by the query at slot
        # q, holds the newest cache position <= q congruent to j mod ring.
        # With ring >= window + T, any slot overwritten inside this chunk
        # held a position already outside the window — so the reconstructed
        # position is exact and the window test is the whole mask.
        win = window if window is not None else cfg.sliding_window
        cand = q_slot - ((q_slot - kv_slot) % ring)  # (B,1,1,T,S)
        mask = ((cand >= valid_from[:, None, None, None, None])
                & (q_slot - cand < win))
    elif cfg.diffusion:
        # diffusion LMs (llada/dream) attend bidirectionally over every
        # slot written so far (hparams.causal_attn = false in the
        # reference; generation re-runs the full masked sequence)
        last = q_slots[:, -1][:, None, None, None, None]
        mask = (kv_slot <= last) & (kv_slot >= valid_from[:, None, None, None, None])
    else:
        mask = (kv_slot <= q_slot) & (kv_slot >= valid_from[:, None, None, None, None])
    if not ring and layer_is_swa and (cfg.sliding_window or window is not None):
        win = window if window is not None else cfg.sliding_window
        kv_pos = kv_positions[:, None, None, None, :]  # (B,1,1,1,S) real positions
        q_pos = positions[:, None, None, :, None]
        if cfg.swa_chunked:
            # llama4 LLAMA_SWA_TYPE_CHUNKED: attention stays within the
            # chunk-aligned window [floor(q_pos/win)*win, q_pos]
            mask = mask & (kv_pos >= (q_pos // win) * win)
        else:
            mask = mask & (kv_pos > q_pos - win)
    scores = jnp.where(mask, scores, -jnp.inf)
    if sinks is not None:
        sk = sinks.astype(jnp.float32).reshape(Hkv, G)[None, :, :, None]
        m = jnp.maximum(jnp.max(scores, axis=-1), sk)  # (B,Hkv,G,T)
        p = jnp.exp(scores - m[..., None])
        p = jnp.where(mask, p, 0.0)
        denom = p.sum(-1) + jnp.exp(sk - m)
        probs = p / denom[..., None]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)  # fully-masked rows
    # merge (g, t) into one free dim: a two-free-dim lhs dot is unsupported
    # by the CPU runtime's bf16 DotThunk (TPU is fine either way)
    pm = probs.astype(q.dtype).reshape(B, Hkv, G * T, S)
    out = jnp.einsum("bhrs,bhsd->bhrd", pm, v_all,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, Hkv, G, T, Dv).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, T, H, -1).astype(q.dtype)


def alibi_slopes(n_head: int, max_bias: float) -> np.ndarray:
    """Per-head ALiBi slopes (ggml_compute_forward_soft_max schedule)."""
    n2 = 1 << int(np.floor(np.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n2)
    m1 = 2.0 ** (-(max_bias / 2.0) / n2)
    return np.asarray(
        [m0 ** (h + 1) if h < n2 else m1 ** (2 * (h - n2) + 1)
         for h in range(n_head)], np.float32)


def moe_ffn(x, p, qw, li, cfg: ModelConfig, dtype, router_x=None):
    """Mixture-of-experts FFN (build_moe_ffn contract, src/llama-graph.h:831).

    Router: logits = x @ gate_inp^T -> softmax|sigmoid gating (+ optional
    probs bias), top-k, optional weight renorm and scaling. v1 computes all
    experts densely and mask-sums (correct for every batch shape; a ragged
    grouped-matmul kernel is the perf path for big MoEs — MUL_MAT_ID on TPU).
    """
    B, T, D = x.shape
    E, used = cfg.n_expert, cfg.n_expert_used
    # smallthinker routes on the RAW layer input, not the normed ffn input
    # (src/models/smallthinker.cpp:111)
    router = _mm(x if router_x is None else router_x,
                 qw["moe_gate_inp"], dtype, li)[..., :E].astype(jnp.float32)
    if "moe_gate_inp_b" in p:  # gpt-oss router bias
        router = router + p["moe_gate_inp_b"][None, None, :E]
    if cfg.expert_gating == "sigmoid":
        probs = jax.nn.sigmoid(router)
    else:
        probs = jax.nn.softmax(router, axis=-1)
    if "moe_probs_b" in p:
        sel_probs = probs + p["moe_probs_b"][None, None, :]
    else:
        sel_probs = probs
    if cfg.n_group_experts > 0:
        # grovemoe: SELECTION uses sigmoid(logits) while the combine
        # weights stay softmax (build_moe_ffn LLM_ARCH_GROVEMOE branch)
        sel_probs = jax.nn.sigmoid(router)
    top_p, top_i = jax.lax.top_k(sel_probs, used)  # (B, T, used)
    w = jnp.take_along_axis(probs, top_i, axis=-1)
    if cfg.expert_weights_norm:
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-9)
    w = w * cfg.expert_weights_scale

    # all-expert evaluation, mask-combined. For small batches (decode) each
    # expert is gated behind lax.cond on "any token selected it": unselected
    # experts' weights are never read, so the step reads ~(used/E) of the
    # expert bytes — the MUL_MAT_ID bandwidth behavior (ggml.h:507) without
    # a ragged kernel. At prefill most experts are active, so the dense
    # evaluation runs unconditionally (conds would all be true).
    gate_w = qw.get("moe_gate_exps")  # None: ungated relu^2 experts
    up_w = qw["moe_up_exps"]
    down_w = qw["moe_down_exps"]
    # nemotron-h-moe latent MoE (nemotron-h.cpp:99-103,210-245): experts
    # operate in a moe_latent_size space; the router reads the FULL input
    x_moe = x
    if "moe_latent_down" in qw:
        x_moe = _mm(x, qw["moe_latent_down"], dtype, li)
    D_out = down_w.shape[-2]  # latent width when latent projections exist

    def one_expert(e):
        ue = _expert_mm(x_moe, up_w, li, e, dtype)
        if "moe_up_exps_b" in p:
            ue = ue + p["moe_up_exps_b"][e].astype(dtype)
        if gate_w is None:  # ungated relu^2 (LLM_FFN_RELU_SQR, no gate)
            h = (jax.nn.relu(ue.astype(jnp.float32)) ** 2).astype(dtype)
        else:
            ge = _expert_mm(x_moe, gate_w, li, e, dtype)
            if "moe_gate_exps_b" in p:  # gpt-oss per-expert biases
                ge = ge + p["moe_gate_exps_b"][e].astype(dtype)
            if cfg.act_fn == "swiglu_oai":
                gf = jnp.clip(ge.astype(jnp.float32), None, 7.0)
                uf = jnp.clip(ue.astype(jnp.float32), -7.0, 7.0)
                h = (gf * jax.nn.sigmoid(1.702 * gf) * (uf + 1.0)).astype(dtype)
            elif cfg.act_fn == "gelu":
                h = jax.nn.gelu(ge.astype(jnp.float32), approximate=True).astype(dtype) * ue
            elif cfg.act_fn == "relu":
                h = jax.nn.relu(ge.astype(jnp.float32)).astype(dtype) * ue
            else:
                h = jax.nn.silu(ge.astype(jnp.float32)).astype(dtype) * ue
        de = _expert_mm(h, down_w, li, e, dtype)  # (B, T, D_out)
        if "moe_down_exps_b" in p:
            de = de + p["moe_down_exps_b"][e].astype(dtype)
        we = (w * (top_i == e)).sum(-1)  # (B, T)
        return de * we[..., None].astype(dtype)

    if B * T <= 16 or gate_w is None:  # decode: skip unselected experts
        def gated(e):
            return jax.lax.cond((top_i == e).any(),
                                lambda: one_expert(e),
                                lambda: jnp.zeros((B, T, D_out), dtype))
        out = gated(0)
        for e in range(1, E):
            out = out + gated(e)
    elif _ragged_moe_ok(gate_w, up_w, down_w, p, cfg, D):
        # prefill: ragged grouped GEMM over routed experts only
        # (MUL_MAT_ID; ops/moe_gmm.py) — FLOPs/bytes scale with actual
        # assignments instead of n_expert/n_used x dense-masked work
        out = _moe_prefill_ragged(x, w, top_i, gate_w, up_w, down_w,
                                  li, cfg, dtype)
    else:
        out = one_expert(0)
        for e in range(1, E):
            out = out + one_expert(e)

    if cfg.n_group_experts > 0 and "moe_gate_chexps" in qw:
        # grovemoe adjugate "chunk" experts (src/models/grovemoe.cpp:154):
        # chunk id = selected main expert id // experts_per_group; combine
        # weights are the softmax probs INDEXED AT THE CHUNK ID (the
        # reference reuses the full-expert probs row with chunk indices),
        # renormalized, and the chunk output is scaled by expert_group_scale
        # and added to the main MoE output (which it also reads as input).
        E_ch = E // cfg.n_group_experts
        used_ch = min(used, E_ch)
        chunk_i = top_i[..., :used_ch] // cfg.n_group_experts
        w_ch = jnp.take_along_axis(probs, chunk_i, axis=-1)
        if cfg.expert_weights_norm:
            w_ch = w_ch / jnp.maximum(w_ch.sum(-1, keepdims=True), 1e-9)
        w_ch = w_ch * cfg.expert_weights_scale
        xc = out  # the chunk bank reads the MAIN MoE output

        def one_chunk(e):
            ge = _expert_mm(xc, qw["moe_gate_chexps"], li, e, dtype)
            ue = _expert_mm(xc, qw["moe_up_chexps"], li, e, dtype)
            h = jax.nn.silu(ge.astype(jnp.float32)).astype(dtype) * ue
            de = _expert_mm(h, qw["moe_down_chexps"], li, e, dtype)
            we = (w_ch * (chunk_i == e)).sum(-1)
            return de * we[..., None].astype(dtype)

        adj = one_chunk(0)
        for e in range(1, E_ch):
            adj = adj + one_chunk(e)
        out = out + adj * cfg.expert_group_scale

    if "moe_latent_up" in qw:  # lift latent MoE output back to n_embd
        out = _mm(out, qw["moe_latent_up"], dtype, li)

    if "ffn_gate_shexp" in qw:  # DeepSeek-style always-on shared experts
        g = _mm(x, qw["ffn_gate_shexp"], dtype, li)
        u = _mm(x, qw["ffn_up_shexp"], dtype, li)
        h = jax.nn.silu(g.astype(jnp.float32)).astype(dtype) * u
        sh = _mm(h, qw["ffn_down_shexp"], dtype, li)
        if "moe_gate_inp_shexp" in p:
            # qwen2moe/qwen3next shared-expert gate: one sigmoid scalar
            # per token (src/models/qwen3next.cpp "shared_expert_gate")
            sg = jax.nn.sigmoid(jnp.einsum(
                "btd,d->bt", x.astype(jnp.float32),
                p["moe_gate_inp_shexp"].astype(jnp.float32)))
            sh = sh * sg[..., None].astype(sh.dtype)
        out = out + sh
    elif "ffn_up_shexp" in qw:  # nemotron-h-moe: UNGATED relu^2 shared
        u = _mm(x, qw["ffn_up_shexp"], dtype, li)
        h = (jax.nn.relu(u.astype(jnp.float32)) ** 2).astype(dtype)
        out = out + _mm(h, qw["ffn_down_shexp"], dtype, li)
    return out


def _ragged_moe_ok(gate_w, up_w, down_w, p, cfg, D) -> bool:
    from ..ops.moe_gmm import gmm_supported
    from ..ops.qmm import use_pallas

    if not use_pallas() and not getattr(cfg, "_moe_gmm_interpret", False):
        return False
    if "moe_gate_exps_b" in p or "moe_up_exps_b" in p:  # gpt-oss biases
        return False
    n_ff_e = gate_w.shape[-2]
    return (gmm_supported(gate_w, D) and gmm_supported(up_w, D)
            and gmm_supported(down_w, n_ff_e))


def _moe_prefill_ragged(x, w, top_i, gate_w, up_w, down_w, li, cfg, dtype):
    """Sorted-by-expert grouped MoE FFN (ops/moe_gmm.py)."""
    from ..ops.moe_gmm import grouped_qmm, sort_by_expert

    B, T, D = x.shape
    M = B * T
    used = top_i.shape[-1]
    interp = bool(getattr(cfg, "_moe_gmm_interpret", False))
    xf = x.reshape(M, D).astype(jnp.bfloat16)
    order, dest, tile_expert, Mp = sort_by_expert(
        top_i.reshape(M, used), cfg.n_expert, M)
    tok_s = order // used  # source token of each sorted assignment
    wt_s = w.reshape(M * used)[order]
    xs_pad = jnp.zeros((Mp, D), jnp.bfloat16).at[dest].set(xf[tok_s])
    n_ff_e = gate_w.shape[-2]
    g = grouped_qmm(xs_pad, tile_expert, gate_w, n_ff_e, layer=li,
                    interpret=interp)
    u = grouped_qmm(xs_pad, tile_expert, up_w, n_ff_e, layer=li,
                    interpret=interp)
    gf = g.astype(jnp.float32)
    if cfg.act_fn == "swiglu_oai":
        gf = jnp.clip(gf, None, 7.0)
        uf = jnp.clip(u.astype(jnp.float32), -7.0, 7.0)
        h = gf * jax.nn.sigmoid(1.702 * gf) * (uf + 1.0)
    elif cfg.act_fn == "gelu":
        h = jax.nn.gelu(gf, approximate=True) * u.astype(jnp.float32)
    else:
        h = jax.nn.silu(gf) * u.astype(jnp.float32)
    y = grouped_qmm(h.astype(jnp.bfloat16), tile_expert, down_w, D,
                    layer=li, interpret=interp)
    contrib = y[dest].astype(jnp.float32) * wt_s[:, None]
    out = jnp.zeros((M, D), jnp.float32).at[tok_s].add(contrib)
    return out.reshape(B, T, D).astype(dtype)


def _expert_mm(x, qt: QTensor, li, e: int, dtype):
    """x @ W_e^T for expert e of a stacked (L, E, n, k) QTensor."""
    data = qt.data
    if li is not None:
        data = {k: v[li] for k, v in data.items()}
    sub = QTensor(qt.qtype, qt.shape[-2:], {k: v[e] for k, v in data.items()})
    if sub.layout == "kmajor":
        from ..ops.qmm import qmm

        return qmm(x, sub, dtype)
    w = sub.dequant(dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def _lora_add(y, x_in, p: dict, key: str, dtype):
    """y += scale*(x @ A^T) @ B^T when adapter arrays are present
    (build_lora_mm, src/llama-graph.h:785; scale folded into A at load)."""
    a = p.get(f"lora_{key}_a")
    if a is None:
        return y
    b = p[f"lora_{key}_b"]
    d = jax.lax.dot_general(
        x_in.astype(jnp.float32), a.astype(jnp.float32),
        (((x_in.ndim - 1,), (1,)), ((), ())))
    d = jax.lax.dot_general(d, b.astype(jnp.float32), (((d.ndim - 1,), (1,)), ((), ())))
    return y + d.astype(y.dtype)


def ffn(x, qw, li, cfg: ModelConfig, dtype, p=None, want_mid=False):
    p = p or {}
    if cfg.ffn_gate:
        if "ffn_gateup" in qw:  # load-time fused gate+up (padded offsets)
            from ..ops.fuse import pad256

            y = _mm(x, qw["ffn_gateup"], dtype, li)
            g = y[..., : cfg.n_ff]
            u = y[..., pad256(cfg.n_ff): pad256(cfg.n_ff) + cfg.n_ff]
        elif "ffn_gate" not in qw and qw["ffn_up"].n_out == 2 * cfg.n_ff:
            # GGUF-combined [gate; up] in one tensor (phi-3 style)
            y = _mm(x, qw["ffn_up"], dtype, li)
            g = y[..., : cfg.n_ff]
            u = y[..., cfg.n_ff: 2 * cfg.n_ff]
        else:
            g = _mm(x, qw["ffn_gate"], dtype, li)
            u = _mm(x, qw["ffn_up"], dtype, li)
        g = _lora_add(g, x, p, "ffn_gate", dtype)
        u = _lora_add(u, x, p, "ffn_up", dtype)
        if "ffn_gate_s" in p:  # bitnet per-tensor output scales
            g = g * p["ffn_gate_s"].astype(dtype)
        if "ffn_up_s" in p:
            u = u * p["ffn_up_s"].astype(dtype)
        if "ffn_gate_b" in p:
            g = g + p["ffn_gate_b"].astype(dtype)
        if "ffn_up_b" in p:
            u = u + p["ffn_up_b"].astype(dtype)
        if cfg.act_fn == "silu":
            h = jax.nn.silu(g.astype(jnp.float32)).astype(dtype) * u
        elif cfg.act_fn == "relu":
            h = jax.nn.relu(g.astype(jnp.float32)).astype(dtype) * u
        elif cfg.act_fn == "gelu":
            h = jax.nn.gelu(g.astype(jnp.float32), approximate=True).astype(dtype) * u
        elif cfg.act_fn == "swiglu_oai":
            # gpt-oss variant: clamped swiglu with alpha=1.702, limit 7
            gf = jnp.clip(g.astype(jnp.float32), None, 7.0)
            uf = jnp.clip(u.astype(jnp.float32), -7.0, 7.0)
            h = (gf * jax.nn.sigmoid(1.702 * gf) * (uf + 1.0)).astype(dtype)
        else:
            raise ValueError(cfg.act_fn)
    else:
        u = _mm(x, qw["ffn_up"], dtype, li)
        u = _lora_add(u, x, p, "ffn_up", dtype)
        if "ffn_up_b" in p:
            u = u + p["ffn_up_b"].astype(dtype)
        uf = u.astype(jnp.float32)
        if cfg.act_fn == "gelu":
            h = jax.nn.gelu(uf, approximate=True).astype(dtype)
        elif cfg.act_fn == "xielu":
            # apertus xIELU (ggml-cpu/unary-ops.cpp op_xielu), per-layer
            # params already softplus-folded at config parse (ggml_xielu):
            #   x>0: a_p*x^2 + b*x;  x<=0: a_n*(expm1(min(x,eps)) - x) + b*x
            par = jnp.asarray(np.array(cfg.xielu, np.float32))  # (L, 4)
            a_n, a_p, b, eps = [par[li, j] for j in range(4)]
            pos = a_p * uf * uf + b * uf
            neg = a_n * (jnp.expm1(jnp.minimum(uf, eps)) - uf) + b * uf
            h = jnp.where(uf > 0, pos, neg).astype(dtype)
        else:
            h = (jax.nn.relu(uf) ** 2).astype(dtype)
    if cfg.sub_norms and "ffn_sub_norm" in p:
        # bitnet: RMS over the gated hidden BEFORE the down projection
        h = rms_norm(h, p["ffn_sub_norm"], cfg.rms_eps)
    out = _lora_add(_mm(h, qw["ffn_down"], dtype, li), h, p, "ffn_down", dtype)
    if "ffn_down_s" in p:
        out = out * p["ffn_down_s"].astype(dtype)
    if "ffn_down_b" in p:
        out = out + p["ffn_down_b"].astype(dtype)
    return (out, h) if want_mid else out


def _norm(x, w, b, cfg: ModelConfig):
    if cfg.norm_type == "layernorm":
        return layer_norm(x, w, b, cfg.norm_eps or cfg.rms_eps)
    return rms_norm(x, w, cfg.rms_eps)


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens,  # (B, T) int32
    positions,  # (B, T) int32 real positions (for RoPE / SWA)
    cache: KVCache,
    cache_pos,  # int32 scalar or (B,): cache slot this ubatch writes at, per row
    valid_from,  # (B,) first valid kv slot (= left-pad length)
    dtype=jnp.bfloat16,
    slot0=None,  # int32 scalar: first cache batch row this ubatch occupies
    logits_idx=None,  # int32 scalar: only compute logits for this T position
    return_hidden=False,  # also return final hidden states (embeddings API)
    collect_stats=False,  # also return per-layer matmul-input sum(x^2) stats
    collect_hidden=False,  # also return every layer's residual output (L,B,T,D)
    tp_axis=None,  # shard_map tensor-parallel axis name: psum after row-split
    embeds=None,  # (B, T, n_embd) f32: bypass the token-embedding lookup
    kv_view_len=None,  # STATIC int: attention reads only cache[..., :L, :].
    # The caller buckets it by the max written slot (host-known), so the
    # decode kernel's grid is sized by actual depth, not S_max — at
    # d=1024 in a 16k cache this cuts 16x of empty-but-not-free grid
    # steps per layer (the llama-bench depth-sweep fix).
):
    """Returns (logits (B, T, vocab) f32, new KVCache).

    Layouts supported:
    - batch engine: left-padded rows share slot indices (scalar cache_pos);
    - server slots: per-row cache_pos (each sequence at its own length), and
      ``slot0`` selects a contiguous sub-range of cache batch rows so a
      single-sequence prefill updates just its slot (B here = ubatch rows,
      cache batch = n_slots).
    """
    B, T = tokens.shape
    if embeds is not None:
        # multimodal / embedding input: rows come from the vision projector
        # (or caller); embedding_scale still applies uniformly, matching the
        # reference (src/llama-graph.cpp:1709 build_inp_embd feeds both the
        # token and embd paths through the same downstream scaling)
        x = jnp.asarray(embeds).astype(dtype)
    else:
        x = params["tok_embd"].take_rows(tokens, dtype)  # gather-then-dequant
    if cfg.embedding_scale != 1.0:
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(dtype)
    if "pos_embd" in params:
        # learned absolute positions (gpt2/starcoder: LLM_TENSOR_POS_EMBD)
        x = x + jnp.take(params["pos_embd"], positions, axis=0).astype(dtype)
    if "tok_norm" in params:
        # bloom: layernorm directly on the embedding (tok_norm)
        x = _norm(x, params["tok_norm"], params.get("tok_norm_b"), cfg)
    cos, sin = rope_cache(cfg, positions)
    # per-layer SWA rope base (gemma-family freq_base_swa): SWA layers
    # rope at a different frequency; selected per layer inside the scan
    if cfg.rope_base_swa and cfg.rope_base_swa != cfg.rope_base:
        import dataclasses as _dc

        cfg_swa = _dc.replace(cfg, rope_base=cfg.rope_base_swa, raw_kv={})
        cos_swa, sin_swa = rope_cache(cfg_swa, positions)
    else:
        cos_swa, sin_swa = cos, sin
    swa_arr = jnp.asarray(swa_flags(cfg), jnp.bool_) if cfg.sliding_window \
        else jnp.zeros((cfg.n_layer,), jnp.bool_)

    # gemma4 per-layer token-embedding stream (gemma4.cpp
    # build_inp_per_layer + project_per_layer_inputs): gathered per-layer
    # embeddings merge with a projection of the scaled input, one (B,T,P)
    # slice threaded to each layer through the scan xs
    pli_all = None
    if "per_layer_tok_embd" in params and cfg.n_embd_per_layer:
        import math as _math

        P, L_all = cfg.n_embd_per_layer, cfg.n_layer
        if embeds is not None:  # multimodal rows use the pad-token row
            ple = params["per_layer_tok_embd"].take_rows(
                jnp.zeros((B, T), jnp.int32), dtype)
        else:
            ple = params["per_layer_tok_embd"].take_rows(tokens, dtype)
        ple = (ple.astype(jnp.float32).reshape(B, T, L_all, P)
               * _math.sqrt(P))
        proj = _mm(x, params["per_layer_model_proj"], dtype)
        proj = (proj.astype(jnp.float32)
                / _math.sqrt(cfg.n_embd)).reshape(B, T, L_all, P)
        proj = rms_norm(proj, params["per_layer_proj_norm"], cfg.rms_eps)
        pli_all = (((proj.astype(jnp.float32) + ple) / _math.sqrt(2.0))
                   .astype(dtype).transpose(2, 0, 1, 3))  # (L, B, T, P)
    if cfg.altup_n > 1:
        # gemma3n altup stream expansion (gemma3n.cpp:119-130): project the
        # single input stream to altup_n-1 extra streams, each rescaled to
        # the input's per-token L2 magnitude; pack as (B, T, A*D)
        xf = x.astype(jnp.float32)
        tm = jnp.sqrt((xf ** 2).sum(-1, keepdims=True))  # (B,T,1)
        added = jnp.einsum("btd,jkd->btjk", xf,
                           params["altup_proj"].astype(jnp.float32))
        nm = jnp.sqrt((added ** 2).sum(-1, keepdims=True))
        added = added * (tm[..., None] / nm)
        x = (jnp.concatenate([xf[..., None, :], added], axis=-2)
             .reshape(B, T, -1).astype(dtype))

    S = cache.max_len
    uniform = jnp.ndim(cache_pos) == 0 and slot0 is None and B == cache.k.shape[1]
    cache_pos = jnp.broadcast_to(jnp.asarray(cache_pos, jnp.int32), (B,))
    slot0 = jnp.int32(0) if slot0 is None else jnp.asarray(slot0, jnp.int32)
    rows = jnp.arange(B)
    q_slots = cache_pos[:, None] + jnp.arange(T)[None, :]  # (B, T)
    kv_positions = jnp.arange(S)[None, :] - valid_from[:, None]  # (B, S)

    # QTensor weights stay layer-stacked OUTSIDE the scan (closed over);
    # the scan carries only the layer index and the small float tensors.
    # The fused kernel indexes the stacked HBM arrays directly — XLA never
    # copies a per-layer weight slice (SURVEY §7: graph-reuse inversion).
    # Depth may be segmented into groups of uniform quant signature (mixed
    # ftypes like Q4_K_M bump some layers' types): one scan per group. `qw`
    # is a free variable rebound per group before each scan trace.
    qw: dict = {}

    def _split_qkv(y):
        """Fused qkv row (B, T, Npad) -> q, k, v (padded-offset parts)."""
        from ..ops.fuse import pad256

        nq = cfg.n_head * cfg.head_dim
        nk = cfg.n_head_kv * cfg.head_dim
        nv = cfg.n_head_kv * cfg.head_dim_v
        ok, ov = pad256(nq), pad256(nq) + pad256(nk)
        return y[..., :nq], y[..., ok: ok + nk], y[..., ov: ov + nv]

    kv_quant = cache.quantized

    # per-run free variables, rebound before each scan trace (iSWA dual)
    ring_run = False
    g_off = 0  # global layer offset of the current group (swa_arr index)
    shared_banks = None  # gemma4 shared-KV runs: (k_full, v_full, k_swa, v_swa)

    def _store(bank, val, lr, bi=None, si=None, wrap=False):
        # bank layer-stacked head-major (L, Bc, Hkv, S[, D]); val
        # (B, T, Hkv[, D]); lr = run-relative layer index. The bank rides
        # the layer scan's CARRY, so this dynamic_update_slice aliases
        # IN-PLACE — the per-step cache cost is O(rows written), not
        # O(cache): passing banks as scan xs/ys instead forces XLA to copy
        # every bank through HBM each layer of each decode step (measured
        # 61 -> 27 tok/s at S_max 1k -> 16k before this layout).
        vt = (val.transpose(0, 2, 1, 3) if val.ndim == 4
              else val.transpose(0, 2, 1)).astype(bank.dtype)
        if uniform and not wrap:  # wrap: ring writes may cross the ring end
            return jax.lax.dynamic_update_slice(
                bank, vt[None],
                (lr, 0, 0, cache_pos[0]) + (0,) * (bank.ndim - 4))
        hh = jnp.arange(bank.shape[2])[None, :, None]
        return bank.at[(lr, bi[:, None, :], hh, si[:, None, :])].set(vt)

    def _view(bank, lr):
        # read this layer's slab, batch rows slot0..slot0+B, first
        # kv_view_len positions — ONE bounded dynamic_slice so the read
        # cost scales with the bucketed view, not max_seq_len
        S_b = bank.shape[3]
        # never slice a ring (iSWA window) bank: its slot math is modular
        L = (kv_view_len if (kv_view_len is not None and not ring_run
                             and kv_view_len < S_b) else S_b)
        b0 = jnp.int32(0) if uniform else slot0
        start = (lr, b0, 0, 0) + (0,) * (bank.ndim - 4)
        sizes = (1, B, bank.shape[2], L) + tuple(bank.shape[4:])
        return jax.lax.dynamic_slice(bank, start, sizes)[0]

    def _attend_qkv(q, k, v, p, kv, li=None, lr=None):
        """Flat q/k/v rows -> (q heads, kv views, updated cache parts)."""
        if cfg.attn_qk_norm_flat:
            # mpt qk_ln / olmoe: norm over the FLATTENED projection rows
            q = _norm(q, p.get("q_norm"), p.get("q_norm_b"), cfg)
            k = _norm(k, p.get("k_norm"), p.get("k_norm_b"), cfg)
        q = q.reshape(B, T, cfg.n_head, cfg.head_dim)
        k = k.reshape(B, T, cfg.n_head_kv, cfg.head_dim)
        v = v.reshape(B, T, cfg.n_head_kv, cfg.head_dim_v)
        if cfg.attn_qk_norm and not cfg.qk_norm_post_rope:
            if cfg.qk_norm_type == "layernorm":
                # chameleon: LAYERNORM with per-head (H, hd) weights+bias
                # over the head dim (src/models/chameleon.cpp:90-104,
                # torch-default eps 1e-5)
                eps = cfg.norm_eps or 1e-5
                q = layer_norm(q, p["q_norm"], p.get("q_norm_b"), eps)
                k = layer_norm(k, p["k_norm"], p.get("k_norm_b"), eps)
            else:
                q = rms_norm(q, p["q_norm"], cfg.rms_eps)
                k = rms_norm(k, p["k_norm"], cfg.rms_eps)
        if cfg.gemma4_attn:
            # gemma4: WEIGHTLESS rms-norm on V (gemma4.cpp:229)
            v = rms_norm(v, None, cfg.rms_eps)
        if not cfg.use_rope:
            q_r, k_r = q, k
        else:
            cos_l, sin_l = cos, sin
            if cos_swa is not cos and li is not None:
                sw = swa_arr[li + g_off]
                cos_l = jnp.where(sw, cos_swa, cos)
                sin_l = jnp.where(sw, sin_swa, sin)
            q_r = apply_rope(q, cos_l, sin_l, cfg.rope_type, cfg.rope_dim)
            k_r = apply_rope(k, cos_l, sin_l, cfg.rope_type, cfg.rope_dim)
        if cfg.attn_qk_norm and cfg.qk_norm_post_rope:  # maincoder
            q_r = rms_norm(q_r, p["q_norm"], cfg.rms_eps)
            k_r = rms_norm(k_r, p["k_norm"], cfg.rms_eps)
        if cfg.qk_l2_norm:  # llama4 Llama4TextL2Norm on rope layers
            ones = jnp.ones((cfg.head_dim,), jnp.float32)
            q_r = rms_norm(q_r, ones, cfg.rms_eps)
            k_r = rms_norm(k_r, ones, cfg.rms_eps)
        if cfg.no_rope_interval and li is not None:
            # iRoPE (llama4.cpp:144): every no_rope_interval-th layer skips
            # rope; its Q gets the floor-scaled attention temperature
            # (llm_graph_input_attn_temp, llama-graph.cpp:135-147)
            use_rope = ((li + cfg.no_rope_offset)
                        % cfg.no_rope_interval) != 0
            tmp = (jnp.log(jnp.floor(
                (positions.astype(jnp.float32) + cfg.attn_temp_offset)
                / cfg.attn_temp_floor) + 1.0)
                * cfg.attn_temp_scale + 1.0)  # (B, T)
            q_nr = (q.astype(jnp.float32)
                    * tmp[..., None, None]).astype(q.dtype)
            q = jnp.where(use_rope, q_r, q_nr)
            k = jnp.where(use_rope, k_r, k)
        else:
            q, k = q_r, k_r
        if cfg.clamp_kqv:
            q = jnp.clip(q, -cfg.clamp_kqv, cfg.clamp_kqv)
            k = jnp.clip(k, -cfg.clamp_kqv, cfg.clamp_kqv)
            v = jnp.clip(v, -cfg.clamp_kqv, cfg.clamp_kqv)
        bi = slot0 + rows[:, None]
        si = q_slots % cache.ring if ring_run else q_slots
        kv_q8 = None
        if kv_quant:
            k_cache, v_cache, ks_c, vs_c = kv
            kq, k_sc = _kv_quant(k)
            vq, v_sc = _kv_quant(v)
            k_cache = _store(k_cache, kq, lr, bi, si)
            v_cache = _store(v_cache, vq, lr, bi, si)
            ks_c = _store(ks_c, k_sc, lr, bi, si)
            vs_c = _store(vs_c, v_sc, lr, bi, si)
            k_view = (_view(k_cache, lr).astype(jnp.float32)
                      * _view(ks_c, lr)[..., None]).astype(dtype)
            v_view = (_view(v_cache, lr).astype(jnp.float32)
                      * _view(vs_c, lr)[..., None]).astype(dtype)
            kv_q8 = (_view(k_cache, lr), _view(v_cache, lr),
                     _view(ks_c, lr), _view(vs_c, lr))
            kv = (k_cache, v_cache, ks_c, vs_c)
        else:
            k_cache, v_cache = kv
            k_cache = _store(k_cache, k, lr, bi, si, wrap=ring_run)
            v_cache = _store(v_cache, v, lr, bi, si, wrap=ring_run)
            k_view = _view(k_cache, lr).astype(dtype)
            v_view = _view(v_cache, lr).astype(dtype)
            kv = (k_cache, v_cache)
        return q, k_view, v_view, kv, kv_q8

    def _attend(q, k, v, p, kv, li=None, lr=None):
        q, k_view, v_view, kv, kv_q8 = _attend_qkv(q, k, v, p, kv, li, lr)
        sinks = p.get("attn_sinks")  # per-head sink logits (gpt-oss)
        if dual:
            # iSWA dual cache: the run's SWA-ness is static — ring-masked
            # window attention over the small bank, or plain causal over
            # the full bank (llama_kv_cache_iswa's two caches)
            att = attention(q, k_view, v_view, q_slots, kv_positions,
                            positions, valid_from, cfg, ring_run,
                            sinks=sinks,
                            ring=cache.ring if ring_run else 0,
                            kv_q8=kv_q8)
        elif cfg.sliding_window and cfg.swa_pattern > 1 and li is not None:
            # interleaved local/global layers (gemma2/3, cohere2 style:
            # every swa_pattern-th layer is full attention,
            # src/llama-hparams.h:132 set_swa_pattern) — the window is a
            # traced per-layer value so one compiled graph covers both;
            # explicit per-layer arrays (mimo2/step35/gemma4 swa_layers)
            # index the flag table instead of the modular formula
            is_swa_l = (swa_arr[li + g_off] if cfg.swa_layer_pattern
                        else ((li + 1) % cfg.swa_pattern) != 0)
            window = jnp.where(is_swa_l, cfg.sliding_window, 1 << 30)
            att = attention(q, k_view, v_view, q_slots, kv_positions,
                            positions, valid_from, cfg, True,
                            window=window, sinks=sinks)
        else:
            is_swa = bool(cfg.sliding_window) and cfg.swa_pattern <= 1
            att = attention(q, k_view, v_view, q_slots, kv_positions,
                            positions, valid_from, cfg, is_swa, sinks=sinks,
                            kv_q8=kv_q8)
        return att.reshape(B, T, cfg.n_head * cfg.head_dim_v), kv

    def _attend_shared(h, p, li):
        """Q-only attention over the shared_banks views (gemma4/gemma3n
        trailing shared-KV layers, gemma3n.cpp:177-193): per-layer swa rope
        base + window select, no KV write. Returns post-wo (B,T,n_embd)."""
        q = _mm(h, qw["wq"], dtype, li)
        q = q.reshape(B, T, cfg.n_head, cfg.head_dim)
        if cfg.attn_qk_norm and "q_norm" in p:
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
        sw = swa_arr[li + g_off]
        cos_l = jnp.where(sw, cos_swa, cos)
        sin_l = jnp.where(sw, sin_swa, sin)
        q = apply_rope(q, cos_l, sin_l, cfg.rope_type, cfg.rope_dim)
        kf, vf, ksw, vsw = shared_banks
        k_view = jnp.where(sw, ksw, kf).astype(dtype)
        v_view = jnp.where(sw, vsw, vf).astype(dtype)
        window = jnp.where(sw, cfg.sliding_window or (1 << 30), 1 << 30)
        att = attention(q, k_view, v_view, q_slots, kv_positions,
                        positions, valid_from, cfg, True, window=window)
        att = att.reshape(B, T, cfg.n_head * cfg.head_dim_v)
        return _mm(att, qw["wo"], dtype, li)

    def _attend_mla(h, p, kv, li, lr=None):
        """MLA attention in the absorbed-MQA form (deepseek2.cpp is_mla):
        q_nope projects into the compressed space via wk_b, attention runs
        over the cached [c_kv; k_pe] rows (one shared KV head), and wv_b
        lifts the per-head output back to v_head_dim. The KV cache stays at
        kv_lora+rope per token regardless of head count."""
        lora, rope_d = cfg.kv_lora_rank, cfg.rope_dim
        nope = cfg.head_dim - rope_d
        H = cfg.n_head
        if "wq_a" in qw:
            ql = _mm(h, qw["wq_a"], dtype, li)[..., : cfg.q_lora_rank]
            ql = rms_norm(ql, p["q_a_norm"], cfg.rms_eps)
            q = _mm(ql, qw["wq_b"], dtype, li)
        else:
            q = _mm(h, qw["wq"], dtype, li)
        q = q[..., : H * cfg.head_dim].reshape(B, T, H, cfg.head_dim)
        q_nope, q_pe = q[..., :nope], q[..., nope:]
        kvp = _mm(h, qw["wkv_a"], dtype, li)
        c_kv = rms_norm(kvp[..., :lora], p["kv_a_norm"], cfg.rms_eps)
        k_pe = kvp[..., lora: lora + rope_d].reshape(B, T, 1, rope_d)
        q_pe = apply_rope(q_pe, cos, sin, cfg.rope_type, rope_d)
        k_pe = apply_rope(k_pe, cos, sin, cfg.rope_type, rope_d)
        # absorb q_nope into the compressed space: wk_b (H, lora, nope)
        q_abs = jnp.einsum("bthn,hln->bthl", q_nope.astype(jnp.float32),
                           p["wk_b"]).astype(dtype)
        qq = jnp.concatenate([q_abs, q_pe.astype(dtype)], axis=-1)
        k_new = jnp.concatenate([c_kv[:, :, None, :], k_pe.astype(dtype)],
                                axis=-1)
        v_new = c_kv[:, :, None, :]
        bi = slot0 + rows[:, None]
        si = q_slots
        if kv_quant:
            k_cache, v_cache, ks_c, vs_c = kv
            kq8, k_sc = _kv_quant(k_new)
            vq8, v_sc = _kv_quant(v_new)
            k_cache = _store(k_cache, kq8, lr, bi, si)
            v_cache = _store(v_cache, vq8, lr, bi, si)
            ks_c = _store(ks_c, k_sc, lr, bi, si)
            vs_c = _store(vs_c, v_sc, lr, bi, si)
            k_view = (_view(k_cache, lr).astype(jnp.float32)
                      * _view(ks_c, lr)[..., None]).astype(dtype)
            v_view = (_view(v_cache, lr).astype(jnp.float32)
                      * _view(vs_c, lr)[..., None]).astype(dtype)
            kv = (k_cache, v_cache, ks_c, vs_c)
        else:
            k_cache, v_cache = kv
            k_cache = _store(k_cache, k_new, lr, bi, si)
            v_cache = _store(v_cache, v_new, lr, bi, si)
            k_view = _view(k_cache, lr).astype(dtype)
            v_view = _view(v_cache, lr).astype(dtype)
            kv = (k_cache, v_cache)
        # kq_scale: mscale^2/sqrt(n_embd_head_k) under YaRN (deepseek2.cpp
        # pre-scaling); plain 1/sqrt otherwise
        import math as _math

        if (cfg.rope_scaling == "yarn" and cfg.rope_scale > 1
                and cfg.rope_yarn_log_mul):
            ms = cfg.rope_attn_factor * (
                1.0 + 0.1 * cfg.rope_yarn_log_mul * _math.log(cfg.rope_scale))
            mla_scale = ms * ms / _math.sqrt(cfg.head_dim)
        else:
            mla_scale = 1.0 / _math.sqrt(cfg.head_dim)
        att = attention(qq, k_view, v_view, q_slots, kv_positions, positions,
                        valid_from, cfg, scale=mla_scale)  # (B,T,H,lora)
        # lift back out: wv_b (H, v, lora)
        o = jnp.einsum("bthl,hvl->bthv", att.astype(jnp.float32),
                       p["wv_b"]).astype(dtype)
        return o.reshape(B, T, H * cfg.head_dim_v), kv

    def _per_layer_embd(x, p, li):
        """gemma4 per-layer token-embedding block (gemma4.cpp:338-359):
        x + post_norm(proj(gelu(inp_gate(x)) * pli_l)). No-op for models
        without the per-layer stream."""
        if "per_layer_inp_gate" not in qw or "pli" not in p:
            return x
        g = jax.nn.gelu(_mm(x, qw["per_layer_inp_gate"], dtype, li)
                        .astype(jnp.float32), approximate=True)
        cur = (g * p["pli"].astype(jnp.float32)).astype(dtype)
        cur = _mm(cur, qw["per_layer_proj"], dtype, li)
        cur = rms_norm(cur, p["per_layer_post_norm"], cfg.rms_eps)
        return x + cur

    def layer_fold(carry, inp):
        """One-program-per-layer path: the megakernel emitted this layer's
        fused qkv already; attention runs in XLA; the kernel then does
        wo+ffn AND the next layer's norm+qkv (ops/layer_kernel.ffn_block_qkv)."""
        x, y, kv = carry
        p, li, lr = inp
        from ..ops.layer_kernel import ffn_block_qkv

        q, k, v = _split_qkv(y.astype(dtype))
        att, kv = _attend(q, k, v, p, kv, li, lr)
        x, y_next = ffn_block_qkv(att, x, p["ffn_norm"], anrm_stacked,
                                  qw, li, cfg)
        if "cvec" in p:  # control vector on the layer output
            x = x + p["cvec"].astype(dtype)
        return (x, y_next, kv), None

    def _altup_layer(x, kv, p, li, lr):
        """gemma3n AltUp layer (src/models/gemma3n.cpp:133-262): the carry
        packs altup_n residual streams as (B, T, A*D). Router-predicted
        stream mix -> active stream through attention+laurel+ffn (with
        activation sparsity on the first n_layer_sparsity layers) ->
        innovation-corrected streams -> per-layer embedding into streams
        1..A-1."""
        A, D = cfg.altup_n, cfg.n_embd
        s = x.reshape(B, T, A, D).astype(jnp.float32)
        act = s[..., cfg.altup_act, :]

        def _modalities(y):
            # compute_router_modalities (gemma3n.cpp:402-410)
            ri = rms_norm(y, p["altup_router_norm"], cfg.rms_eps) / D
            return jnp.tanh(ri @ p["altup_router"].T.astype(jnp.float32))

        # altup_predict (gemma3n.cpp:414-434)
        mod = _modalities(act)  # (B,T,A)
        cp = (mod @ p["altup_predict_coef"].T.astype(jnp.float32))
        cp = cp.reshape(B, T, A, A)  # [j_out, i_in]
        preds = jnp.einsum("btji,btid->btjd", cp, s) + s
        ap = preds[..., cfg.altup_act, :]
        h = rms_norm(ap, p["attn_norm"], cfg.rms_eps).astype(dtype)
        # laurel low-rank bypass (gemma3n.cpp:375-383)
        lau = (h.astype(jnp.float32) @ p["laurel_l"].T.astype(jnp.float32)
               ) @ p["laurel_r"].T.astype(jnp.float32)
        lau = rms_norm(lau, p["laurel_post_norm"], cfg.rms_eps) \
            + h.astype(jnp.float32)
        if shared_banks is not None:
            att = _attend_shared(h, p, li)
        else:
            if "wqkv" in qw:  # load-time fused QKV (quantized checkpoints)
                q, k, v = _split_qkv(_mm(h, qw["wqkv"], dtype, li))
            else:
                q = _mm(h, qw["wq"], dtype, li)
                k = _mm(h, qw["wk"], dtype, li)
                v = _mm(h, qw["wv"], dtype, li)
            att, kv = _attend(q, k, v, p, kv, li, lr)
            att = _mm(att, qw["wo"], dtype, li)
        att = rms_norm(att, p["post_attn_norm"], cfg.rms_eps)
        cur = att.astype(jnp.float32) + ap
        attn_laurel = (cur + lau) * float(1.0 / np.sqrt(2.0))
        h2 = rms_norm(attn_laurel, p["ffn_norm"], cfg.rms_eps).astype(dtype)
        gate = _mm(h2, qw["ffn_gate"], dtype, li).astype(jnp.float32)
        up = _mm(h2, qw["ffn_up"], dtype, li).astype(jnp.float32)
        if cfg.n_layer_sparsity:
            # gaussian_topk activation sparsity (gemma3n.cpp:387-393):
            # relu-cut at mean + std*icdf(0.95), per token over n_ff
            mean = gate.mean(-1, keepdims=True)
            std = jnp.sqrt(((gate - mean) ** 2).sum(-1, keepdims=True)
                           / (gate.shape[-1] - 1))
            cut = jnp.maximum(gate - (mean + std * cfg.sparsity_std_mul), 0)
            gate = jnp.where(li + g_off < cfg.n_layer_sparsity, cut, gate)
        f = _mm((jax.nn.gelu(gate, approximate=True) * up).astype(dtype),
                qw["ffn_down"], dtype, li)
        f = rms_norm(f.astype(jnp.float32), p["post_ffn_norm"], cfg.rms_eps)
        gated = f + attn_laurel
        # altup_correct (gemma3n.cpp:439-459)
        cc = _modalities(gated) @ p["altup_correct_coef"].T.astype(
            jnp.float32) + 1.0  # (B,T,A)
        innov = gated - ap
        corrected = preds + innov[..., None, :] * cc[..., None]
        # per-layer embedding into streams 1..A-1 (gemma3n.cpp:230-255)
        fp = corrected[..., cfg.altup_act, :] \
            * p["altup_correct_scale"].astype(jnp.float32)
        fp = jax.nn.gelu(
            _mm(fp.astype(dtype), qw["per_layer_inp_gate"], dtype, li)
            .astype(jnp.float32), approximate=True)
        fp = fp * p["pli"].astype(jnp.float32)
        fp = _mm(fp.astype(dtype), qw["per_layer_proj"], dtype, li)
        fp = rms_norm(fp.astype(jnp.float32), p["per_layer_post_norm"],
                      cfg.rms_eps)
        corrected = jnp.concatenate(
            [corrected[..., :1, :], corrected[..., 1:, :] + fp[..., None, :]],
            axis=-2)
        x = corrected.astype(dtype).reshape(B, T, A * D)
        return (x, kv), (x if collect_hidden else None)

    def layer(carry, inp):
        x, kv = carry
        p, li, lr = inp
        if cfg.altup_n:
            return _altup_layer(x, kv, p, li, lr)
        x0 = x  # layer input (arctic's MoE branch norms THIS, arctic.cpp)
        # olmo2/exaone4 run attention on the RAW residual stream and
        # normalize only the outputs (src/models/olmo2.cpp:93)
        h = (_norm(x, p.get("attn_norm"), p.get("attn_norm_b"), cfg)
             if cfg.pre_norm else x)
        if cfg.kv_lora_rank > 0 and "wkv_a" in qw:
            att, kv = _attend_mla(h, p, kv, li, lr)
            att_in = att
            att = _mm(att, qw["wo"], dtype, li)
            if tp_axis:
                att = jax.lax.psum(att.astype(jnp.float32), tp_axis).astype(dtype)
            x = x + att
            h2 = _norm(x, p.get("ffn_norm"), p.get("ffn_norm_b"), cfg)
            if cfg.n_expert > 0 and "moe_gate_inp" in qw:
                f, hmid = moe_ffn(h2, p, qw, li, cfg, dtype), None
            else:
                f, hmid = ffn(h2, qw, li, cfg, dtype, p, want_mid=True)
            if tp_axis:
                f = jax.lax.psum(f.astype(jnp.float32), tp_axis).astype(dtype)
            x = x + f
            if "cvec" in p:
                x = x + p["cvec"].astype(dtype)
            return (x, kv), None
        if shared_banks is not None and "wk" not in qw and "wqkv" not in qw:
            # gemma4/gemma3n shared-KV layer: only a Q projection; attention
            # reads the cache of layer n_kv_from_start - (2 if swa else 1)
            # (llama-model.cpp:2005 reuse cb) — no KV write
            att = _attend_shared(h, p, li)
            if cfg.post_norms and "post_attn_norm" in p:
                att = _norm(att, p["post_attn_norm"], None, cfg)
            x = x + att
            h2 = _norm(x, p.get("ffn_norm"), p.get("ffn_norm_b"), cfg)
            f = ffn(h2, qw, li, cfg, dtype, p)
            if cfg.post_norms and "post_ffn_norm" in p:
                f = _norm(f, p["post_ffn_norm"], None, cfg)
            x = x + f
            x = _per_layer_embd(x, p, li)
            if "out_scale" in p:
                x = (x.astype(jnp.float32)
                     * p["out_scale"].astype(jnp.float32)).astype(dtype)
            if "cvec" in p:
                x = x + p["cvec"].astype(dtype)
            return (x, kv), (x if collect_hidden else None)
        nq = cfg.n_head * cfg.head_dim
        nk = cfg.n_head_kv * cfg.head_dim
        if "wqkv" in qw:  # load-time fused QKV (padded offsets)
            y = _mm(h, qw["wqkv"], dtype, li)
            q, k, v = _split_qkv(y)
        elif "wqkv_cat" in qw:  # GGUF-fused [q;k;v] (phi/gptneox style)
            y = _mm(h, qw["wqkv_cat"], dtype, li)
            if "bqkv_cat" in p:
                y = y + p["bqkv_cat"].astype(dtype)
            q = y[..., :nq]
            k = y[..., nq: nq + nk]
            v = y[..., nq + nk: nq + nk + cfg.n_head_kv * cfg.head_dim_v]
        else:
            q = _mm(h, qw["wq"], dtype, li)
            k = _mm(h, qw["wk"], dtype, li)
            # gemma4 alternative attention: v_proj may be absent -> v is the
            # RAW k projection, pre-k_norm (gemma4.cpp:218-221); the
            # weightless V rms-norm is applied downstream in _attend_qkv
            if "wv" in qw:
                v = _mm(h, qw["wv"], dtype, li)
            else:
                v = k
        q = _lora_add(q, h, p, "wq", dtype)
        k = _lora_add(k, h, p, "wk", dtype)
        v = _lora_add(v, h, p, "wv", dtype)
        if "wq_s" in p:  # bitnet per-tensor output scales
            q = q * p["wq_s"].astype(dtype)
            k = k * p["wk_s"].astype(dtype)
            v = v * p["wv_s"].astype(dtype)
        if cfg.attn_bias and "bq" in p:
            q = q + p["bq"].astype(dtype)
            k = k + p["bk"].astype(dtype)
            v = v + p["bv"].astype(dtype)
        att, kv = _attend(q, k, v, p, kv, li, lr)
        if cfg.attn_gate_proj and "wqkv_gate" in qw:
            # afmoe: attn_out * sigmoid(gate(attn_input)) BEFORE the output
            # projection (src/models/afmoe.cpp:177-190); step35's g_proj is
            # only (n_head,) wide — one sigmoid scalar per head
            # (src/models/step35.cpp:177-196)
            gate = _mm(h, qw["wqkv_gate"], dtype, li)
            if gate.shape[-1] == cfg.n_head:
                ab, at, _ = att.shape
                a4 = att.reshape(ab, at, cfg.n_head, cfg.head_dim_v)
                a4 = (a4.astype(jnp.float32) * jax.nn.sigmoid(
                    gate.astype(jnp.float32))[..., None]).astype(dtype)
                att = a4.reshape(ab, at, -1)
            else:
                att = (att.astype(jnp.float32)
                       * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(dtype)
        if use_block:
            # one fused program: wo + residual + rmsnorm + gate/up + act +
            # down + residual (ops/layer_kernel.py) — the decode hot path
            from ..ops.layer_kernel import ffn_block

            x = ffn_block(att, x, p["ffn_norm"], qw, li, cfg)
            if "cvec" in p:
                x = x + p["cvec"].astype(dtype)
            return (x, kv), None
        att_in = att
        if cfg.sub_norms and "attn_sub_norm" in p:
            # bitnet: RMS over the attention output BEFORE the projection
            att = rms_norm(att, p["attn_sub_norm"], cfg.rms_eps)
            att_in = att
        att = _mm(att, qw["wo"], dtype, li)
        att = _lora_add(att, att_in, p, "wo", dtype)
        if "wo_s" in p:
            att = att * p["wo_s"].astype(dtype)
        if "bo" in p:
            att = att + p["bo"].astype(dtype)
        if tp_axis:  # Megatron row-parallel wo: partial sums -> all-reduce
            att = jax.lax.psum(att.astype(jnp.float32), tp_axis).astype(dtype)
        if cfg.attn_out_scale:  # mimo2 value_scale on the post-wo output
            att = (att.astype(jnp.float32) * cfg.attn_out_scale).astype(dtype)
        if cfg.post_norms and "post_attn_norm" in p:
            att = _norm(att, p["post_attn_norm"], None, cfg)
        def _ffn(inp):
            if cfg.n_expert > 0 and "moe_gate_inp" in qw:
                rx = x if cfg.moe_router_pre_norm else None
                return moe_ffn(inp, p, qw, li, cfg, dtype, router_x=rx), None
            return ffn(inp, qw, li, cfg, dtype, p, want_mid=True)

        if cfg.residual_scale != 1.0:  # granite/minicpm f_residual_scale
            att = (att.astype(jnp.float32) * cfg.residual_scale).astype(dtype)
        if cfg.parallel_residual:
            if "attn_norm_2" in p:  # falcon-40B: separate parallel ffn norm
                h2 = _norm(x, p["attn_norm_2"], p.get("attn_norm_2_b"), cfg)
            elif "ffn_norm" in p:  # gptneox: ln_2 over the layer input
                h2 = _norm(x, p["ffn_norm"], p.get("ffn_norm_b"), cfg)
            else:  # phi2 / falcon-7B: ffn shares the attention norm
                h2 = h
            f, hmid = _ffn(h2)
            if tp_axis:
                f = jax.lax.psum(f.astype(jnp.float32), tp_axis).astype(dtype)
            x = x + att + f
        else:
            x = x + att
            h2 = (_norm(x, p.get("ffn_norm"), p.get("ffn_norm_b"), cfg)
                  if cfg.pre_norm else x)
            if (cfg.moe_dense_parallel == "grok" and cfg.n_expert > 0
                    and "moe_gate_inp" in qw):
                # grok: out = sqrt(2)/2 * (dense(h2) + moe(h2)) when the
                # dense FFN exists, else just the MoE (grok.cpp:158-185)
                moe = moe_ffn(h2, p, qw, li, cfg, dtype)
                if "ffn_up" in qw or "ffn_gateup" in qw:
                    dense = ffn(h2, qw, li, cfg, dtype, p)
                    f = ((dense.astype(jnp.float32) + moe.astype(jnp.float32))
                         * float(np.sqrt(2) / 2)).astype(dtype)
                else:
                    f = moe
                hmid = None
            elif (cfg.moe_dense_parallel == "arctic" and cfg.n_expert > 0
                    and "moe_gate_inp" in qw):
                # arctic: dense residual MLP on ffn_inp PLUS a MoE branch
                # normed from the LAYER INPUT (arctic.cpp:128-155):
                #   out = (dense(norm(ffn_inp)) + ffn_inp) + moe(norm_exps(x0))
                dense, hmid = ffn(h2, qw, li, cfg, dtype, p, want_mid=True)
                h_exp = _norm(x0, p.get("ffn_norm_exps"), None, cfg)
                f = dense + moe_ffn(h_exp, p, qw, li, cfg, dtype)
            else:
                f, hmid = _ffn(h2)
            if tp_axis:  # row-parallel ffn_down partials
                f = jax.lax.psum(f.astype(jnp.float32), tp_axis).astype(dtype)
            if cfg.post_norms and "post_ffn_norm" in p:
                f = _norm(f, p["post_ffn_norm"], None, cfg)
            if cfg.residual_scale != 1.0:
                f = (f.astype(jnp.float32) * cfg.residual_scale).astype(dtype)
            x = x + f
        x = _per_layer_embd(x, p, li)
        if "out_scale" in p:  # gemma4 per-layer output scalar
            x = (x.astype(jnp.float32)
                 * p["out_scale"].astype(jnp.float32)).astype(dtype)
        if collect_stats:
            # per-column sum(x^2) of each matmul's input over the ubatch
            # (the imatrix activation hook, tools/imatrix/imatrix.cpp:229)
            if hmid is None:
                hmid = jnp.zeros((B, T, cfg.n_ff), dtype)
            sf = lambda a: (a.astype(jnp.float32) ** 2).sum(axis=(0, 1))
            stats = (sf(h), sf(att_in), sf(h2), sf(hmid))
            if "cvec" in p:
                x = x + p["cvec"].astype(dtype)
            return (x, kv), stats
        if "cvec" in p:  # control vector (llama_adapter_cvec apply)
            x = x + p["cvec"].astype(dtype)
        if collect_hidden:  # cvector-generator taps every layer's output
            return (x, kv), x
        return (x, kv), None

    groups = params["layers"].get("__groups__") or [params["layers"]]
    all_stats = []
    all_hidden = []
    off = 0

    # iSWA dual cache: segment each group's depth into maximal runs of
    # uniform SWA-ness so every lax.scan reads ONE cache bank (full-context
    # k/v or the small kw/vw ring) — the per-run bank choice is static,
    # matching llama_kv_cache_iswa's two separate caches
    dual = cache.dual
    layer_swa = swa_flags(cfg)
    assert not (dual and kv_quant), "iSWA dual cache excludes quantized KV"

    def _kv_slices(lo, hi, run_swa=False):
        if dual and run_swa:
            return (cache.kw[lo:hi], cache.vw[lo:hi])
        parts = (cache.k[lo:hi], cache.v[lo:hi])
        if kv_quant:
            parts += (cache.ks[lo:hi], cache.vs[lo:hi])
        return parts

    from ..ops.layer_kernel import supported as _block_supported
    from ..ops.qmm import use_pallas as _use_pallas
    import os as _os

    # decode-path selection: "mega" (default) = fused layer megakernel,
    # "splitk" = per-pool split-K calls; overridable for A/B perf runs
    path = _os.environ.get("TPULLM_DECODE_PATH", "mega")

    new_full, new_swa = [], []
    bank_off = {False: 0, True: 0}  # cumulative per-bank layer counts
    run_records = []  # (global_lo, global_hi, kv_out) of finished runs
    for gl in groups:
        qw = {k: v for k, v in gl.items() if isinstance(v, QTensor)}
        fl = {k: v for k, v in gl.items() if not isinstance(v, QTensor)}
        g_off = off
        shared_run = (cfg.gemma4_attn and "wq" in qw and "wk" not in qw
                      and "wqkv" not in qw)
        use_block = (
            path == "mega"
            and B * T <= 16
            and not collect_stats
            and not collect_hidden
            and tp_axis is None
            and _use_pallas()
            and "ffn_norm" in gl
            and "ffn_norm_b" not in gl
            and not any(k in gl for k in ("bo", "ffn_up_b", "ffn_down_b",
                                          "ffn_gate_b", "attn_norm_2"))
            and not cfg.attn_bias
            and not cfg.attn_qk_norm_flat
            and cfg.kv_lora_rank == 0
            and not cfg.altup_n  # gemma3n: bespoke stream-stack layer
            and not any(k.startswith("lora_") for k in gl)
            and _block_supported(cfg, qw)
        )
        any_leaf = next(iter(gl.values()))
        L_g = (any_leaf.shape[0] if not isinstance(any_leaf, QTensor)
               else any_leaf.shape[0])
        if pli_all is not None:  # thread this group's per-layer inputs
            fl = dict(fl)
            fl["pli"] = pli_all[off:off + L_g]
        # uniform-bank runs within this group (single run when not dual)
        if dual:
            runs = []
            lo = 0
            for j in range(1, L_g + 1):
                if j == L_g or layer_swa[off + j] != layer_swa[off + lo]:
                    runs.append((lo, j, layer_swa[off + lo]))
                    lo = j
        else:
            runs = [(0, L_g, False)]
        use_fold = (
            use_block
            and "wqkv" in qw
            and len(groups) == 1
            and len(runs) == 1
            and "attn_norm" in gl
            and not cfg.no_rope_interval
        )
        # scan-body closure identity, scoped per (group, run kind):
        # lax.scan caches the traced jaxpr by (body identity, input avals),
        # and the bodies capture per-group state (qw, g_off) plus per-run
        # state (ring_run, shared_banks) by CLOSURE. Two aval-identical
        # scans with different closure state would replay the first trace's
        # constants (e.g. gemma4's two single-layer groups ran the same
        # weights twice). Fresh lambdas per (group, kind) bust exactly those
        # collisions while same-kind runs within a group (dual-iSWA's many
        # alternating segments) still share one trace.
        body_cache = {}

        def _body(kind, fn):
            if kind not in body_cache:
                body_cache[kind] = (lambda c, i: fn(c, i))
            return body_cache[kind]

        for lo, hi, run_swa in runs:
            ring_run = bool(dual and run_swa)
            layer_ = _body(("layer", ring_run, shared_run), layer)
            layer_fold_ = _body(("fold", ring_run), layer_fold)
            blo = bank_off[run_swa] if dual else off + lo
            ids = jnp.arange(lo, hi)
            rel = jnp.arange(0, hi - lo)  # run-relative bank index
            fl_r = {k: v[lo:hi] for k, v in fl.items()} if len(runs) > 1 else fl
            if shared_run:
                # gemma4 shared-KV run: bind the (already-updated) banks of
                # the last full/swa KV layers; this run writes no KV
                # (llama-model.cpp:2005 reuse cb)
                def _find(t):
                    for glo, ghi, ko in run_records:
                        if glo <= t < ghi:
                            return ko[0][t - glo], ko[1][t - glo]
                    return (cache.k[t], cache.v[t])
                nks = cfg.n_layer_kv_from_start
                kf, vf = _find(nks - 1)
                ksw, vsw = _find(nks - 2)
                shared_banks = (kf, vf, ksw, vsw)
                (x, _), ys = jax.lax.scan(layer_, (x, ()), (fl_r, ids, rel))
                shared_banks = None
                if collect_stats:
                    all_stats.append(ys)
                if collect_hidden:
                    all_hidden.append(ys)
                continue
            # KV banks ride the scan CARRY (not xs/ys): per-layer writes are
            # in-place dynamic updates on the carried buffer, so decode cost
            # is O(rows written + view read), not O(max_seq_len) — banks as
            # xs/ys forced a full-bank HBM copy per layer per step
            kv_in = _kv_slices(blo, blo + (hi - lo), run_swa)
            # DECODE UNROLL: a scanned layer walk passes the layer id as a
            # runtime scalar-prefetch value, which blocks cross-invocation
            # weight-DMA prefetch (the next megakernel's block addresses
            # depend on it) — measured 430 -> 460+ GB/s effective stream and
            # ~3x faster XLA compile when the decode walk is fully unrolled
            # so the layer ids become compile-time constants. Prefill keeps
            # the scan (compute-bound; depth-independent compile matters).
            unroll_walk = (
                B * T <= 16
                and (hi - lo) <= 64
                and not collect_stats
                and _os.environ.get("TPULLM_DECODE_UNROLL", "1") == "1"
                and _use_pallas()
            )
            if use_fold:
                # prime the carry: layer 0's norm + fused qkv; thereafter
                # each megakernel invocation emits the next layer's qkv
                anrm_stacked = gl["attn_norm"]
                h0 = rms_norm(x, anrm_stacked[0], cfg.rms_eps)
                y0 = _mm(h0, qw["wqkv"], dtype, jnp.int32(0))
                (x, _, kv_out), ys = jax.lax.scan(layer_fold_, (x, y0, kv_in),
                                                  (fl_r, ids, rel),
                                                  unroll=unroll_walk)
            else:
                (x, kv_out), ys = jax.lax.scan(layer_, (x, kv_in),
                                               (fl_r, ids, rel),
                                               unroll=unroll_walk)
            (new_swa if ring_run else new_full).append(kv_out)
            if not dual:
                run_records.append((off + lo, off + hi, kv_out))
            if collect_stats:
                all_stats.append(ys)
            if collect_hidden:
                all_hidden.append(ys)
            if dual:
                bank_off[run_swa] += hi - lo
        off += L_g
    def _cat(parts):
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def _rebuild(parts, i, old):
        # a bank can be empty (e.g. a tiny all-SWA model has no full
        # layers): keep its zero-layer array untouched
        return _cat([g[i] for g in parts]) if parts else old

    if dual:
        new_cache = KVCache(
            _rebuild(new_full, 0, cache.k), _rebuild(new_full, 1, cache.v),
            kw=_rebuild(new_swa, 0, cache.kw),
            vw=_rebuild(new_swa, 1, cache.vw),
            ring=cache.ring)
    else:
        new_cache = KVCache(*(_cat([g[i] for g in new_full])
                              for i in range(len(new_full[0]))))
    if logits_idx is not None:
        # lm_head over one position only (prefill chunks need just the last
        # real token's logits; skips the vocab matmul for the other T-1 rows)
        x = jax.lax.dynamic_slice_in_dim(x, jnp.asarray(logits_idx, jnp.int32), 1, axis=1)
    if cfg.altup_n > 1:
        # gemma3n altup merge (gemma3n.cpp:266-285): unembd-project streams
        # 1..A-1 back, magnitude-matched to the active stream, then mean
        A, D = cfg.altup_n, cfg.n_embd
        s = x.reshape(x.shape[0], x.shape[1], A, D).astype(jnp.float32)
        tm = jnp.sqrt((s[..., cfg.altup_act, :] ** 2)
                      .sum(-1, keepdims=True))  # (B,T,1)
        un = jnp.einsum("btjd,jkd->btjk", s[..., 1:, :],
                        params["altup_unembd_proj"].astype(jnp.float32))
        nm = jnp.sqrt((un ** 2).sum(-1, keepdims=True))
        un = un * (tm[..., None] / nm)
        x = (((s[..., 0, :] + un.sum(-2)) / A)).astype(dtype)
    x = _norm(x, params.get("output_norm"), params.get("output_norm_b"), cfg)
    hidden = x
    logits = _mm(x, params["output"], dtype).astype(jnp.float32)
    if cfg.logit_scale != 1.0:  # command-r/jais f_logit_scale
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    if collect_stats:
        stats = {
            "attn_in": jnp.concatenate([s[0] for s in all_stats], axis=0),
            "wo_in": jnp.concatenate([s[1] for s in all_stats], axis=0),
            "ffn_in": jnp.concatenate([s[2] for s in all_stats], axis=0),
            "ffn_down_in": jnp.concatenate([s[3] for s in all_stats], axis=0),
            "output_in": (hidden.astype(jnp.float32) ** 2).sum(axis=(0, 1)),
        }
        return logits, new_cache, stats
    if collect_hidden:
        return logits, new_cache, jnp.concatenate(all_hidden, axis=0)
    if return_hidden:
        return logits, new_cache, hidden
    return logits, new_cache
