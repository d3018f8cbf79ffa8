"""Decode flash-attention kernel vs the XLA einsum attention oracle.

The kernel (ops/flash_decode.py) must match models.llama.attention's
masking contract exactly: slot-causal + valid_from, sliding window
(standard and chunked), logit softcap, attention sinks, GQA, int8 KV.
Runs in interpret mode so CI needs no TPU (the reference CPU test strategy:
every backend vs the CPU oracle, tests/test-backend-ops.cpp).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpullm.models.config import ModelConfig
from tpullm.models.llama import attention, _kv_quant
from tpullm.ops.flash_decode import flash_decode, flash_decode_supported


def _mk(B=2, T=1, H=8, Hkv=2, Dk=128, Dv=128, S=1024, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, H, Dk)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, Dk)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, Dv)) * 0.3, jnp.bfloat16)
    q_slots = jnp.asarray(
        rng.integers(T, S - T, (B, 1)) + np.arange(T)[None, :], jnp.int32)
    valid_from = jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32)
    positions = q_slots - valid_from[:, None]
    kv_positions = jnp.arange(S)[None, :] - valid_from[:, None]
    return q, k, v, q_slots, valid_from, positions, kv_positions


def _jref(cfg, **kw):
    # jit: eager bf16 einsum dispatch is unsupported by this CPU runtime's
    # DotThunk (production paths are always jitted)
    return jax.jit(lambda *a: attention(*a, cfg, **kw))


def _jfd(cfg, **kw):
    return jax.jit(lambda *a: flash_decode(*a, cfg, interpret=True, **kw))


def _nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(((a - b) ** 2).mean() / max((b ** 2).mean(), 1e-12))


def _cfg(**kw):
    d = dict(arch="llama", vocab_size=64, n_embd=1024, n_layer=1,
             n_head=8, n_head_kv=2, n_ff=64, head_dim=128)
    d.update(kw)
    return ModelConfig(**d)


def test_flash_decode_plain():
    q, k, v, qs, vf, pos, kvp = _mk()
    cfg = _cfg()
    ref = _jref(cfg)(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                     qs, kvp, pos, vf)
    out = _jfd(cfg)(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                    qs, pos, vf)
    assert _nmse(out, ref) < 1e-4


def test_flash_decode_swa_softcap_sinks():
    q, k, v, qs, vf, pos, kvp = _mk(seed=1)
    cfg = _cfg(sliding_window=256, attn_logit_softcap=30.0)
    sinks = jnp.asarray(np.random.default_rng(2).standard_normal(8),
                        jnp.float32)
    ref = _jref(cfg, layer_is_swa=True, sinks=sinks)(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), qs, kvp, pos, vf)
    out = _jfd(cfg, window=256, sinks=sinks)(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), qs, pos, vf)
    assert _nmse(out, ref) < 1e-4


def test_flash_decode_chunked_window():
    q, k, v, qs, vf, pos, kvp = _mk(seed=3)
    cfg = _cfg(sliding_window=128, swa_chunked=True)
    ref = _jref(cfg, layer_is_swa=True)(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), qs, kvp, pos, vf)
    out = _jfd(cfg, window=128)(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), qs, pos, vf)
    assert _nmse(out, ref) < 1e-4


def test_flash_decode_multitoken_int8():
    """T=4 (speculative verify shape) with the quantized KV cache."""
    q, k, v, qs, vf, pos, kvp = _mk(T=4, seed=4)
    cfg = _cfg()
    kq, ks = _kv_quant(k)
    vq, vs = _kv_quant(v)
    kd = (kq.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
    vd = (vq.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    ref = _jref(cfg)(q, kd.transpose(0, 2, 1, 3), vd.transpose(0, 2, 1, 3),
                     qs, kvp, pos, vf)
    out = jax.jit(lambda *a: flash_decode(
        *a, cfg, k_scales=ks.transpose(0, 2, 1),
        v_scales=vs.transpose(0, 2, 1), interpret=True))(
        q, kq.transpose(0, 2, 1, 3), vq.transpose(0, 2, 1, 3), qs, pos, vf)
    assert _nmse(out, ref) < 1e-3


def test_flash_decode_mqa_big_head():
    """MQA (Hkv=1) with Dk=256 (gemma-esque head width)."""
    q, k, v, qs, vf, pos, kvp = _mk(H=4, Hkv=1, Dk=256, Dv=256, S=512, seed=5)
    cfg = _cfg(n_head=4, n_head_kv=1, head_dim=256, n_embd=1024)
    ref = _jref(cfg)(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                     qs, kvp, pos, vf)
    out = _jfd(cfg)(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                    qs, pos, vf)
    assert _nmse(out, ref) < 1e-4


def test_supported_gate(monkeypatch):
    # off by default (XLA over bucketed views A/B-won on hardware)
    monkeypatch.delenv("TPULLM_FLASH_DECODE", raising=False)
    assert not flash_decode_supported(1, 1, 1024, 128, 128, 8)
    # env-gated opt-in for experiments
    monkeypatch.setenv("TPULLM_FLASH_DECODE", "1")
    assert flash_decode_supported(1, 1, 1024, 128, 128, 8)
    assert not flash_decode_supported(1, 16, 1024, 128, 128, 8)  # T too big
    assert not flash_decode_supported(1, 1, 1000, 128, 128, 8)   # S % 256
    assert not flash_decode_supported(1, 1, 1024, 80, 80, 8)     # head dim
    assert not flash_decode_supported(1, 1, 1024, 576, 512, 1)   # MLA Dk
