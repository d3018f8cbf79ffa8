"""Flash attention kernel vs the XLA einsum reference (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.models.config import ModelConfig
from tpullm.models.llama import attention
from tpullm.ops.flash_attention import flash_attention, flash_supported


def _cfg(**kw):
    base = dict(n_head=4, n_head_kv=2, head_dim=128, head_dim_v=128, n_embd=512)
    base.update(kw)
    return ModelConfig(**base)


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape) * 0.5,
                       jnp.bfloat16)


def _nmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return ((a - b) ** 2).mean() / max((b ** 2).mean(), 1e-12)


@pytest.mark.parametrize("T,S", [(128, 256), (256, 512)])
def test_flash_matches_einsum_causal(T, S):
    cfg = _cfg()
    B, H, Hkv, D = 1, 4, 2, 128
    q = _rand((B, T, H, D), 0)
    k = _rand((B, S, Hkv, D), 1)
    v = _rand((B, S, Hkv, D), 2)
    q_slots = jnp.arange(T, dtype=jnp.int32)[None] + (S - T)  # suffix queries
    kv_positions = jnp.arange(S, dtype=jnp.int32)[None]
    positions = q_slots
    vf = jnp.zeros((B,), jnp.int32)

    kh, vh = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)  # head-major
    ref = attention(q, kh, vh, q_slots, kv_positions, positions, vf, cfg, False)
    got = flash_attention(q, kh, vh, q_slots, kv_positions, positions, vf, cfg,
                          False, interpret=True)
    assert got.shape == ref.shape
    assert _nmse(got, ref) < 2e-4, _nmse(got, ref)


def test_flash_valid_from_window():
    cfg = _cfg()
    B, T, S = 1, 128, 256
    q = _rand((B, T, 4, 128), 3)
    k = _rand((B, S, 2, 128), 4)
    v = _rand((B, S, 2, 128), 5)
    q_slots = jnp.arange(T, dtype=jnp.int32)[None] + 64
    kv_positions = jnp.arange(S, dtype=jnp.int32)[None] - 16
    positions = q_slots - 16
    vf = jnp.full((B,), 16, jnp.int32)  # first 16 slots invalid
    kh, vh = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)  # head-major
    ref = attention(q, kh, vh, q_slots, kv_positions, positions, vf, cfg, False)
    got = flash_attention(q, kh, vh, q_slots, kv_positions, positions, vf, cfg,
                          False, interpret=True)
    assert _nmse(got, ref) < 2e-4


def test_flash_swa_and_softcap():
    cfg = _cfg(sliding_window=64, attn_logit_softcap=30.0)
    B, T, S = 1, 128, 256
    q = _rand((B, T, 4, 128), 6)
    k = _rand((B, S, 2, 128), 7)
    v = _rand((B, S, 2, 128), 8)
    q_slots = jnp.arange(T, dtype=jnp.int32)[None] + (S - T)
    kv_positions = jnp.arange(S, dtype=jnp.int32)[None]
    positions = q_slots
    vf = jnp.zeros((B,), jnp.int32)
    kh, vh = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)  # head-major
    ref = attention(q, kh, vh, q_slots, kv_positions, positions, vf, cfg, True)
    got = flash_attention(q, kh, vh, q_slots, kv_positions, positions, vf, cfg,
                          True, interpret=True)
    assert _nmse(got, ref) < 3e-4


def test_flash_supported_gate():
    assert flash_supported(128, 256, 128, 128)
    assert not flash_supported(64, 256, 128, 128)   # T too small
    assert not flash_supported(128, 200, 128, 128)  # S not tiled
    assert not flash_supported(128, 256, 64, 64)    # head_dim 64
