"""Hybrid (Jamba) attention+recurrent model tests.

Covers: loader depth segmentation by family, the composed state (KV cache
over attention layers + recurrent bank over mamba layers,
llama-memory-hybrid analogue), prefill/decode consistency, and padding
invariance of the recurrent layers inside the hybrid graph.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpullm.models.hybrid import HybridState, attn_layer_ids, forward, is_hybrid
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_jamba_gguf


@pytest.fixture(scope="module")
def jamba(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "jamba.gguf")
    build_jamba_gguf(path, n_layer=4, seed=9)
    return load_model(path)


def test_config_and_groups(jamba):
    cfg, params, _ = jamba
    assert is_hybrid(cfg)
    assert cfg.kv_head_pattern == (0, 2, 0, 0)
    assert attn_layer_ids(cfg) == [1]
    groups = params["layers"].get("__groups__")
    assert groups is not None and len(groups) == 3  # mamba | attn | mamba x2
    assert "ssm_in" in groups[0] and "wq" in groups[1] and "ssm_in" in groups[2]


def _full_logits(cfg, params, toks, S=32):
    B, T = toks.shape
    st = HybridState.create(cfg, B, S, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, st = forward(params, cfg, jnp.asarray(toks), pos, st,
                         cache_pos=0, valid_from=jnp.zeros((B,), jnp.int32),
                         dtype=jnp.float32)
    return np.asarray(logits), st


def test_forward_runs(jamba):
    cfg, params, _ = jamba
    toks = np.asarray([[3, 9, 4, 17, 6]], np.int32)
    logits, st = _full_logits(cfg, params, toks)
    assert logits.shape == (1, 5, cfg.vocab_size)
    assert np.isfinite(logits).all()


def test_incremental_equals_full(jamba):
    """Prefill then step-decode must match one full forward (both the KV
    cache and the recurrent state carry correctly across calls)."""
    cfg, params, _ = jamba
    seq = [3, 9, 4, 17, 6, 2, 11]
    full, _ = _full_logits(cfg, params, np.asarray([seq], np.int32))

    S = 32
    st = HybridState.create(cfg, 1, S, jnp.float32)
    vf = jnp.zeros((1,), jnp.int32)

    def step(toks, pos0, st):
        T = len(toks)
        pos = (pos0 + jnp.arange(T, dtype=jnp.int32))[None]
        lg, st = forward(params, cfg, jnp.asarray([toks], jnp.int32), pos, st,
                         cache_pos=pos0, valid_from=vf, dtype=jnp.float32)
        return np.asarray(lg), st

    lg, st = step(seq[:4], 0, st)       # prefill
    np.testing.assert_allclose(lg[0], full[0, :4], rtol=2e-4, atol=2e-4)
    for i in range(4, len(seq)):        # one-token decode steps
        lg, st = step(seq[i:i + 1], i, st)
        np.testing.assert_allclose(lg[0, 0], full[0, i], rtol=2e-3, atol=2e-3)


def test_left_pad_invariance(jamba):
    """Left-padded batch rows must produce the same final-position logits."""
    cfg, params, _ = jamba
    seq = [5, 8, 2, 13]
    a, _ = _full_logits(cfg, params, np.asarray([seq], np.int32))
    padded = np.asarray([[0, 0] + seq], np.int32)
    B, T = padded.shape
    st = HybridState.create(cfg, 1, 32, jnp.float32)
    pos = np.zeros((1, T), np.int32)
    pos[0, 2:] = np.arange(len(seq))
    lg, _ = forward(params, cfg, jnp.asarray(padded), jnp.asarray(pos), st,
                    cache_pos=0, valid_from=jnp.asarray([2], jnp.int32),
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lg)[0, -1], a[0, -1],
                               rtol=2e-4, atol=2e-4)
