"""Quantized (int8) KV cache: accuracy + memory ops."""
import numpy as np
import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.models.llama import KVCache, forward
from tpullm.runtime.engine import InferenceEngine
from tpullm.runtime.memory import SlotMemory
from tpullm.utils.synth import synth_qparams


def _setup():
    return synth_qparams(vocab_size=128, n_embd=256, n_layer=2, n_head=4,
                         n_head_kv=2, n_ff=256, qtype=GGMLType.Q8_0, seed=6)


def test_q8_kv_close_to_bf16():
    cfg, params = _setup()
    tokens = jnp.asarray([[1, 5, 9, 2, 7, 11]], jnp.int32)
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    vf = jnp.zeros((1,), jnp.int32)

    l_bf, _ = forward(params, cfg, tokens, pos,
                      KVCache.create(cfg, 1, 16), 0, vf)
    l_q8, c_q8 = forward(params, cfg, tokens, pos,
                         KVCache.create(cfg, 1, 16, "q8"), 0, vf)
    assert c_q8.quantized and c_q8.k.dtype == jnp.int8
    a, b = np.asarray(l_q8, np.float64), np.asarray(l_bf, np.float64)
    nmse = ((a - b) ** 2).mean() / (b ** 2).mean()
    assert nmse < 5e-4, nmse
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.8


def test_q8_kv_generation():
    cfg, params = _setup()
    eng = InferenceEngine(cfg, params, max_seq_len=128, kv_dtype="q8",
                          decode_chunk=4)
    r = eng.generate([[1, 5, 9]], max_new_tokens=8)
    assert len(r.tokens[0]) >= 4
    # greedy with q8 mostly tracks bf16 greedy
    eng2 = InferenceEngine(cfg, params, max_seq_len=128, decode_chunk=4)
    r2 = eng2.generate([[1, 5, 9]], max_new_tokens=8)
    agree = np.mean([a == b for a, b in zip(r.tokens[0], r2.tokens[0])])
    assert agree >= 0.5, (r.tokens, r2.tokens)


def test_q8_kv_memory_ops():
    from tpullm.models.config import ModelConfig

    cfg = ModelConfig(arch="llama", n_layer=2, n_head=2, n_head_kv=2,
                      head_dim=8, head_dim_v=8, n_embd=16, rope_dim=8)
    m = SlotMemory(cfg, n_slots=2, max_seq_len=16, kv_dtype="q8")
    assert m.cache.quantized
    rng = np.random.default_rng(0)
    from tpullm.models.llama import _kv_quant

    kf = jnp.asarray(rng.standard_normal((2, 2, 8, 2, 8)), jnp.float32)
    kq, ks = _kv_quant(kf.reshape(-1, 8, 2, 8))
    m.cache = KVCache(
        m.cache.k.at[:, :, :, :8].set(
            kq.reshape(2, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4)),
        m.cache.v.at[:, :, :, :8].set(
            kq.reshape(2, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4)),
        m.cache.ks.at[:, :, :, :8].set(
            ks.reshape(2, 2, 8, 2).transpose(0, 1, 3, 2)),
        m.cache.vs.at[:, :, :, :8].set(
            ks.reshape(2, 2, 8, 2).transpose(0, 1, 3, 2)),
    )
    m.slots[0].tokens = list(range(8))
    m.slots[0].n_past = 8
    m.copy_slot(0, 1)
    assert m.slots[1].n_past == 8
    blob = m.save_slot(0)
    # v2 snapshots keep RAW int8 rows + scales (lossless restore)
    assert blob["kq"].dtype == np.int8 and blob["ks"].dtype == np.float32
    kq_before = np.asarray(m.cache.k[:, 0, :, :8])
    m.clear_slot(0)
    n = m.load_slot(0, blob)
    assert n == 8
    np.testing.assert_array_equal(np.asarray(m.cache.k[:, 0, :, :8]),
                                  kq_before)
    m.context_shift(0, 2, 3)
    assert m.slots[0].n_past == 5
