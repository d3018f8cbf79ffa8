"""SlotMemory: prefix matching, truncate, copy, context shift correctness."""
import numpy as np
import jax.numpy as jnp

from tpullm.models.config import ModelConfig
from tpullm.models.llama import rope_cache, apply_rope
from tpullm.runtime.memory import SlotMemory


def _cfg():
    return ModelConfig(arch="llama", n_layer=2, n_head=2, n_head_kv=2,
                       head_dim=8, head_dim_v=8, n_embd=16, rope_dim=8)


def test_prefix_truncate_clear():
    m = SlotMemory(_cfg(), n_slots=2, max_seq_len=32)
    m.slots[0].tokens = [1, 2, 3, 4, 5]
    m.slots[0].n_past = 5
    assert m.prefix_match(0, [1, 2, 3, 9, 9]) == 3
    assert m.prefix_match(0, [1, 2, 3, 4, 5]) == 4  # leaves one to decode
    m.truncate(0, 2)
    assert m.slots[0].n_past == 2 and m.slots[0].tokens == [1, 2]
    m.clear_slot(0)
    assert m.slots[0].n_past == 0


def test_copy_slot():
    m = SlotMemory(_cfg(), n_slots=2, max_seq_len=16)
    m.cache = type(m.cache)(m.cache.k.at[:, 0].set(1.0), m.cache.v.at[:, 0].set(2.0))
    m.slots[0].tokens = [5, 6]
    m.slots[0].n_past = 2
    m.copy_slot(0, 1)
    assert m.slots[1].tokens == [5, 6]
    np.testing.assert_allclose(np.asarray(m.cache.k[:, 1], np.float32), 1.0)


def test_context_shift_rope_consistency():
    """After shifting out n_discard tokens, the moved K rows must equal K
    computed directly at the shifted positions."""
    cfg = _cfg()
    m = SlotMemory(cfg, n_slots=1, max_seq_len=16, kv_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n = 8
    # fill cache with rope-rotated unit keys at positions 0..n-1
    base = rng.standard_normal((1, n, cfg.n_head_kv, cfg.head_dim)).astype(np.float32)
    pos = jnp.arange(n, dtype=jnp.int32)[None]
    cos, sin = rope_cache(cfg, pos)
    k_rot = apply_rope(jnp.asarray(base), cos, sin, cfg.rope_type, cfg.rope_dim)
    k_full = jnp.tile(k_rot[None], (cfg.n_layer, 1, 1, 1, 1))  # (L,1,n,H,D)
    m.cache = type(m.cache)(
        m.cache.k.at[:, :, :, :n].set(k_full.transpose(0, 1, 3, 2, 4)),
        m.cache.v.at[:, :, :, :n].set(1.0),
    )
    m.slots[0].tokens = list(range(n))
    m.slots[0].n_past = n

    n_keep, nd = 2, 3
    m.context_shift(0, n_keep, nd)
    st = m.slots[0]
    assert st.n_past == n - nd
    assert st.tokens == [0, 1, 5, 6, 7]

    # expected: tokens 5..7's base keys rotated at their NEW positions 2..4
    new_pos = jnp.arange(2, 5, dtype=jnp.int32)[None]
    cos2, sin2 = rope_cache(cfg, new_pos)
    expect = apply_rope(jnp.asarray(base[:, 5:8]), cos2, sin2,
                        cfg.rope_type, cfg.rope_dim)
    got = np.asarray(m.cache.k[0, 0, :, 2:5], np.float32).transpose(1, 0, 2)
    np.testing.assert_allclose(got, np.asarray(expect)[0], rtol=2e-2, atol=2e-2)
    # kept prefix untouched
    np.testing.assert_allclose(
        np.asarray(m.cache.k[0, 0, :, :2], np.float32).transpose(1, 0, 2),
        np.asarray(k_rot)[0, :2], rtol=1e-5)
