"""shard_map tensor parallelism: TP forward == single-device forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpullm.gguf.constants import GGMLType
from tpullm.models.llama import KVCache, forward
from tpullm.utils.synth import synth_qparams


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_matches_single_device(tp):
    if len(jax.devices()) < tp:
        pytest.skip("not enough devices")
    from tpullm.parallel.tp import TPEngine

    cfg, params = synth_qparams(
        vocab_size=256, n_embd=512, n_layer=2, n_head=8, n_head_kv=4,
        n_ff=1024, qtype=GGMLType.Q8_0, seed=4, fuse=False,
    )
    mesh = Mesh(np.asarray(jax.devices()[:tp]), ("tp",))
    eng = TPEngine(cfg, params, mesh, max_seq_len=32)

    tokens = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    positions = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)

    cache_tp = eng.new_cache(1)
    logits_tp, cache_tp = eng.decode_step(tokens, positions, cache_tp,
                                          jnp.int32(0), vf)

    cache1 = KVCache.create(cfg, 1, 32)
    logits1, _ = forward(params, cfg, tokens, positions, cache1, 0, vf)

    # TP introduces extra bf16 rounding points (psum'd partials, residual
    # adds), so compare distribution-level: NMSE + argmax agreement.
    lt = np.asarray(logits_tp, np.float64)
    l1 = np.asarray(logits1, np.float64)
    nmse = ((lt - l1) ** 2).mean() / (l1 ** 2).mean()
    assert nmse < 2e-3, nmse
    agree = (lt.argmax(-1) == l1.argmax(-1)).mean()
    assert agree == 1.0, agree


def test_tp_decode_continuation():
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    from tpullm.parallel.tp import TPEngine

    cfg, params = synth_qparams(
        vocab_size=128, n_embd=512, n_layer=2, n_head=4, n_head_kv=2,
        n_ff=512, qtype=GGMLType.Q8_0, seed=5, fuse=False,
    )
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("tp",))
    eng = TPEngine(cfg, params, mesh, max_seq_len=16)
    cache = eng.new_cache(1)
    toks = jnp.asarray([[3, 7]], jnp.int32)
    pos = jnp.asarray([[0, 1]], jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)
    logits, cache = eng.decode_step(toks, pos, cache, jnp.int32(0), vf)
    nxt = int(jnp.argmax(logits[0, -1]))
    # one decode step at position 2
    logits2, cache = eng.decode_step(
        jnp.asarray([[nxt]], jnp.int32), jnp.asarray([[2]], jnp.int32),
        cache, jnp.int32(2), vf)
    assert np.isfinite(np.asarray(logits2)).all()
