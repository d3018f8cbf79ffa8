"""gemma4 (src/models/gemma4.cpp, dense variant): per-layer
token-embedding stream, trailing shared-KV layers (reuse cb
llama-model.cpp:2005), optional wv (v = k), weightless V norm, no
attention scaling, per-layer SWA array + swa rope base, per-layer
out_scale, final logit softcap.

Strongest check: piece-exact teacher-forced margins vs the reference."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

REF_BIN = "/tmp/refbuild/bin"

from tpullm.models.llama import KVCache, forward, swa_flags
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_gemma4_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("g4") / "gemma4.gguf")
    build_gemma4_gguf(path, seed=3)
    return path, load_model(path, fuse=False)


def test_config_and_cache(model):
    path, (cfg, params, g) = model
    assert cfg.gemma4_attn and cfg.n_embd_per_layer == 32
    assert cfg.n_layer_kv_from_start == 4
    assert swa_flags(cfg) == [True, True, True, False, True, False]
    assert "per_layer_tok_embd" in params
    cache = KVCache.create(cfg, 1, 32)
    assert cache.k.shape[0] == 4  # shared layers own no banks


def test_incremental_equals_full(model):
    path, (cfg, params, g) = model
    toks = jnp.asarray([[5, 9, 40, 33, 12, 7]], jnp.int32)
    cache = KVCache.create(cfg, 1, 32, jnp.bfloat16)
    lg_full, _ = forward(params, cfg, toks, jnp.arange(6)[None], cache,
                         cache_pos=0, valid_from=jnp.zeros(1, jnp.int32),
                         dtype=jnp.float32)
    cache = KVCache.create(cfg, 1, 32, jnp.bfloat16)
    outs = []
    for t in range(6):
        lg, cache = forward(params, cfg, toks[:, t:t + 1],
                            jnp.asarray([[t]], jnp.int32), cache,
                            cache_pos=t,
                            valid_from=jnp.zeros(1, jnp.int32),
                            dtype=jnp.float32)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(lg_full[0]),
                               rtol=3e-3, atol=3e-3)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-completion")),
    reason=f"no reference build at {REF_BIN}")
def test_reference_greedy_parity(model):
    path, (cfg, params, g) = model
    from tpullm.tokenizer import Tokenizer

    from tests.test_reference_parity import _ref_greedy_pieces

    tok = Tokenizer.from_gguf(g)
    prompt, n = "abc tok4", 8
    pieces = _ref_greedy_pieces(path, prompt, n)
    assert len(pieces) >= n - 2, pieces
    render = {t.replace("▁", " "): i
              for i, t in enumerate(tok.vocab.tokens)}
    c_ids = [render[p] for p in pieces]
    ids = tok.encode(prompt, add_special=True)
    full = ids + c_ids
    cache = KVCache.create(cfg, 1, len(full) + 1)
    lg, _ = forward(params, cfg, jnp.asarray([full], jnp.int32),
                    jnp.arange(len(full))[None], cache, cache_pos=0,
                    valid_from=jnp.zeros(1, jnp.int32), dtype=jnp.float32)
    lg = np.asarray(lg[0], np.float32)
    exact = 0
    for p in range(len(ids) - 1, len(full) - 1):
        rt = full[p + 1]
        margin = lg[p].max() - lg[p, rt]
        assert margin < 0.5, (p, rt, int(lg[p].argmax()), margin)
        exact += int(lg[p].argmax() == rt)
    assert exact >= 0.6 * len(c_ids), (exact, len(c_ids))
