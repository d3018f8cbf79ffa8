"""glm-dsa (src/models/glm-dsa.cpp): the deepseek2 MLA graph verbatim
(models.h:1013) + sigmoid-gated MoE with probs bias and shared experts;
DSA indexer tensors are loaded-but-unused in the reference — we ignore
them at load. Split wk_b/wv_b (is_mla) MLA banks.

Strongest check: greedy-decode differential vs the reference engine."""
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_BIN = "/tmp/refbuild/bin"

from tpullm.models.llama import KVCache, forward
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_deepseek2_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("g") / "glm-dsa.gguf")
    build_deepseek2_gguf(path, "glm-dsa", n_layer=3, seed=13, moe=True,
                         split_mla=True, indexer=(2, 16, 4), dense_lead=1)
    return path, load_model(path, fuse=False)


def test_config(model):
    path, (cfg, params, g) = model
    assert cfg.kv_lora_rank > 0  # MLA engaged
    assert cfg.expert_gating == "sigmoid"
    assert cfg.n_layer_dense_lead == 1
    # indexer tensors are not part of the decode graph
    assert "indexer_proj" not in params["layers"]


def test_logits_finite(model):
    path, (cfg, params, g) = model
    toks = jnp.asarray([[5, 9, 40]], jnp.int32)
    cache = KVCache.create(cfg, 1, 32)
    lg, _ = forward(params, cfg, toks, jnp.arange(3)[None], cache,
                    cache_pos=0, valid_from=jnp.zeros(1, jnp.int32),
                    dtype=jnp.float32)
    assert np.isfinite(np.asarray(lg)).all()


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-completion")),
    reason=f"no reference build at {REF_BIN}")
def test_reference_greedy_parity(model):
    path, (cfg, params, g) = model
    from tpullm.tokenizer import Tokenizer

    from tests.test_reference_parity import _ref_greedy_pieces

    tok = Tokenizer.from_gguf(g)
    prompt, n = "abc tok4", 8
    # piece-exact reference ids (no detok/retok ambiguity), then
    # teacher-forced margins — the test_reference_parity MLA methodology
    pieces = _ref_greedy_pieces(path, prompt, n)
    assert len(pieces) >= n - 2, pieces
    render = {t.replace("\u2581", " "): i
              for i, t in enumerate(tok.vocab.tokens)}
    c_ids = [render[p] for p in pieces]
    ids = tok.encode(prompt, add_special=True)
    full = ids + c_ids
    cache = KVCache.create(cfg, 1, len(full) + 1)
    lg, _ = forward(
        params, cfg, jnp.asarray([full], jnp.int32),
        jnp.arange(len(full))[None], cache, cache_pos=0,
        valid_from=jnp.zeros(1, jnp.int32), dtype=jnp.float32)
    lg = np.asarray(lg[0], np.float32)
    exact = 0
    for p in range(len(ids) - 1, len(full) - 1):
        rt = full[p + 1]
        margin = lg[p].max() - lg[p, rt]
        assert margin < 0.5, (p, rt, int(lg[p].argmax()), margin)
        exact += int(lg[p].argmax() == rt)
    assert exact >= 0.6 * len(c_ids), (exact, len(c_ids), ref_cont)
