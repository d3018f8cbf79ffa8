"""kimi-linear (src/models/kimi-linear.cpp): KDA (per-key-channel-decay
delta attention, separate q/k/v convs, sigmoid-gated RMS output norm) +
ropeless absorbed-MQA MLA + renormalized MoE with gated shared expert.

Strongest check: piece-exact teacher-forced margins vs the reference."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

REF_BIN = "/tmp/refbuild/bin"

from tpullm.models.family import model_family
from tpullm.models.hybrid import HybridState, attn_layer_ids, forward, is_hybrid
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_kimi_linear_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kl") / "kimi-linear.gguf")
    build_kimi_linear_gguf(path, pattern="kkak", seed=5)
    return path, load_model(path, fuse=False)


def test_routing_and_banks(model):
    path, (cfg, params, g) = model
    assert is_hybrid(cfg) and model_family(cfg) == "hybrid"
    assert attn_layer_ids(cfg) == [2]
    assert cfg.kv_lora_rank == 64 and cfg.head_dim == 64
    assert cfg.ssm_d_state == 16 and cfg.ssm_d_inner == 64  # kda.head_dim
    st = HybridState.create(cfg, 1, 32, jnp.float32)
    assert st.k.shape == (1, 1, 1, 32, 64 + 16)  # MQA [c_kv; k_pe]
    assert st.conv.shape[2] == 3 * cfg.ssm_d_inner  # Q|K|V conv states


def test_incremental_equals_full(model):
    path, (cfg, params, g) = model
    toks = jnp.asarray([[5, 9, 40, 33, 12, 7]], jnp.int32)
    st = HybridState.create(cfg, 1, 32, jnp.float32)
    lg_full, _ = forward(params, cfg, toks,
                         jnp.arange(toks.shape[1])[None], st, 0,
                         jnp.zeros(1, jnp.int32), dtype=jnp.float32)
    st = HybridState.create(cfg, 1, 32, jnp.float32)
    outs = []
    for t in range(toks.shape[1]):
        lg, st = forward(params, cfg, toks[:, t:t + 1],
                         jnp.asarray([[t]], jnp.int32), st, t,
                         jnp.zeros(1, jnp.int32), dtype=jnp.float32)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(lg_full[0]),
                               rtol=3e-4, atol=3e-4)


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
    st = HybridState.create(cfg, 1, len(full) + 1, jnp.float32)
    lg, _ = forward(params, cfg, jnp.asarray([full], jnp.int32),
                    jnp.arange(len(full))[None], st, 0,
                    jnp.zeros(1, jnp.int32), dtype=jnp.float32)
    lg = np.asarray(lg[0], np.float32)
    exact = 0
    for p in range(len(ids) - 1, len(full) - 1):
        rt = full[p + 1]
        margin = lg[p].max() - lg[p, rt]
        assert margin < 0.5, (p, rt, int(lg[p].argmax()), margin)
        exact += int(lg[p].argmax() == rt)
    assert exact >= 0.6 * len(c_ids), (exact, len(c_ids))
