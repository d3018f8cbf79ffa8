"""LFM2 / LFM2-MoE (short-convolution hybrid, src/models/lfm2.cpp):
layer-kind dispatch, incremental==full, conv-tail carry correctness."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpullm.models.family import model_family
from tpullm.models.hybrid import HybridState, attn_layer_ids, forward
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_lfm2_gguf

CASES = [("lfm2", "ccac"), ("lfm2moe", "cca")]


@pytest.fixture(scope="module", params=CASES, ids=lambda c: c[0])
def lfm2(request, tmp_path_factory):
    arch, pat = request.param
    path = str(tmp_path_factory.mktemp("m") / f"{arch}.gguf")
    build_lfm2_gguf(path, arch, pattern=pat, seed=7)
    return arch, pat, path, load_model(path, fuse=False)


def test_config_and_banks(lfm2):
    arch, pat, path, (cfg, params, g) = lfm2
    assert model_family(cfg) == "hybrid"
    assert len(attn_layer_ids(cfg)) == pat.count("a")
    assert cfg.ssm_d_conv == 3  # l_cache
    st = HybridState.create(cfg, 2, 32, jnp.float32)
    # conv tail holds l_cache-1 inputs per conv layer
    assert st.conv.shape == (pat.count("c"), 2, cfg.n_embd, 2)


def _full(cfg, params, toks, S=32):
    st = HybridState.create(cfg, 1, S, jnp.float32)
    lg, st = forward(params, cfg, toks, jnp.arange(toks.shape[1])[None],
                     st, 0, jnp.zeros(1, jnp.int32), dtype=jnp.float32)
    return lg, st


def test_incremental_equals_full(lfm2):
    """The carried conv tail must make token-at-a-time decode match one
    full prefill exactly (the recurrent-state correctness invariant)."""
    arch, pat, path, (cfg, params, g) = lfm2
    seq = [3, 9, 4, 17, 6, 2, 11]
    toks = jnp.asarray([seq], jnp.int32)
    full, _ = _full(cfg, params, toks)
    st = HybridState.create(cfg, 1, 32, jnp.float32)
    outs = []
    for t, tok in enumerate(seq):
        lg, st = forward(params, cfg, jnp.asarray([[tok]], jnp.int32),
                         jnp.asarray([[t]], jnp.int32), st, t,
                         jnp.zeros(1, jnp.int32), dtype=jnp.float32)
        outs.append(np.asarray(lg)[0, -1])
    np.testing.assert_allclose(np.stack(outs), np.asarray(full)[0],
                               rtol=2e-4, atol=2e-5)


def test_moe_layers_engage(lfm2):
    arch, pat, path, (cfg, params, g) = lfm2
    if arch != "lfm2moe":
        pytest.skip("dense variant")
    groups = params["layers"].get("__groups__") or [params["layers"]]
    keys = set()
    for gl in groups:
        keys |= set(gl)
    assert "moe_gate_inp" in keys and "moe_probs_b" in keys
    assert cfg.expert_gating == "sigmoid"
