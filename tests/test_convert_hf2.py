"""Converter breadth: tiny HF checkpoints (built with transformers, random
weights) -> our GGUF -> our engine, teacher-forced logits vs the ORIGINAL
transformers model (f32 both sides). This validates the converter AND the
graph against the true upstream implementation, per model type."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tpullm.tools.convert_hf import convert
from tpullm.runtime.loader import load_model

V, D, L, H = 256, 64, 2, 4
COMMON = dict(vocab_size=V, hidden_size=D, num_hidden_layers=L,
              num_attention_heads=H, num_key_value_heads=2,
              intermediate_size=96, max_position_embeddings=256,
              tie_word_embeddings=False, use_cache=False,
              pad_token_id=0)  # HF defaults can exceed the tiny vocab


def _cfg(model_type, **kw):
    from transformers import AutoConfig

    d = dict(COMMON)
    d.update(kw)
    return AutoConfig.for_model(model_type, **d)


CASES = {
    "llama": lambda: _cfg("llama"),
    "qwen2": lambda: _cfg("qwen2"),
    "qwen3": lambda: _cfg("qwen3", head_dim=16),
    "qwen3_moe": lambda: _cfg(
        "qwen3_moe", head_dim=16, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=48, decoder_sparse_step=1,
        mlp_only_layers=[], norm_topk_prob=True),
    "mixtral": lambda: _cfg("mixtral", num_local_experts=4,
                            num_experts_per_tok=2),
    "gemma": lambda: _cfg("gemma", head_dim=16),
    "gemma2": lambda: _cfg("gemma2", head_dim=16, sliding_window=64,
                           attn_logit_softcapping=50.0,
                           final_logit_softcapping=30.0,
                           query_pre_attn_scalar=16),
    "phi3": lambda: _cfg("phi3"),
    "olmo2": lambda: _cfg("olmo2"),
    "stablelm": lambda: _cfg("stablelm", partial_rotary_factor=1.0),
    "mamba": lambda: _cfg("mamba", state_size=8, conv_kernel=4,
                          intermediate_size=128, time_step_rank=4),
    "mamba2": lambda: _cfg("mamba2", state_size=8, conv_kernel=4,
                           intermediate_size=128, head_dim=16, n_groups=1,
                           num_heads=8, chunk_size=16),
}


def _save(cfgobj, d):
    from transformers import AutoModelForCausalLM

    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfgobj)
    model = model.eval().float()
    model.save_pretrained(d, safe_serialization=True)
    return model


def _our_logits(path, ids):
    cfg, params, g = load_model(path, fuse=False)
    from tpullm.models.family import model_family

    fam = model_family(cfg)
    toks = jnp.asarray([ids], jnp.int32)
    if fam == "ssm":
        from tpullm.models.mamba import RecurrentState, forward

        st = RecurrentState.create(cfg, 1)
        lg, _ = forward(params, cfg, toks, st, dtype=jnp.float32)
        return np.asarray(lg)[0]
    from tpullm.models.llama import KVCache, forward

    cache = KVCache.create(cfg, 1, 64, jnp.float32)
    lg, _ = forward(params, cfg=cfg, tokens=toks,
                    positions=jnp.arange(len(ids))[None],
                    cache=cache, cache_pos=0,
                    valid_from=jnp.zeros(1, jnp.int32), dtype=jnp.float32)
    return np.asarray(lg)[0]


@pytest.mark.parametrize("mt", sorted(CASES))
def test_convert_matches_transformers(mt, tmp_path):
    cfgobj = CASES[mt]()
    hf_dir = str(tmp_path / "hf")
    model = _save(cfgobj, hf_dir)
    out = str(tmp_path / "m.gguf")
    convert(hf_dir, out, outtype="f32")

    ids = [3, 9, 4, 17, 6, 2, 11, 5]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].float().numpy()
    ours = _our_logits(out, ids)
    assert ours.shape == ref.shape
    # f32 everywhere; tolerance covers associativity-order differences
    err = np.abs(ours - ref).max()
    rel = err / max(np.abs(ref).max(), 1e-6)
    assert rel < 2e-2, (mt, err, rel)
    # argmax agreement at every position (the serving-visible contract)
    agree = (ours.argmax(-1) == ref.argmax(-1)).mean()
    assert agree == 1.0, (mt, agree)


def test_unsupported_type_raises(tmp_path):
    d = tmp_path / "hf"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"model_type": "nope"}))
    with pytest.raises(SystemExit):
        convert(str(d), str(tmp_path / "x.gguf"))
