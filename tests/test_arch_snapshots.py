"""Per-arch snapshot harness: every registry row is a VERIFIED claim.

The reference builds all 127 archs with synthetic weights and compares
against stored snapshots (tests/test-llama-archs.cpp + tests/snapshots/).
Here: for each decoder arch in ARCH_REGISTRY, fabricate a tiny checkpoint
with exactly that arch's tensor set (utils/synth.build_arch_gguf), run
prefill + greedy decode, and compare logits against a stored golden
(tests/snapshots/{arch}.npz, committed). Regenerate with
TPULLM_UPDATE_SNAPSHOTS=1 after an intentional numerics change.

Catches: graph-construction regressions per arch, loader/stacking breaks,
flag-table drift — without downloading any model.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from tpullm.models.registry import ARCH_REGISTRY
from tpullm.runtime.engine import InferenceEngine
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_arch_gguf, build_deepseek2_gguf

SNAP_DIR = os.path.join(os.path.dirname(__file__), "snapshots")
UPDATE = os.environ.get("TPULLM_UPDATE_SNAPSHOTS") == "1"

# families with their own builders/tests (not the shared decoder graph)
_SKIP = {"mamba", "mamba2", "bert", "deepseek2", "jamba", "plamo2",
         "nemotron_h", "granitehybrid", "falcon-h1", "deci", "openelm",
         "rwkv6", "rwkv6qwen2", "rwkv7", "arwkv7", "t5", "t5encoder",
         # encoder family: snapshot-locked in test_encoder_family.py
         "nomic-bert", "nomic-bert-moe", "jina-bert-v2", "jina-bert-v3",
         "modern-bert", "neo-bert", "eurobert", "gemma-embedding",
         # TTS vocoder: tested in test_tts.py
         "wavtokenizer-dec"}

ARCHS = sorted(a for a in ARCH_REGISTRY if a not in _SKIP)


@pytest.mark.parametrize("arch", ARCHS)
def test_arch_snapshot(arch, tmp_path):
    path = str(tmp_path / f"{arch}.gguf")
    if arch in ("minicpm3", "mistral4"):  # MLA: deepseek2-style tensor set
        build_deepseek2_gguf(path, arch, seed=11)
    elif arch == "plm":  # MLA with direct Q + ungated relu^2 MLP
        build_deepseek2_gguf(path, arch, seed=11, q_lora=0, gated=False)
    else:
        build_arch_gguf(path, arch, seed=11)
    cfg, params, _ = load_model(path)
    assert cfg.arch == arch

    eng = InferenceEngine(cfg, params, max_seq_len=64,
                          compute_dtype=jnp.float32, decode_chunk=4)
    prompt = [3, 9, 4, 17, 6]
    r = eng.generate([prompt], max_new_tokens=8, return_logits=True)
    logits = np.asarray(r.logits[0], np.float32)
    tokens = np.asarray(r.tokens[0], np.int32)

    snap_path = os.path.join(SNAP_DIR, f"{arch}.npz")
    if UPDATE or not os.path.exists(snap_path):
        os.makedirs(SNAP_DIR, exist_ok=True)
        np.savez_compressed(snap_path, logits=logits, tokens=tokens)
        if not UPDATE:
            pytest.skip(f"snapshot created for {arch}; commit it")
        return
    snap = np.load(snap_path)
    ref_l, ref_t = snap["logits"], snap["tokens"]
    nmse = float(((logits - ref_l) ** 2).mean() / max((ref_l ** 2).mean(), 1e-12))
    assert nmse < 1e-6, (arch, nmse)
    # greedy tokens may flip on true ties only; demand near-total agreement
    agree = (tokens == ref_t).mean()
    assert agree >= 0.75, (arch, tokens.tolist(), ref_t.tolist())
