"""Training subsystem: optimizer convergence, epoch loop, model saver.

Mirrors the reference's test-opt.cpp (optimizer on toy problems) plus the
finetune flow (examples/training/finetune.cpp): loss must decrease on a
memorizable corpus and the saved GGUF must reload and generate.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.runtime.loader import load_model
from tpullm.training import (TrainConfig, adamw_init, adamw_step,
                             float_params, save_model_gguf, sgd_step, train)
from tpullm.utils.synth import build_llama_gguf


def test_adamw_converges_quadratic():
    """min ||x - c||^2 — AdamW must reach the optimum (test-opt.cpp style)."""
    c = jnp.asarray([1.5, -2.0, 0.25])
    params = {"x": jnp.zeros(3)}
    state = adamw_init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.sum((p["x"] - c) ** 2))(params)
        params, state = adamw_step(params, grads, state, lr=0.05)
        return loss, params, state

    for _ in range(400):
        loss, params, state = step(params, state)
    assert float(loss) < 1e-3
    np.testing.assert_allclose(np.asarray(params["x"]), np.asarray(c), atol=0.05)


def test_sgd_weight_decay():
    p = {"x": jnp.ones(4)}
    g = {"x": jnp.zeros(4)}
    p2 = sgd_step(p, g, lr=0.1, wd=0.5)
    np.testing.assert_allclose(np.asarray(p2["x"]), 0.95 * np.ones(4), rtol=1e-6)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("t") / "t.gguf")
    build_llama_gguf(path, vocab_size=256, n_embd=64, n_layer=2, n_head=4,
                     n_head_kv=2, n_ff=96, qtype=GGMLType.Q8_0,
                     with_vocab=True, seed=3)
    return path


def test_finetune_loss_decreases_and_saves(tiny_model, tmp_path):
    cfg, params, g = load_model(tiny_model, fuse=False)
    from tpullm.tokenizer import Tokenizer

    tok = Tokenizer.from_gguf(g)
    corpus = "tok1 tok2 tok3 tok4 " * 80  # memorizable pattern
    ids = tok.encode(corpus, add_special=True)

    fparams = float_params(params)
    tcfg = TrainConfig(seq_len=32, batch=2, lr=3e-3, optimizer="adamw",
                       epochs=3)
    fparams, hist = train(cfg, fparams, ids, tcfg)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"] * 0.8, hist

    out = str(tmp_path / "trained.gguf")
    save_model_gguf(g, fparams, out)

    # the saved model must reload and generate; it should have learned the
    # repeating pattern (greedy continuation contains corpus tokens)
    cfg2, params2, g2 = load_model(out)
    from tpullm.runtime.engine import InferenceEngine

    eng = InferenceEngine(cfg2, params2, max_seq_len=64,
                          compute_dtype=jnp.float32)
    prompt = tok.encode("tok1 tok2", add_special=True)
    r = eng.generate([prompt], max_new_tokens=8)
    text = tok.decode(r.tokens[0])
    assert "tok" in text, text


def test_saver_roundtrip_untrained(tiny_model, tmp_path):
    """Saving unmodified float params preserves behavior (logit agreement)."""
    cfg, params, g = load_model(tiny_model, fuse=False)
    fparams = float_params(params)
    out = str(tmp_path / "rt.gguf")
    save_model_gguf(g, fparams, out)
    cfg2, params2, _ = load_model(out)
    from tpullm.runtime.engine import InferenceEngine

    e1 = InferenceEngine(cfg, load_model(tiny_model)[1], max_seq_len=32,
                         compute_dtype=jnp.float32)
    e2 = InferenceEngine(cfg2, params2, max_seq_len=32,
                         compute_dtype=jnp.float32)
    l1 = e1.logits_for([[3, 9, 4]])
    l2 = e2.logits_for([[3, 9, 4]])
    nmse = float(((l1 - l2) ** 2).mean() / (l1 ** 2).mean())
    # Q8_0 requant of dequantized weights is near-idempotent
    assert nmse < 5e-4, nmse
