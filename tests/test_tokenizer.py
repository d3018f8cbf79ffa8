"""Differential tokenizer tests against the reference's vocab fixtures
(models/ggml-vocab-*.gguf + .inp/.out golden pairs, same data
tests/test-tokenizer-0.cpp uses: add_special=false, parse_special=false)."""
import os

import pytest

from tpullm.tokenizer import Tokenizer

FIXDIR = "/root/reference/models"

FIXTURES = [
    "llama-spm",
    "phi-3",
    "gpt-2",
    "mpt",
    "bert-bge",
    "starcoder",
    "refact",
    "falcon",
    "deepseek-llm",
    "deepseek-coder",
]


def load_cases(name):
    inp = open(f"{FIXDIR}/ggml-vocab-{name}.gguf.inp", encoding="utf-8").read()
    out = open(f"{FIXDIR}/ggml-vocab-{name}.gguf.out", encoding="utf-8").read()
    texts = inp.split("\n__ggml_vocab_test__\n")
    tok_lines = out.splitlines()
    cases = []
    for t, line in zip(texts, tok_lines):
        ids = [int(x) for x in line.split()]
        cases.append((t, ids))
    return cases


@pytest.mark.parametrize("name", FIXTURES)
def test_fixture_parity(name):
    path = f"{FIXDIR}/ggml-vocab-{name}.gguf"
    if not os.path.exists(path):
        pytest.skip(f"no fixture {name}")
    tok = Tokenizer.from_gguf(path)
    cases = load_cases(name)
    assert cases, "no cases parsed"
    bad = []
    for text, want in cases:
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != want:
            bad.append((text, want, got))
    assert not bad, f"{len(bad)}/{len(cases)} mismatches; first: {bad[0]!r}"


def test_spm_decode_roundtrip():
    tok = Tokenizer.from_gguf(f"{FIXDIR}/ggml-vocab-llama-spm.gguf")
    s = "Hello world, here's a test! ünïcodé."
    ids = tok.encode(s, add_special=False)
    assert tok.decode(ids) == s


def test_bpe_decode_roundtrip():
    tok = Tokenizer.from_gguf(f"{FIXDIR}/ggml-vocab-gpt-2.gguf")
    s = "Hello world, here's a test! ünïcodé. \n\ttabs too"
    ids = tok.encode(s, add_special=False)
    assert tok.decode(ids) == s


def test_special_token_parsing():
    tok = Tokenizer.from_gguf(f"{FIXDIR}/ggml-vocab-llama-spm.gguf")
    ids = tok.encode("<s>hi</s>", add_special=False, parse_special=True)
    assert ids[0] == tok.vocab.bos_id
    assert ids[-1] == tok.vocab.eos_id
    # without parse_special the literal text is tokenized instead
    ids2 = tok.encode("<s>hi</s>", add_special=False, parse_special=False)
    assert ids2[0] != tok.vocab.bos_id
