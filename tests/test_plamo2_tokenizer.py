"""PLaMo-2 tokenizer (Viterbi DP + byte fallback, llm_tokenizer_plamo2).

Differential test: a fabricated plamo2-vocab GGUF is tokenized by BOTH our
DP and the reference's llama-tokenize on the same inputs — exact id
agreement (no public plamo2 vocab fixture ships with the reference; the
reference requires all 256 byte tokens present, src/llama-vocab.cpp:1352).
"""
import os
import subprocess

import numpy as np
import pytest

from tpullm.gguf.writer import GGUFWriter
from tpullm.tokenizer import Tokenizer

REF_BIN = os.environ.get("TPULLM_REF_BIN", "/tmp/refbuild/bin")

# specials first so every byte token id is nonzero (the reference treats
# bytes_[b] == 0 as "missing", src/llama-vocab.cpp:1352)
SPECIALS = ["<|plamo:unk|>", "<|plamo:bos|>", "<|plamo:eos|>", "<|plamo:pad|>"]
BYTES = [f"<0x{i:02X}>" for i in range(256)]
# overlapping pieces: longest-match ties, multi-codepoint CJK, scored pieces
PIECES = [
    ("a", -1.0), ("b", -1.5), ("c", -2.0), ("ab", -1.2), ("abc", -2.1),
    ("bc", -1.9), ("hello", -3.0), ("hell", -3.5), ("he", -2.5),
    ("llo", -2.8), (" ", -0.5), (" a", -1.1), ("world", -4.0),
    ("wor", -3.2), ("ld", -2.2), ("中", -2.0), ("文", -2.1), ("中文", -3.0),
    ("\n", -0.9), ("!", -1.3), ("d", -1.7), ("l", -1.4), ("o", -1.6),
    ("w", -1.8), ("r", -1.85), ("e", -1.05), ("h", -1.95),
]


def _mk_vocab_gguf(path: str) -> str:
    tokens = SPECIALS + BYTES + [p for p, _ in PIECES]
    scores = [0.0] * 4 + [0.0] * 256 + [s for _, s in PIECES]
    # gguf token types: UNKNOWN=2, CONTROL=3, BYTE=6, NORMAL=1
    ttypes = [2, 3, 3, 3] + [6] * 256 + [1] * len(PIECES)
    w = GGUFWriter(path, arch="plamo2")
    w.add_uint32("plamo2.embedding_length", 8)
    w.add_uint32("plamo2.block_count", 1)
    w.add_string("tokenizer.ggml.model", "plamo2")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(ttypes, np.int32))
    w.write()
    return path


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    path = _mk_vocab_gguf(str(tmp_path_factory.mktemp("p2") / "v.gguf"))
    return path, Tokenizer.from_gguf(path)


def _tid(text):
    tokens = SPECIALS + BYTES + [p for p, _ in PIECES]
    return tokens.index(text)


def test_defaults(tok):
    _, t = tok
    v = t.vocab
    assert (v.bos_id, v.eos_id, v.unk_id, v.pad_id) == (1, 2, 0, 3)


def test_viterbi_min_cost(tok):
    _, t = tok
    # "ab" (-1.2) beats "a"+"b" (-2.5): DP minimizes sum of NEGATED scores,
    # i.e. picks the highest-scoring segmentation
    assert t.encode("ab", add_special=False) == [_tid("ab")]
    # unknown codepoint -> byte fallback tokens
    ids = t.encode("aZ", add_special=False)
    assert ids == [_tid("a"), _tid("<0x5A>")]


def test_byte_fallback_multibyte(tok):
    _, t = tok
    # é (U+00E9) has no piece: two UTF-8 bytes
    ids = t.encode("é", add_special=False)
    assert ids == [_tid("<0xC3>"), _tid("<0xA9>")]


def test_decode_roundtrip(tok):
    _, t = tok
    for s in ["hello world!", "abc中文", "aZé b"]:
        assert t.decode(t.encode(s, add_special=False)) == s


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-tokenize")),
    reason=f"no reference build at {REF_BIN}")
@pytest.mark.parametrize("text", [
    "abc ab a", "hello world!", "hell", "中文中", "a\nb c", "abcabcbc",
    "helloworld", " a ab", "weird Z bytes é here", "wor ld llo",
])
def test_matches_reference(tok, text):
    path, t = tok
    out = subprocess.run(
        [os.path.join(REF_BIN, "llama-tokenize"), "-m", path, "-p", text,
         "--ids", "--no-bos"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        timeout=120)
    ref = [int(x) for x in out.stdout.strip().strip("[]").split(",") if x.strip()]
    assert t.encode(text, add_special=False) == ref
