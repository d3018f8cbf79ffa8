"""RWKV World tokenizer (byte trie, llm_tokenizer_rwkv).

Differential test: a fabricated rwkv-vocab GGUF is tokenized by BOTH our
trie and the reference's llama-tokenize on the same inputs — exact id
agreement (the strongest available check; no public rwkv vocab fixture
ships with the reference)."""
import os
import subprocess

import numpy as np
import pytest

from tpullm.gguf.writer import GGUFWriter
from tpullm.tokenizer import Tokenizer
from tpullm.tokenizer.tokenizer import _rwkv_unescape

REF_BIN = os.environ.get("TPULLM_REF_BIN", "/tmp/refbuild/bin")

# escaped vocab strings exactly as an RWKV gguf stores them: multi-byte
# tokens, overlapping prefixes (longest-match matters), control bytes
VOCAB = ["<eos>", "a", "b", "c", "ab", "abc", "bc", " ", " a", "hello",
         "hell", "he", "\\n", "\\t", "\\xe4\\xb8\\xad", "\\xe6\\x96\\x87",
         "wor", "world", "!", "d"] + [f"tok{i}" for i in range(12)]


def _mk_vocab_gguf(path: str) -> str:
    w = GGUFWriter(path, arch="rwkv7")
    w.add_uint32("rwkv7.embedding_length", 8)
    w.add_uint32("rwkv7.block_count", 1)
    w.add_string("tokenizer.ggml.model", "rwkv")
    w.add_array("tokenizer.ggml.tokens", VOCAB)
    w.add_array("tokenizer.ggml.token_type",
                np.asarray([3] + [1] * (len(VOCAB) - 1), np.int32))
    w.write()
    return path


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    path = _mk_vocab_gguf(str(tmp_path_factory.mktemp("rv") / "v.gguf"))
    return path, Tokenizer.from_gguf(path)


def test_unescape():
    assert _rwkv_unescape("a\\nb") == b"a\nb"
    assert _rwkv_unescape("\\xe4\\xb8\\xad") == "中".encode()
    assert _rwkv_unescape("\\\\x") == b"\\x"
    assert _rwkv_unescape("\\t\\r") == b"\t\r"


def test_longest_match(tok):
    _, t = tok
    v = VOCAB
    assert t.encode("abc", add_special=False) == [v.index("abc")]
    assert t.encode("abd", add_special=False) == [v.index("ab"), v.index("d")]
    # deterministic roundtrip through raw bytes
    ids = t.encode("hello world!\n\t中文", add_special=False)
    assert t.decode(ids) == "hello world!\n\t中文"


def test_unknown_byte_fallback(tok):
    _, t = tok
    ids = t.encode("aZa", add_special=False)
    # Z has no trie entry: unk (id 0 default) between two 'a' tokens
    assert ids == [VOCAB.index("a"), 0, VOCAB.index("a")]


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-tokenize")),
    reason=f"no reference build at {REF_BIN}")
@pytest.mark.parametrize("text", [
    "abc ab a", "hello world!", "hell", "中文中", "a\nb\tc", "abcabcbc",
])
def test_matches_reference(tok, text):
    path, t = tok
    out = subprocess.run(
        [os.path.join(REF_BIN, "llama-tokenize"), "-m", path, "-p", text,
         "--ids", "--no-bos"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        timeout=120)
    assert out.returncode == 0
    ref = eval(out.stdout.strip().splitlines()[-1])
    assert t.encode(text, add_special=False) == ref, (text, ref)
