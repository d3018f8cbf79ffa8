"""UGM (SentencePiece unigram, T5-family) tokenizer tests.

Differential against the reference's llama-tokenize on a fabricated t5
vocab (observed exact agreement incl. unknown-token merging and
remove_extra_whitespaces), plus self-contained structure checks.
"""
import json
import os
import subprocess

import numpy as np
import pytest

from tpullm.gguf.writer import GGUFWriter
from tpullm.tokenizer import Tokenizer

REF_BIN = os.environ.get("TPULLM_REF_BIN", "/tmp/refbuild/bin")


@pytest.fixture(scope="module")
def ugm_vocab(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("v") / "ugm.gguf")
    toks = (["<unk>", "<s>", "</s>", "▁"] + [f"▁tok{i}" for i in range(50)]
            + list("abcdefghijklmnopqrstuvwxyz0123456789")
            + ["▁the", "▁a", "ab", "bc", "tok"])
    vocab = toks + [f"<x{i}>" for i in range(128 - len(toks))]
    rng = np.random.default_rng(0)
    scores = -np.abs(rng.normal(2, 1, len(vocab))).astype(np.float32)
    scores[:3] = 0.0
    ttype = np.full(len(vocab), 1, np.int32)
    ttype[0] = 2  # UNKNOWN
    ttype[1] = ttype[2] = 3  # CONTROL
    w = GGUFWriter(path, arch="t5")
    w.add_string("general.name", "synth-ugm")
    w.add_uint32("t5.context_length", 512)
    w.add_uint32("t5.embedding_length", 64)
    w.add_uint32("t5.block_count", 1)
    w.add_string("tokenizer.ggml.model", "t5")
    w.add_array("tokenizer.ggml.tokens", vocab)
    w.add_array("tokenizer.ggml.scores", scores)
    w.add_array("tokenizer.ggml.token_type", ttype)
    w.add_uint32("tokenizer.ggml.unknown_token_id", 0)
    w.add_uint32("tokenizer.ggml.bos_token_id", 1)
    w.add_uint32("tokenizer.ggml.eos_token_id", 2)
    w.add_bool("tokenizer.ggml.add_bos_token", False)
    w.add_bool("tokenizer.ggml.add_eos_token", True)
    w.add_bool("tokenizer.ggml.add_space_prefix", True)
    w.add_bool("tokenizer.ggml.remove_extra_whitespaces", True)
    w.write()
    return path


CASES = ["the ab tok3", "abc xyz!! tok12 tok12", "hello  world", "a",
         "tok1tok2  x", "", " leading", "AB unknown CAPS", "tok49 bcbc"]


def test_ugm_basic(ugm_vocab):
    tok = Tokenizer.from_gguf(ugm_vocab)
    ids = tok.encode("the ab", add_special=False)
    assert ids and all(0 <= i < 128 for i in ids)
    # viterbi prefers the whole-word piece over characters
    assert tok.vocab.tokens[ids[0]] == "▁the"
    # add_special appends eos (t5 convention: no bos)
    ids2 = tok.encode("the", add_special=True)
    assert ids2[-1] == 2 and ids2[0] != 1


def test_unknown_merging(ugm_vocab):
    """Consecutive unknown code points merge into ONE unk token."""
    tok = Tokenizer.from_gguf(ugm_vocab)
    ids = tok.encode("ZZZ", add_special=False)  # uppercase not in vocab
    assert ids.count(0) == 1


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-tokenize")),
    reason=f"no reference build at {REF_BIN}")
def test_ugm_reference_parity(ugm_vocab):
    tok = Tokenizer.from_gguf(ugm_vocab)
    for text in CASES:
        ours = tok.encode(text, add_special=False)
        r = subprocess.run(
            [os.path.join(REF_BIN, "llama-tokenize"), "-m", ugm_vocab,
             "-p", text, "--ids", "--no-bos"],
            capture_output=True, text=True, timeout=120,
            stdin=subprocess.DEVNULL)
        assert r.returncode == 0, r.stderr[-800:]
        ref = (json.loads(r.stdout.strip().replace(" ", ""))
               if r.stdout.strip() else [])
        assert ours == ref, (text, ours, ref)
