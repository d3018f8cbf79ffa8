"""New pre-tokenizer variants: exact-id differential vs the reference.

Fabricates a byte-level BPE vocab with real merges, stamps each new
``tokenizer.ggml.pre`` value, and compares our encode() against
llama-tokenize on inputs that stress each type's split rules (digits
grouping, CJK runs, contractions, whitespace cascades)."""
import os
import subprocess

import numpy as np
import pytest

from tpullm.gguf.writer import GGUFWriter
from tpullm.tokenizer import Tokenizer
from tpullm.tokenizer.pretokenizers import PRE_REGEX
from tpullm.tokenizer.tokenizer import _bytes_to_unicode

REF_BIN = os.environ.get("TPULLM_REF_BIN", "/tmp/refbuild/bin")

# exercised subset (full-custom unicode.cpp handlers — afmoe, kimi-k2 —
# are documented approximations and excluded from the exact check)
NEW_PRES = ["llama4", "minimax-m2", "qwen35", "bailingmoe", "seed-coder",
            "tiny_aya", "exaone-moe", "grok-2", "jais-2", "chameleon",
            "hunyuan-dense", "trillion", "superbpe", "mellum",
            "deepseek-r1-qwen", "lfm2"]

TEXTS = [
    "Hello world",
    "it's 12345 test",
    "ABCdef GHIjkl",
    "  spaces   and\nnewlines\r\n",
    "x=1+2; // comment",
    "1234567 89",
]


def _mk_bpe_gguf(path: str, pre: str) -> str:
    b2u = _bytes_to_unicode()
    tokens = [b2u[i] for i in range(256)]
    # a few real merges so pre-split boundaries change the ids
    sp = b2u[ord(" ")]
    merges, merged = [], []
    for a, b in (("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
                 ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d"),
                 ("1", "2"), ("12", "3"), ("123", "4"),
                 (sp, "w"), ((sp + "w"), "orld"), ("o", "rld"),
                 ("r", "ld"), ("l", "d"), ("e", "s"), ("t", "es"),
                 ("tes", "t")):
        merges.append(f"{a} {b}")
        merged.append(a + b)
    for m in merged:
        if m not in tokens:
            tokens.append(m)
    w = GGUFWriter(path, arch="llama")
    w.add_uint32("llama.embedding_length", 8)
    w.add_uint32("llama.block_count", 1)
    w.add_string("tokenizer.ggml.model", "gpt2")
    w.add_string("tokenizer.ggml.pre", pre)
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.token_type",
                np.ones(len(tokens), np.int32))
    w.add_array("tokenizer.ggml.merges", merges)
    w.write()
    return path


def test_all_new_pres_registered():
    for p in NEW_PRES + ["afmoe", "kimi-k2", "gemma4", "sarvam-moe",
                         "youtu", "joyai-llm", "kanana2", "llada-moe",
                         "bailingmoe2", "solar-open", "f2llmv2", "kormo",
                         "exaone4", "jina-v5-nano", "a.x-4.0",
                         "modern-bert", "roberta-bpe", "gigachat"]:
        assert p in PRE_REGEX, p


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-tokenize")),
    reason=f"no reference build at {REF_BIN}")
@pytest.mark.parametrize("pre", NEW_PRES)
def test_new_pre_matches_reference(pre, tmp_path):
    path = _mk_bpe_gguf(str(tmp_path / f"{pre}.gguf"), pre)
    tok = Tokenizer.from_gguf(path)
    for text in TEXTS:
        out = subprocess.run(
            [os.path.join(REF_BIN, "llama-tokenize"), "-m", path,
             "-p", text, "--ids", "--no-bos"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            timeout=120)
        assert out.returncode == 0, (pre, text)
        ref = eval(out.stdout.strip().splitlines()[-1])
        got = tok.encode(text, add_special=False)
        assert got == ref, (pre, text, got, ref)
