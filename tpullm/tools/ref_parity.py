"""Reference-parity artifact: run llama.cpp and tpullm on the same GGUFs.

Produces PARITY_r{N}.json at the repo root: per-quant greedy-decode
agreement and perplexity from BOTH engines on a shared synthetic checkpoint
and corpus (the reference's own synthetic-model test trick,
tests/gguf-model-data.h). Requires a CPU build of /root/reference:

    cmake -S /root/reference -B /tmp/refbuild -G Ninja -DGGML_NATIVE=OFF \
          -DLLAMA_CURL=OFF -DGGML_OPENMP=OFF -DCMAKE_BUILD_TYPE=Release
    ninja -C /tmp/refbuild llama-completion llama-perplexity

Usage: python -m tpullm.tools.ref_parity [--out PARITY_r02.json]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import re
import subprocess
import sys
import tempfile

import numpy as np

REF_BIN = os.environ.get("TPULLM_REF_BIN", "/tmp/refbuild/bin")


def _corpus(n_words=900, seed=3):
    rng = np.random.default_rng(seed)
    words = [f"tok{i}" for i in range(200)] + list(
        "abcdefghijklmnopqrstuvwxyz0123456789")
    return " ".join(rng.choice(words, n_words))


def _ref_ppl(model, cpath, n_ctx):
    out = subprocess.run(
        [os.path.join(REF_BIN, "llama-perplexity"), "-m", model, "-f", cpath,
         "-c", str(n_ctx), "-t", "1"],
        capture_output=True, text=True, timeout=1200,
        stdin=subprocess.DEVNULL)
    blob = out.stderr + out.stdout
    m = re.search(r"Final estimate: PPL = ([0-9.]+)(?: \+/- ([0-9.]+))?", blob)
    if not m:
        return None
    return float(m.group(1)), float(m.group(2)) if m.group(2) else None


def _ref_greedy_pieces(model, prompt, n):
    out = subprocess.run(
        [os.path.join(REF_BIN, "llama-completion"), "-m", model, "-p", prompt,
         "-n", str(n), "--temp", "0", "--no-warmup", "-t", "1", "--verbose"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=600, stdin=subprocess.DEVNULL)
    segs = re.split(r"n_past = \d+", out.stdout)
    pieces = []
    for s in segs[1:]:
        lines = [ln for ln in s.split("\n")
                 if not re.match(r"^[a-zA-Z_][\w.]*: ", ln)]
        if lines:
            pieces.append(lines[-1])
    return [p for p in pieces if p][:n]


def run_parity(quants=("Q4_0", "Q4_K", "Q8_0", "Q6_K", "Q5_K", "Q3_K"),
               n_greedy=24) -> dict:
    import jax
    import jax.numpy as jnp

    from ..gguf.constants import GGMLType
    from ..models.llama import KVCache, forward
    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer
    from ..tools.perplexity import compute_ppl
    from ..utils.synth import build_llama_gguf

    corpus = _corpus()
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(corpus)
        cpath = f.name

    results = {"reference": "llama.cpp CPU build (/root/reference)",
               "method": "shared synthetic GGUF per quant; greedy "
                         "teacher-forced agreement + PPL both engines",
               "quants": {}}
    for qname in quants:
        with tempfile.TemporaryDirectory() as td:
            model = os.path.join(td, f"synth_{qname}.gguf")
            build_llama_gguf(model, vocab_size=512, n_embd=256, n_layer=2,
                             n_head=4, n_head_kv=2, n_ff=512,
                             qtype=GGMLType[qname], with_vocab=True, seed=7)
            row: dict = {}
            # --- greedy agreement (teacher-forced margins) ----------------
            prompt = "abc tok4 tok11"
            pieces = _ref_greedy_pieces(model, prompt, n_greedy)
            cfg, params, g = load_model(model)
            tok = Tokenizer.from_gguf(g)
            render = {t.replace("▁", " "): i
                      for i, t in enumerate(tok.vocab.tokens)}
            c_ids = [render[p] for p in pieces if p in render]
            p_ids = tok.encode(prompt, add_special=True)
            full = p_ids + c_ids
            toks = jnp.asarray(np.asarray(full, np.int32)[None])
            pos = jnp.arange(len(full), dtype=jnp.int32)[None]
            cache = KVCache.create(cfg, 1, len(full))
            logits, _ = jax.jit(lambda pr, t, po, c: forward(
                pr, cfg, t, po, c, cache_pos=0,
                valid_from=jnp.zeros((1,), jnp.int32), dtype=jnp.float32))(
                    params, toks, pos, cache)
            lg = np.asarray(logits[0], np.float32)
            margins, exact = [], 0
            for p in range(len(p_ids) - 1, len(full) - 1):
                rt = full[p + 1]
                margins.append(float(lg[p].max() - lg[p, rt]))
                exact += int(lg[p].argmax() == rt)
            row["greedy"] = {
                "n": len(c_ids), "exact_argmax": exact,
                "max_margin": round(max(margins), 4) if margins else None,
            }
            # --- perplexity ----------------------------------------------
            ref = _ref_ppl(model, cpath, 128)
            ours = compute_ppl(model, corpus, n_ctx=128, progress=False)
            row["ppl"] = {
                "ref": ref[0] if ref else None,
                "ref_err": ref[1] if ref else None,
                "tpullm": round(ours["ppl"], 4),
                "rel_log_diff": (round(abs(math.log(ours["ppl"])
                                           - math.log(ref[0])), 6)
                                 if ref else None),
            }
            results["quants"][qname] = row
            print(qname, json.dumps(row), file=sys.stderr)
    os.unlink(cpath)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.ref_parity")
    ap.add_argument("--out", default="PARITY_r02.json")
    args = ap.parse_args(argv)
    if not os.path.exists(os.path.join(REF_BIN, "llama-completion")):
        print(f"no reference build at {REF_BIN}; see module docstring",
              file=sys.stderr)
        return 1
    res = run_parity()
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
