"""Generate PARITY_r{N}.json: reference-engine differentials on shared
synthetic checkpoints.

Sections:
  quants       greedy + PPL vs llama-completion/llama-perplexity per quant
               type (tools/ref_parity.run_parity)
  arch_greedy  per-arch family reference greedy-parity tests (the
               test_*::test_reference_greedy_parity suite), recorded as
               pass/fail per arch family
  encoder      embedding cosine vs llama-embedding on a synthetic BERT

Usage: python scripts/gen_parity.py --out PARITY_r05.json
Requires /tmp/refbuild (scripts/build_reference.sh).
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_BIN = os.environ.get("TPULLM_REF_BIN", "/tmp/refbuild/bin")


def arch_greedy() -> dict:
    """Run every family reference-parity test; record per-family outcome."""
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-rA", "--tb=line",
         "-k", "reference_greedy_parity or reference_parity or ref_greedy",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True, cwd=REPO, timeout=3600)
    rows = {}
    for line in out.stdout.splitlines():
        m = re.match(r"(PASSED|FAILED|SKIPPED|ERROR) (tests/\S+)", line)
        if m:
            rows[m.group(2)] = m.group(1)
    tail = out.stdout.strip().splitlines()
    rows["_summary"] = tail[-1] if tail else "?"
    return rows


def encoder_parity() -> dict:
    """Embedding cosine: llama-embedding vs tpullm on a synthetic BERT."""
    import tempfile

    import numpy as np

    from tpullm.utils.synth import build_bert_gguf

    emb_bin = os.path.join(REF_BIN, "llama-embedding")
    if not os.path.exists(emb_bin):
        return {"skipped": "llama-embedding not built"}
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bert.gguf")
        build_bert_gguf(path, seed=11)
        prompt = "abc tok4 tok11 def"
        out = subprocess.run(
            [emb_bin, "-m", path, "-p", prompt, "--embd-normalize", "-1",
             "-t", "1", "--pooling", "mean"],
            capture_output=True, text=True, timeout=600,
            stdin=subprocess.DEVNULL)
        nums = []
        for line in out.stdout.splitlines():
            if line.startswith("embedding 0:"):
                nums = [float(t) for t in line.split(":", 1)[1].split()]
        if not nums:
            return {"skipped": "no embedding row parsed",
                    "stderr_tail": out.stderr[-300:]}
        ref = np.asarray(nums, np.float32)

        import jax.numpy as jnp

        from tpullm.models.bert import encode as bert_encode, pool
        from tpullm.runtime.loader import load_model
        from tpullm.tokenizer import Tokenizer

        cfg, params, g = load_model(path)
        tok = Tokenizer.from_gguf(g)
        ids = tok.encode(prompt, add_special=True)
        n_real = jnp.asarray([len(ids)], jnp.int32)
        hid = bert_encode(params, cfg, jnp.asarray([ids], jnp.int32),
                          n_real, dtype=jnp.float32)
        emb = pool(hid, n_real, cfg, params, pooling="mean")
        ours = np.asarray(emb[0], np.float32)
        n = min(len(ours), len(ref))
        cos = float(np.dot(ours[:n], ref[:n])
                    / (np.linalg.norm(ours[:n]) * np.linalg.norm(ref[:n])))
        return {"dim": n, "cosine": round(cos, 6),
                "max_abs": round(float(np.max(np.abs(ours[:n] - ref[:n]))), 6)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r05.json")
    ap.add_argument("--skip-quants", action="store_true")
    args = ap.parse_args()

    results = {"round": 5,
               "reference": "llama.cpp CPU build (/root/reference)"}
    results["arch_greedy"] = arch_greedy()
    print("arch_greedy done", file=sys.stderr)
    results["encoder"] = encoder_parity()
    print("encoder done", file=sys.stderr)
    if not args.skip_quants:
        from tpullm.tools.ref_parity import run_parity

        results.update(run_parity())
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
