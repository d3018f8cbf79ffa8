"""llama-eval-callback analogue: per-layer activation statistics dump.

The reference hooks every graph node via the scheduler eval-callback and
prints tensor summaries. Here forward(collect_stats=True) returns each
matmul input's per-column sum(x^2); this tool prints per-layer RMS tables
for a prompt — the activation-inspection debugging workflow.
"""
from __future__ import annotations

import argparse

import numpy as np


def run(model: str, prompt: str, n_ctx: int = 64):
    import jax
    import jax.numpy as jnp

    from ..models.llama import KVCache, forward
    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer

    cfg, params, g = load_model(model)
    tok = Tokenizer.from_gguf(g)
    ids = tok.encode(prompt, add_special=True)[:n_ctx]
    T = len(ids)

    @jax.jit
    def step(params, tokens):
        cache = KVCache.create(cfg, 1, T)
        positions = jnp.arange(T, dtype=jnp.int32)[None]
        logits, _, stats = forward(
            params, cfg, tokens, positions, cache, 0,
            jnp.zeros((1,), jnp.int32), collect_stats=True)
        return logits, stats

    logits, stats = step(params, jnp.asarray(np.asarray(ids, np.int32)[None]))
    rows = []
    for l in range(cfg.n_layer):
        row = {"layer": l}
        for key, label in (("attn_in", "attn_in"), ("wo_in", "wo_in"),
                           ("ffn_in", "ffn_in"), ("ffn_down_in", "ffn_mid")):
            v = np.asarray(stats[key][l], np.float64)
            row[label] = float(np.sqrt(v.mean() / max(T, 1)))
        rows.append(row)
    out_rms = float(np.sqrt(np.asarray(stats["output_in"], np.float64).mean() / T))
    return rows, out_rms, np.asarray(logits)


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.eval_callback")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="Hello world")
    args = ap.parse_args(argv)
    rows, out_rms, logits = run(args.model, args.prompt)
    print(f"{'layer':>5} {'attn_in':>10} {'wo_in':>10} {'ffn_in':>10} {'ffn_mid':>10}")
    for r in rows:
        print(f"{r['layer']:>5} {r['attn_in']:>10.4f} {r['wo_in']:>10.4f} "
              f"{r['ffn_in']:>10.4f} {r['ffn_mid']:>10.4f}")
    print(f"final hidden rms: {out_rms:.4f}; logits shape {logits.shape}")


if __name__ == "__main__":
    main()
