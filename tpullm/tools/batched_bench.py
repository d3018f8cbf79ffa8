"""batched-bench analogue: parallel-decode throughput table.

Measures aggregate tokens/s at several batch sizes using the batch engine
(one shared prompt length, B parallel sequences), printing the
benches/*.md-style table (tools/batched-bench/batched-bench.cpp).
"""
from __future__ import annotations

import argparse
import json
import time


def run(model: str, pp: int, tg: int, batches: list[int], ctx: int):
    import jax.numpy as jnp

    from ..runtime.engine import InferenceEngine
    from ..runtime.loader import load_model

    cfg, params, g = load_model(model)
    rows = []
    for B in batches:
        eng = InferenceEngine(cfg, params, max_seq_len=ctx)
        prompts = [[(7 * i + j) % max(cfg.vocab_size - 8, 8) + 2
                    for j in range(pp)] for i in range(B)]
        eng.generate(prompts, max_new_tokens=2)  # compile
        t0 = time.time()
        r = eng.logits_for(prompts)
        pp_s = time.time() - t0
        t0 = time.time()
        res = eng.generate(prompts, max_new_tokens=tg)
        tg_s = max(time.time() - t0 - pp_s, 1e-9)
        n_gen = res.n_decode
        rows.append({
            "B": B, "pp": pp, "tg": tg,
            "pp_t_s": round(B * pp / max(pp_s, 1e-9), 2),
            "tg_t_s": round(n_gen / tg_s, 2),
        })
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.batched_bench")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--pp", type=int, default=128)
    ap.add_argument("-n", "--tg", type=int, default=32)
    ap.add_argument("-b", "--batches", default="1,2,4,8")
    ap.add_argument("-c", "--ctx", type=int, default=1024)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    rows = run(args.model, args.pp, args.tg,
               [int(b) for b in args.batches.split(",")], args.ctx)
    if args.json:
        print(json.dumps(rows, indent=2))
        return
    print("|   B |   pp |  tg | pp t/s | tg t/s |")
    print("|-----|------|-----|--------|--------|")
    for r in rows:
        print(f"| {r['B']:3d} | {r['pp']:4d} | {r['tg']:3d} "
              f"| {r['pp_t_s']:6.1f} | {r['tg_t_s']:6.1f} |")


if __name__ == "__main__":
    main()
