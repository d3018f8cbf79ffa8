"""llama-bench analogue: pp/tg perf matrix over a GGUF model.

Output formats: md (default), json, csv — one row per (test, size) combo
like tools/llama-bench (llama-bench.cpp:217).
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def run_bench(model: str, pp: list[int], tg: list[int], ctx: int, reps: int = 2):
    import jax.numpy as jnp

    from ..runtime.engine import InferenceEngine
    from ..runtime.loader import load_model

    cfg, params, g = load_model(model)
    eng = InferenceEngine(cfg, params, max_seq_len=ctx)
    rows = []
    for n in pp:
        prompt = [list(range(5, 5 + n))]
        eng.logits_for(prompt)  # compile
        t0 = time.time()
        for _ in range(reps):
            eng.logits_for(prompt)
        dt = (time.time() - t0) / reps
        rows.append({"test": f"pp{n}", "t/s": round(n / dt, 2)})
    for n in tg:
        prompt = [[5, 6, 7, 8]]
        eng.generate(prompt, max_new_tokens=2)  # compile
        t0 = time.time()
        r = eng.generate(prompt, max_new_tokens=n)
        dt = time.time() - t0
        rows.append({"test": f"tg{n}", "t/s": round(r.n_decode / dt, 2)})
    meta = {"model": model, "arch": cfg.arch, "n_ctx": ctx,
            "params_dtype": "gguf-quant"}
    return meta, rows


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.bench")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--pp", default="512", help="comma list of prompt sizes")
    ap.add_argument("-n", "--tg", default="128", help="comma list of gen sizes")
    ap.add_argument("-c", "--ctx", type=int, default=2048)
    ap.add_argument("-o", "--output", choices=("md", "json", "csv"), default="md")
    args = ap.parse_args(argv)
    pp = [int(x) for x in args.pp.split(",") if x]
    tg = [int(x) for x in args.tg.split(",") if x]
    meta, rows = run_bench(args.model, pp, tg, args.ctx)
    if args.output == "json":
        print(json.dumps({"meta": meta, "results": rows}, indent=2))
    elif args.output == "csv":
        print("test,t/s")
        for r in rows:
            print(f"{r['test']},{r['t/s']}")
    else:
        print(f"| model | test | t/s |")
        print(f"|-------|------|-----|")
        name = meta["model"].rsplit("/", 1)[-1]
        for r in rows:
            print(f"| {name} | {r['test']} | {r['t/s']} |")


if __name__ == "__main__":
    main()
