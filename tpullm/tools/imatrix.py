"""llama-imatrix analogue: importance-matrix collection over a corpus.

The reference hooks every matmul input via the scheduler eval-callback
(tools/imatrix/imatrix.cpp:65,229); here forward(collect_stats=True) returns
per-layer sum(x^2) per input column directly from the jitted graph (stats
are reduced on device). Output: a GGUF "imatrix" file with tensors
`<weight-name>.in_sum2` (f32, n_in) and `<weight-name>.counts` (f32, 1) —
the modern llama.cpp imatrix-as-GGUF format — consumed by
tools/quantize --imatrix.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def collect_imatrix(model_path: str, text: str, n_ctx: int = 512,
                    max_chunks: int = 0, progress=True) -> dict:
    import functools

    import jax
    import jax.numpy as jnp

    from ..models.llama import KVCache, forward
    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer

    cfg, params, g = load_model(model_path)
    tok = Tokenizer.from_gguf(g)
    ids = tok.encode(text, add_special=True)
    n_chunks = max(len(ids) // n_ctx, 1)
    if max_chunks:
        n_chunks = min(n_chunks, max_chunks)

    @jax.jit
    def step(params, tokens):
        B, T = tokens.shape
        cache = KVCache.create(cfg, B, T)
        positions = jnp.arange(T, dtype=jnp.int32)[None]
        _, _, stats = forward(
            params, cfg, tokens, positions, cache, 0,
            jnp.zeros((B,), jnp.int32), collect_stats=True)
        return stats

    acc: dict[str, np.ndarray] = {}
    n_tok = 0
    for c in range(n_chunks):
        chunk = ids[c * n_ctx:(c + 1) * n_ctx]
        if len(chunk) < 8:
            break
        arr = jnp.asarray(np.asarray(chunk, np.int32)[None])
        stats = step(params, arr)
        for k, v in stats.items():
            v = np.asarray(v, np.float64)
            acc[k] = acc.get(k, 0) + v
        n_tok += len(chunk)
        if progress:
            print(f"[{c + 1}/{n_chunks}] imatrix over {n_tok} tokens",
                  file=sys.stderr)

    # map stat groups to per-tensor names (one shared input per group)
    out: dict[str, np.ndarray] = {}
    L = cfg.n_layer

    def put(name, vec):
        out[name] = np.asarray(vec, np.float32)

    for l in range(L):
        put(f"blk.{l}.attn_q.weight", acc["attn_in"][l])
        put(f"blk.{l}.attn_k.weight", acc["attn_in"][l])
        put(f"blk.{l}.attn_v.weight", acc["attn_in"][l])
        put(f"blk.{l}.attn_output.weight", acc["wo_in"][l])
        put(f"blk.{l}.ffn_gate.weight", acc["ffn_in"][l])
        put(f"blk.{l}.ffn_up.weight", acc["ffn_in"][l])
        put(f"blk.{l}.ffn_down.weight", acc["ffn_down_in"][l])
    put("output.weight", acc["output_in"])
    return {"sums": out, "n_tokens": n_tok, "arch": cfg.arch}


def write_imatrix(path: str, data: dict):
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(path, arch=data.get("arch", "llama"))
    w.add_string("general.type", "imatrix")
    w.add_uint32("imatrix.chunk_count", 1)
    w.add_uint32("imatrix.token_count", int(data["n_tokens"]))
    for name, vec in data["sums"].items():
        w.add_tensor(name + ".in_sum2", vec.astype(np.float32))
        w.add_tensor(name + ".counts",
                     np.asarray([data["n_tokens"]], np.float32))
    w.write()


def read_imatrix(path: str) -> dict[str, np.ndarray]:
    """-> {weight-name: mean x^2 per input column} (normalized by counts)."""
    from ..gguf.reader import GGUFFile

    g = GGUFFile(path)
    out = {}
    for name in g.tensors:
        if not name.endswith(".in_sum2"):
            continue
        base = name[: -len(".in_sum2")]
        sums = g.tensor_array(name).astype(np.float64)
        cnt = 1.0
        cname = base + ".counts"
        if cname in g.tensors:
            cnt = float(g.tensor_array(cname).reshape(-1)[0]) or 1.0
        out[base] = (sums / cnt).astype(np.float32)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.imatrix")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="calibration text")
    ap.add_argument("-o", "--output", default="imatrix.gguf")
    ap.add_argument("-c", "--ctx", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=0)
    args = ap.parse_args(argv)
    text = open(args.file, encoding="utf-8").read()
    t0 = time.time()
    data = collect_imatrix(args.model, text, args.ctx, args.chunks)
    write_imatrix(args.output, data)
    print(f"wrote {args.output}: {len(data['sums'])} entries, "
          f"{data['n_tokens']} tokens in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
