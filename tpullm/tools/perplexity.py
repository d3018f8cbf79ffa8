"""llama-perplexity analogue: sliding-window NLL over a text corpus.

Methodology matches tools/perplexity/perplexity.cpp: tokenize the whole
corpus, split into n_ctx-sized chunks, evaluate each chunk with the first
half treated as warm-up context (tokens before n_ctx/2 are excluded from the
NLL, as in the reference's `first` cutoff), accumulate -log p(next token).
PPL = exp(mean NLL). The per-chunk evaluation is one jitted forward; the NLL
reduction happens on device so full-vocab logits never reach the host.
"""
from __future__ import annotations

import argparse
import functools
import math
import sys
import time

import numpy as np


def ppl_chunk_fn(cfg, params_treedef_hint=None, dtype=None):
    import jax
    import jax.numpy as jnp

    from ..models.llama import KVCache, forward

    dtype = dtype or jnp.bfloat16

    @jax.jit
    def step(params, tokens, cache):
        """tokens (1, T): returns (sum_nll over positions [first, T-1), count)."""
        B, T = tokens.shape
        positions = jnp.arange(T, dtype=jnp.int32)[None]
        logits, _ = forward(
            params, cfg, tokens, positions, cache,
            cache_pos=0, valid_from=jnp.zeros((B,), jnp.int32), dtype=dtype,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]  # next-token targets
        tok_logp = jnp.take_along_axis(logp[:, :-1, :], tgt[..., None], axis=-1)[..., 0]
        first = T // 2
        mask = jnp.arange(T - 1) >= first
        nll = -(tok_logp * mask).sum()
        return nll, mask.sum()

    return step


def compute_ppl(model_path: str, text: str, n_ctx: int = 512,
                max_chunks: int = 0, progress=True):
    import jax.numpy as jnp

    from ..models.llama import KVCache
    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer

    cfg, params, g = load_model(model_path)
    tok = Tokenizer.from_gguf(g)
    ids = tok.encode(text, add_special=True)
    n_chunks = len(ids) // n_ctx
    if max_chunks:
        n_chunks = min(n_chunks, max_chunks)
    if n_chunks == 0:
        raise ValueError(f"corpus too small: {len(ids)} tokens < n_ctx {n_ctx}")
    step = ppl_chunk_fn(cfg)
    tot_nll, tot_cnt = 0.0, 0
    t0 = time.time()
    for c in range(n_chunks):
        chunk = np.asarray(ids[c * n_ctx:(c + 1) * n_ctx], np.int32)[None]
        # BOS at the start of every chunk (perplexity.cpp does the same)
        if tok.vocab.add_bos and tok.vocab.bos_id is not None:
            chunk = chunk.copy()
            chunk[0, 0] = tok.vocab.bos_id
        cache = KVCache.create(cfg, 1, n_ctx)
        nll, cnt = step(params, jnp.asarray(chunk), cache)
        tot_nll += float(nll)
        tot_cnt += int(cnt)
        if progress:
            ppl = math.exp(tot_nll / max(tot_cnt, 1))
            print(f"[{c + 1}/{n_chunks}] ppl = {ppl:.4f}", file=sys.stderr)
    dt = time.time() - t0
    return {
        "ppl": math.exp(tot_nll / max(tot_cnt, 1)),
        "nll_per_token": tot_nll / max(tot_cnt, 1),
        "tokens_scored": tot_cnt,
        "chunks": n_chunks,
        "tok_per_s": round(n_chunks * n_ctx / dt, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.perplexity")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="text corpus (e.g. wikitext-2 test)")
    ap.add_argument("-c", "--ctx", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=0, help="limit chunk count")
    args = ap.parse_args(argv)
    text = open(args.file, encoding="utf-8").read()
    r = compute_ppl(args.model, text, args.ctx, args.chunks)
    print(r)


if __name__ == "__main__":
    main()
