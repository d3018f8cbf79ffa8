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
                max_chunks: int = 0, progress=True, per_chunk: bool = False):
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
    chunk_ppl = []
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
        if per_chunk:  # cumulative, matching the reference's [i] printouts
            chunk_ppl.append(math.exp(tot_nll / max(tot_cnt, 1)))
        if progress:
            ppl = math.exp(tot_nll / max(tot_cnt, 1))
            print(f"[{c + 1}/{n_chunks}] ppl = {ppl:.4f}", file=sys.stderr)
    dt = time.time() - t0
    out = {
        "ppl": math.exp(tot_nll / max(tot_cnt, 1)),
        "nll_per_token": tot_nll / max(tot_cnt, 1),
        "tokens_scored": tot_cnt,
        "chunks": n_chunks,
        "tok_per_s": round(n_chunks * n_ctx / dt, 1),
    }
    if per_chunk:
        out["chunk_ppl"] = chunk_ppl
    return out


def save_logits(model_path: str, text: str, out_path: str, n_ctx: int = 512,
                max_chunks: int = 0):
    """Evaluate the corpus and save per-position log-probs (the base file for
    --kl-divergence; perplexity.cpp --kl-divergence-base analogue)."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import KVCache, forward
    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer

    cfg, params, g = load_model(model_path)
    tok = Tokenizer.from_gguf(g)
    ids = tok.encode(text, add_special=True)
    n_chunks = len(ids) // n_ctx
    if max_chunks:
        n_chunks = min(n_chunks, max_chunks)

    @jax.jit
    def step(params, tokens):
        cache = KVCache.create(cfg, 1, n_ctx)
        positions = jnp.arange(n_ctx, dtype=jnp.int32)[None]
        logits, _ = forward(params, cfg, tokens, positions, cache, 0,
                            jnp.zeros((1,), jnp.int32))
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    chunks, lps = [], []
    for c in range(n_chunks):
        chunk = np.asarray(ids[c * n_ctx:(c + 1) * n_ctx], np.int32)
        lp = np.asarray(step(params, jnp.asarray(chunk[None]))[0], np.float16)
        chunks.append(chunk)
        lps.append(lp)
    np.savez_compressed(out_path, tokens=np.stack(chunks),
                        logprobs=np.stack(lps), n_ctx=n_ctx)
    return {"chunks": n_chunks, "file": out_path}


def compute_kl(model_path: str, base_path: str, max_chunks: int = 0,
               progress=True):
    """KL(base || model) per predicted token + top-1 agreement
    (perplexity.cpp --kl-divergence)."""
    import math as _math

    import jax
    import jax.numpy as jnp

    from ..models.llama import KVCache, forward
    from ..runtime.loader import load_model

    z = np.load(base_path)
    tokens, base_lp = z["tokens"], z["logprobs"]
    n_ctx = int(z["n_ctx"])
    cfg, params, g = load_model(model_path)

    @jax.jit
    def step(params, toks):
        cache = KVCache.create(cfg, 1, n_ctx)
        positions = jnp.arange(n_ctx, dtype=jnp.int32)[None]
        logits, _ = forward(params, cfg, toks, positions, cache, 0,
                            jnp.zeros((1,), jnp.int32))
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)[0]

    n = tokens.shape[0] if not max_chunks else min(max_chunks, tokens.shape[0])
    kl_sum, cnt, agree = 0.0, 0, 0
    for c in range(n):
        lp = np.asarray(step(params, jnp.asarray(tokens[c][None])), np.float32)
        bp = base_lp[c].astype(np.float32)
        first = n_ctx // 2
        p_base = np.exp(bp[first:-1])
        kl = (p_base * (bp[first:-1] - lp[first:-1])).sum(-1)
        kl_sum += float(kl.sum())
        cnt += kl.shape[0]
        agree += int((bp[first:-1].argmax(-1) == lp[first:-1].argmax(-1)).sum())
        if progress:
            print(f"[{c + 1}/{n}] mean KL {kl_sum / max(cnt, 1):.6f}",
                  file=sys.stderr)
    return {"mean_kl": kl_sum / max(cnt, 1),
            "top1_agreement": agree / max(cnt, 1), "tokens": cnt}


def hellaswag(model_path: str, tasks: list[dict], max_tasks: int = 0,
              progress=True):
    """HellaSwag-style multiple-choice scoring: pick the ending with the
    highest mean token log-prob (perplexity.cpp --hellaswag). Each task:
    {"ctx": str, "endings": [str, ...], "label": int}."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import KVCache, forward
    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer

    cfg, params, g = load_model(model_path)
    tok = Tokenizer.from_gguf(g)
    fns = {}

    def score(ids_ctx, ids_end):
        T = len(ids_ctx) + len(ids_end)
        Tb = 32
        while Tb < T:
            Tb *= 2
        fn = fns.get(Tb)
        if fn is None:
            @jax.jit
            def _f(params, toks, start, end):
                cache = KVCache.create(cfg, 1, toks.shape[1])
                positions = jnp.arange(toks.shape[1], dtype=jnp.int32)[None]
                logits, _ = forward(params, cfg, toks, positions, cache, 0,
                                    jnp.zeros((1,), jnp.int32))
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)[0]
                tgt = toks[0, 1:]
                tlp = jnp.take_along_axis(lp[:-1], tgt[:, None], -1)[:, 0]
                pos = jnp.arange(tlp.shape[0])
                mask = (pos >= start - 1) & (pos < end - 1)
                return (tlp * mask).sum(), mask.sum()

            fn = _f
            fns[Tb] = fn
        toks = np.zeros((1, Tb), np.int32)
        seq = ids_ctx + ids_end
        toks[0, :len(seq)] = seq
        s, m = fn(params, jnp.asarray(toks), jnp.int32(len(ids_ctx)),
                  jnp.int32(len(seq)))
        return float(s) / max(int(m), 1)

    n_ok = n_tot = 0
    tasks = tasks[:max_tasks] if max_tasks else tasks
    for t in tasks:
        ids_ctx = tok.encode(t["ctx"], add_special=True)
        scores = [score(ids_ctx, tok.encode(" " + e, add_special=False))
                  for e in t["endings"]]
        pred = int(np.argmax(scores))
        n_ok += int(pred == int(t["label"]))
        n_tot += 1
        if progress:
            print(f"[{n_tot}] acc {100.0 * n_ok / n_tot:.2f}%", file=sys.stderr)
    return {"accuracy": n_ok / max(n_tot, 1), "tasks": n_tot}


def winogrande(model_path: str, tasks: list[dict], max_tasks: int = 0,
               progress=True):
    """Winogrande scoring (perplexity.cpp --winogrande): each task
    {"sentence": "... _ ...", "option1": str, "option2": str, "answer": 1|2}.
    The blank is filled with each option; the choice with the higher mean
    log-prob over the filled-option-and-suffix tokens wins."""
    import jax.numpy as jnp

    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer

    cfg, params, g = load_model(model_path)
    tok = Tokenizer.from_gguf(g)
    runner = _ChoiceScorer(cfg, params)

    n_ok = n_tot = 0
    tasks = tasks[:max_tasks] if max_tasks else tasks
    for t in tasks:
        pre, _, post = t["sentence"].partition("_")
        ids_pre = tok.encode(pre, add_special=True)
        scores = []
        for opt in (t["option1"], t["option2"]):
            cont = tok.encode(opt + post, add_special=False)
            scores.append(runner.score(ids_pre, cont))
        pred = 1 + int(np.argmax(scores))
        n_ok += int(pred == int(t["answer"]))
        n_tot += 1
        if progress and n_tot % 50 == 0:
            print(f"[{n_tot}] acc {n_ok / n_tot:.4f}", file=sys.stderr)
    return {"acc": n_ok / max(n_tot, 1), "tasks": n_tot}


def multiple_choice(model_path: str, tasks: list[dict], max_tasks: int = 0,
                    progress=True):
    """MMLU-style multiple choice (perplexity.cpp --multiple-choice): each
    task {"question": str, "choices": [str, ...], "answer": int}; the choice
    with the highest mean token log-prob given the question wins."""
    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer

    cfg, params, g = load_model(model_path)
    tok = Tokenizer.from_gguf(g)
    runner = _ChoiceScorer(cfg, params)

    n_ok = n_tot = 0
    tasks = tasks[:max_tasks] if max_tasks else tasks
    for t in tasks:
        ids_q = tok.encode(t["question"], add_special=True)
        scores = [runner.score(ids_q, tok.encode(" " + c, add_special=False))
                  for c in t["choices"]]
        pred = int(np.argmax(scores))
        n_ok += int(pred == int(t["answer"]))
        n_tot += 1
        if progress and n_tot % 50 == 0:
            print(f"[{n_tot}] acc {n_ok / n_tot:.4f}", file=sys.stderr)
    return {"acc": n_ok / max(n_tot, 1), "tasks": n_tot}


class _ChoiceScorer:
    """Shared continuation scorer for the multiple-choice benchmarks: mean
    token log-prob of `cont` given `ctx`, bucketed jits per length."""

    def __init__(self, cfg, params):
        import jax
        import jax.numpy as jnp

        from ..models.llama import KVCache, forward

        self.cfg, self.params = cfg, params
        self._fns = {}

        def build(Tb):
            @jax.jit
            def _f(params, toks, start, end):
                cache = KVCache.create(cfg, 1, toks.shape[1])
                positions = jnp.arange(toks.shape[1], dtype=jnp.int32)[None]
                logits, _ = forward(params, cfg, toks, positions, cache, 0,
                                    jnp.zeros((1,), jnp.int32))
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)[0]
                tgt = toks[0, 1:]
                tlp = jnp.take_along_axis(lp[:-1], tgt[:, None], -1)[:, 0]
                pos = jnp.arange(tlp.shape[0])
                mask = (pos >= start - 1) & (pos < end - 1)
                return (tlp * mask).sum(), mask.sum()
            return _f

        self._build = build

    def score(self, ids_ctx, ids_cont) -> float:
        import jax.numpy as jnp

        T = len(ids_ctx) + len(ids_cont)
        Tb = 32
        while Tb < T:
            Tb *= 2
        fn = self._fns.get(Tb)
        if fn is None:
            fn = self._fns[Tb] = self._build(Tb)
        toks = np.zeros((1, Tb), np.int32)
        seq = ids_ctx + ids_cont
        toks[0, :len(seq)] = seq
        s, m = fn(self.params, jnp.asarray(toks), jnp.int32(len(ids_ctx)),
                  jnp.int32(len(seq)))
        return float(s) / max(int(m), 1)


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.perplexity")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", help="text corpus (e.g. wikitext-2 test)")
    ap.add_argument("-c", "--ctx", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=0, help="limit chunk count")
    ap.add_argument("--save-logits", help="write base logprobs for KL mode")
    ap.add_argument("--kl-divergence", help="base logprobs file to compare")
    ap.add_argument("--hellaswag", help="JSONL tasks file (ctx/endings/label)")
    ap.add_argument("--winogrande",
                    help="JSONL tasks (sentence/option1/option2/answer)")
    ap.add_argument("--multiple-choice", dest="multiple_choice",
                    help="JSONL tasks (question/choices/answer) e.g. MMLU")
    args = ap.parse_args(argv)
    if args.hellaswag:
        import json as _json

        tasks = [_json.loads(line) for line in open(args.hellaswag)]
        print(hellaswag(args.model, tasks, args.chunks))
        return
    if args.winogrande:
        import json as _json

        tasks = [_json.loads(line) for line in open(args.winogrande)]
        print(winogrande(args.model, tasks, args.chunks))
        return
    if args.multiple_choice:
        import json as _json

        tasks = [_json.loads(line) for line in open(args.multiple_choice)]
        print(multiple_choice(args.model, tasks, args.chunks))
        return
    if args.kl_divergence:
        print(compute_kl(args.model, args.kl_divergence, args.chunks))
        return
    text = open(args.file, encoding="utf-8").read()
    if args.save_logits:
        print(save_logits(args.model, text, args.save_logits, args.ctx, args.chunks))
        return
    r = compute_ppl(args.model, text, args.ctx, args.chunks)
    print(r)


if __name__ == "__main__":
    main()
