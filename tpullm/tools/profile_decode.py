"""Decode-step cost breakdown on the real chip (perf tool, no reference
counterpart — the llama-bench analogue for *where the milliseconds go*).

Ablates the batch-1 decode step into components with slope timing (two scan
lengths inside one jit; the host<->device dispatch round-trip and the missing
block_until_ready on this runtime cancel in the difference):

  full        sample-free forward step (argmax feedback), logits used
  no_logits   same but only the final hidden is live (XLA DCEs the lm_head)
  small_kv    full, but with a short KV cache (attention HBM traffic ablated)
  sampler     the on-device sampler chain alone
  embed_head  tok_embd gather + final norm + lm_head alone

Usage: python -m tpullm.tools.profile_decode [--model 8b|1b|tiny] [--steps 24]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _slope_time(make_fn, L1=6, L2=24, reps=3):
    """Cost per scan step via (t(L2) - t(L1)) / (L2 - L1)."""
    f1, f2 = make_fn(L1), make_fn(L2)
    float(f1())  # compile + warm
    float(f2())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f1())
        t1 = time.perf_counter()
        float(f2())
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (L2 - L1))
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=os.environ.get("BENCH_MODEL", "8b"))
    ap.add_argument("--s-long", type=int, default=1024)
    ap.add_argument("--s-short", type=int, default=128)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    import bench as bench_mod
    from tpullm.utils.synth import synth_kmajor_q4k_fast

    cfg, params = synth_kmajor_q4k_fast(seed=0, **bench_mod.SHAPES[args.model])

    from tpullm.models.llama import KVCache, forward
    from tpullm.ops.sampling import BatchSamplerParams, sample_batch

    B = 1
    pos0 = 64  # decode from a warm cache position

    def step_scan(n_steps, S):
        cache0 = KVCache.create(cfg, B, S, jnp.bfloat16)

        @jax.jit
        def run(params, cache):
            def body(carry, _):
                tok, pos, cache = carry
                logits, cache = forward(
                    params, cfg, tok[:, None], pos[:, None], cache,
                    cache_pos=pos, valid_from=jnp.zeros((B,), jnp.int32))
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                live = logits[0, -1, 0]
                return (nxt, pos + 1, cache), live
            tok0 = jnp.full((B,), 7, jnp.int32)
            p0 = jnp.full((B,), pos0, jnp.int32)
            (_, _, cache), ys = jax.lax.scan(body, (tok0, p0, cache), None,
                                             length=n_steps)
            return ys.sum()
        return lambda: run(params, cache0)

    def no_logits_scan(n_steps, S):
        cache0 = KVCache.create(cfg, B, S, jnp.bfloat16)

        @jax.jit
        def run(params, cache):
            def body(carry, _):
                tok, pos, cache = carry
                _, cache, hidden = forward(
                    params, cfg, tok[:, None], pos[:, None], cache,
                    cache_pos=pos, valid_from=jnp.zeros((B,), jnp.int32),
                    return_hidden=True)
                return (tok, pos + 1, cache), hidden[0, -1, 0].astype(jnp.float32)
            tok0 = jnp.full((B,), 7, jnp.int32)
            p0 = jnp.full((B,), pos0, jnp.int32)
            _, ys = jax.lax.scan(body, (tok0, p0, cache), None, length=n_steps)
            return ys.sum()
        return lambda: run(params, cache0)

    def sampler_scan(n_steps):
        V = cfg.vocab_size
        p = BatchSamplerParams.neutral(B).with_row(
            0, __import__("tpullm.ops.sampling", fromlist=["SamplerConfig"]
                          ).SamplerConfig(temperature=0.8, top_k=40, top_p=0.95))
        logits0 = jnp.asarray(np.random.default_rng(0).standard_normal((B, V)),
                              jnp.float32)

        @jax.jit
        def run(logits):
            def body(carry, i):
                logits, key = carry
                key, sub = jax.random.split(key)
                tok = sample_batch(logits, p, sub)
                logits = logits + tok[:, None].astype(jnp.float32) * 1e-6
                return (logits, key), tok[0]
            (_, _), ys = jax.lax.scan(body, (logits, jax.random.PRNGKey(0)),
                                      jnp.arange(n_steps))
            return ys.sum()
        return lambda: run(logits0)

    def embed_head_scan(n_steps):
        from tpullm.models.llama import _mm, _norm

        @jax.jit
        def run(params):
            def body(tok, _):
                x = params["tok_embd"].take_rows(tok[:, None], jnp.bfloat16)
                x = _norm(x, params["output_norm"],
                          params.get("output_norm_b"), cfg)
                logits = _mm(x, params["output"], jnp.bfloat16)
                nxt = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
                return nxt, logits[0, -1, 0].astype(jnp.float32)
            tok0 = jnp.full((B,), 7, jnp.int32)
            _, ys = jax.lax.scan(body, tok0, None, length=n_steps)
            return ys.sum()
        return lambda: run(params)

    S = args.s_long
    out = {}
    out["full_ms"] = _slope_time(lambda L: step_scan(L, S)) * 1e3
    out["no_logits_ms"] = _slope_time(lambda L: no_logits_scan(L, S)) * 1e3
    out["small_kv_ms"] = _slope_time(lambda L: step_scan(L, args.s_short)) * 1e3
    out["sampler_ms"] = _slope_time(lambda L: sampler_scan(L)) * 1e3
    out["embed_head_ms"] = _slope_time(lambda L: embed_head_scan(L)) * 1e3
    out["lm_head_delta_ms"] = out["full_ms"] - out["no_logits_ms"]
    out["kv_len_delta_ms"] = out["full_ms"] - out["small_kv_ms"]
    out = {k: round(v, 3) for k, v in out.items()}
    out["device"] = str(jax.devices()[0].device_kind)
    out["model"] = args.model
    out["S"] = S
    print(json.dumps(out))


if __name__ == "__main__":
    main()
