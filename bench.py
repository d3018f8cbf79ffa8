"""Driver benchmark: single-chip decode/prefill throughput.

Fabricates a synthetic Llama-3-8B-shaped Q4_K checkpoint directly at the
kernel layout (random payloads; throughput does not depend on weight values),
runs pp512 prefill + tg decode on the real TPU, and prints the result JSON
line — PROGRESSIVELY: the core line is printed as soon as decode is measured,
then re-printed enriched after each optional stage (parity check, decode-at-
depth rows). Every printed line is a complete, valid result; a consumer
should take the LAST parseable line. A timeout mid-depth-sweep therefore
still yields the core numbers (the round-3 rc=124 failure mode).

Budget: BENCH_BUDGET_S (default 420) bounds optional stages — each depth row
is skipped (and listed in "depth_skipped") if the elapsed time plus a
conservative per-row estimate would overrun. The core stages always run.

Baseline: single-chip HBM roofline for batch-1 decode, normalized by the
SAME-RUN measured achievable stream rate (the chip is shared; spec-sheet
bandwidth is not attainable through this runtime). Q4_K-kmajor 8B weights =
4.75 bpw -> ~4.76 GB/token pass; vs_baseline is the fraction of that
roofline achieved (1.0 == speed of light).

Methodology mirrors the reference's llama-bench test points (pp512, tg128,
tg32 @ d{1024,4096,16384}; benches/mac-m2-ultra/mac-m2-ultra.md:47-55).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODEL = os.environ.get("BENCH_MODEL", "8b")
SHAPES = {
    "8b": dict(vocab_size=128256, n_embd=4096, n_layer=32, n_head=32, n_head_kv=8, n_ff=14336),
    "1b": dict(vocab_size=32000, n_embd=2048, n_layer=22, n_head=32, n_head_kv=4, n_ff=5632),
    "tiny": dict(vocab_size=2048, n_embd=512, n_layer=4, n_head=8, n_head_kv=4, n_ff=1024),
}

T0 = time.time()


def _elapsed():
    return time.time() - T0


def _note(msg: str):
    """Stage trace on stderr (stdout carries only result JSON lines)."""
    print(f"[bench {_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    budget = float(os.environ.get("BENCH_BUDGET_S", "420"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpullm.ops.sampling import GREEDY
    from tpullm.runtime.engine import InferenceEngine
    from tpullm.utils.synth import synth_kmajor_q4k_fast

    shape = SHAPES[MODEL]
    t0 = time.time()
    _note("fabricating weights")
    cfg, params = synth_kmajor_q4k_fast(seed=0, **shape)
    # force the upload now so it lands in synth_s, not compile_s
    jax.block_until_ready(jax.tree_util.tree_leaves(params))
    gen_s = time.time() - t0
    _note(f"weights on device ({gen_s:.1f}s)")

    # roofline bytes/token at the REFERENCE's Q4_K density (144B per 256
    # elems = 4.5 bpw, ggml-common.h block_q4_K) — NOT our own stored
    # density (4.75 bpw kmajor) — so vs_baseline stays comparable across
    # rounds and our +6% layout tax counts against us, not for us
    n_params = (
        2 * shape["vocab_size"] * shape["n_embd"]
        + shape["n_layer"]
        * (
            2 * shape["n_embd"] * shape["n_embd"]
            + 2 * shape["n_embd"] * shape["n_embd"] // (shape["n_head"] // shape["n_head_kv"])
            + 3 * shape["n_embd"] * shape["n_ff"]
        )
    )
    qbytes = n_params * 144 / 256
    from tpullm.ops.qtensor import QTensor

    stored_bytes = sum(q.nbytes for q in jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QTensor))
        if isinstance(q, QTensor))

    depths = [int(d) for d in os.environ.get(
        "BENCH_DEPTHS", "1024,4096,16384").split(",") if d]
    # ONE engine serves both the core measurement and the depth sweep: the
    # engine's bucketed kv views size decode attention by actual depth, so a
    # large max_seq_len costs nothing at shallow depth (no second engine, no
    # second compile set — the round-3 timeout fix)
    S_max = max([1024] + [d + 512 for d in depths])
    eng = InferenceEngine(cfg, params, max_seq_len=S_max,
                          compute_dtype=jnp.bfloat16, decode_chunk=32)
    B, T_PP = 1, 512
    prompt = [list(range(2, T_PP + 2))]

    # warmup: compile + first program load for the two hot programs (the
    # dominant cost through a shared-chip runtime is program-load/queue
    # latency, not XLA compile — measured sub-second to ~13 s compiles vs
    # 100-400 s first-dispatch waits under tenant contention)
    _note("warmup: prefill + decode program load")
    t0 = time.time()
    logits = eng.logits_for(prompt)
    dfn = eng._decode_fn(GREEDY, 32, False, 1024)
    cache = eng.new_cache(1)
    tok = jnp.full((1,), 5, jnp.int32)
    pos = jnp.full((1,), T_PP, jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(0)
    toks, cache = dfn(eng.params, tok, pos, cache, jnp.int32(T_PP), vf, key)
    jax.block_until_ready(toks)
    _measured_stream_gbps()  # warm the stream-probe programs too
    compile_s = time.time() - t0
    _note(f"warmup done ({compile_s:.1f}s)")

    # prefill timing (best of 3: the chip is shared, transient contention
    # must not masquerade as engine throughput)
    pp_s = 1e9
    for _ in range(3):
        t0 = time.time()
        eng.logits_for(prompt)
        pp_s = min(pp_s, time.time() - t0)
    pp_tok_s = T_PP / pp_s

    # decode timing: 4 consecutive 32-token chunks (tg128) through the
    # engine's decode program, repeated 3x, each rep paired with a stream
    # measurement taken in the SAME window; the rep with the best
    # tg/roofline ratio is reported (same-window normalization keeps a
    # noisy-neighbor burst from reading as an engine regression). The core
    # JSON line prints after the FIRST rep — a driver timeout at any later
    # point still has a complete result on stdout.
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    best = {"ratio": -1.0}
    result = {}
    for rep in range(3):
        t0 = time.time()
        for _c in range(4):
            toks, cache = dfn(eng.params, toks[-1], pos, cache,
                              jnp.int32(T_PP), vf, key)
        jax.block_until_ready(toks)
        tg = 128.0 / (time.time() - t0)
        gbps = _measured_stream_gbps() or 819.0
        ratio = tg / (gbps * 1e9 / qbytes)
        if ratio > best["ratio"]:
            best = {"ratio": ratio, "tg": tg, "gbps": gbps}
        roofline = best["gbps"] * 1e9 / qbytes
        result = {
            "metric": f"decode_tok_s_llama3_{MODEL}_q4k_chip({kind})",
            "value": round(best["tg"], 2),
            "unit": "tok/s",
            "vs_baseline": round(best["tg"] / roofline, 4),
            "prefill_tok_s": round(pp_tok_s, 1),
            "roofline_tok_s": round(roofline, 1),
            "stream_gbps_meas": round(best["gbps"], 1),
            "compile_s": round(compile_s, 1),
            "weight_gb": round(stored_bytes / 1e9, 2),
            "roofline_gb_per_tok": round(qbytes / 1e9, 2),
            "synth_s": round(gen_s, 1),
        }
        print(json.dumps(result), flush=True)  # core line lands per rep
        _note(f"rep{rep}: tg {tg:.2f} tok/s @ stream {gbps:.0f} GB/s")
    del cache

    _note("kernel parity check")
    parity_nmse = _kernel_parity_nmse(cfg, params)
    result["parity_nmse"] = parity_nmse
    result["parity_ok"] = (parity_nmse is not None and parity_nmse < 1e-4)
    print(json.dumps(result), flush=True)

    # prefill compute-roofline row (reference: llama-bench pp512 tables,
    # benches/dgx-spark/dgx-spark.md:33-40): achieved TFLOP/s vs chip peak
    # so prefill can't regress invisibly behind the decode metric.
    flops_per_tok = 2.0 * (n_params - shape["vocab_size"] * shape["n_embd"])
    peak = 197e12 if "v5 lite" in kind else 197e12  # bf16 peak, v5e
    result["prefill_tflops"] = round(pp_tok_s * flops_per_tok / 1e12, 1)
    result["prefill_mfu"] = round(pp_tok_s * flops_per_tok / peak, 4)
    print(json.dumps(result), flush=True)

    # batched decode row (B=8): aggregate tok/s through the same decode
    # program — the continuous-batching throughput claim, measured.
    if _elapsed() + 90.0 < budget:
        try:
            _note("batched decode B=8")
            result["batched_tg_b8"] = round(_tg_batched(eng, 8, GREEDY), 2)
        except Exception as e:
            result["batched_tg_b8"] = None
            result.setdefault("depth_errors", []).append(f"b8: {e}")
        print(json.dumps(result), flush=True)

    # decode-at-depth rows (tg32 @ d): drive the engine's own decode program
    # at slot=d over a fresh cache — KV contents don't affect throughput, so
    # no multi-thousand-token prefill is paid per row. Each row costs one
    # program load (a new kv-view bucket) + timed 32-token chunks.
    skipped = []
    for d in sorted(depths):
        est_row_s = 90.0  # conservative: program load through shared runtime
        if _elapsed() + est_row_s > budget:
            skipped.append(d)
            continue
        try:
            _note(f"depth row d={d}")
            result[f"tg32_d{d}"] = round(_tg_at_depth(eng, d, GREEDY), 2)
        except Exception as e:  # a failed row must not kill the core result
            result[f"tg32_d{d}"] = None
            result.setdefault("depth_errors", []).append(f"d{d}: {e}")
        print(json.dumps(result), flush=True)
    if skipped:
        result["depth_skipped"] = skipped
    result["total_s"] = round(_elapsed(), 1)
    print(json.dumps(result), flush=True)


def _tg_batched(eng, B: int, sampler) -> float:
    """Aggregate decode tok/s with B live rows at depth 512 through the
    engine's real decode program (batched-bench B-row analogue)."""
    import jax
    import jax.numpy as jnp

    d = 512
    fn = eng._decode_fn(sampler, 32, False, 1024)
    cache = eng.new_cache(B)
    tok = jnp.full((B,), 5, jnp.int32)
    pos = jnp.full((B,), d, jnp.int32)
    vf = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(0)
    toks, cache = fn(eng.params, tok, pos, cache, jnp.int32(d), vf, key)
    jax.block_until_ready(toks)  # compile + program load
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        toks, cache = fn(eng.params, toks[-1], pos, cache, jnp.int32(d), vf,
                         key)
        jax.block_until_ready(toks)
        best = min(best, time.time() - t0)
    del cache
    return B * 32.0 / best


def _tg_at_depth(eng, d: int, sampler) -> float:
    """32-token decode rate with the cache cursor at depth d (the engine's
    real serving program for that depth: bucketed kv view covering d+33)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    need = d + 33
    kv_view = 512
    while kv_view < need:
        kv_view *= 2
    kv_view = min(kv_view, eng.max_seq_len)
    fn = eng._decode_fn(sampler, 32, False, kv_view)
    cache = eng.new_cache(1)
    tok = jnp.full((1,), 5, jnp.int32)
    pos = jnp.full((1,), d, jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(0)
    toks, cache = fn(eng.params, tok, pos, cache, jnp.int32(d), vf, key)
    jax.block_until_ready(toks)  # compile + program load
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        toks, cache = fn(eng.params, toks[-1], pos, cache, jnp.int32(d), vf, key)
        jax.block_until_ready(toks)
        best = min(best, time.time() - t0)
    del cache
    return 32.0 / best


def _kernel_parity_nmse(cfg, params):
    """On-device numeric check: the fused Pallas dequant-matmul vs the XLA
    dequant+dot path on the SAME bench weights (the test-backend-ops
    analogue, tests/test-backend-ops.cpp:1-11, executed on real hardware
    every bench run so a Mosaic lowering bug cannot ship silently)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        from tpullm.ops.qmm import qmm_kmajor

        qt = params["layers"]["wqkv"]
        K = qt.n_in
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, K)) * 0.3, jnp.bfloat16)

        @jax.jit
        def both(x, qt):
            data0 = {k: v[0] for k, v in qt.data.items()}
            y_k = qmm_kmajor(x, qt.data, qt.qtype, qt.n_out,
                             out_dtype=jnp.float32, layer=jnp.int32(0))
            from tpullm.quant.kmajor import dequant_kmajor_jnp

            w = dequant_kmajor_jnp(data0, qt.qtype, jnp.bfloat16)
            y_r = jax.lax.dot_general(
                x, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y_k, y_r

        y_k, y_r = both(x, qt)
        y_k, y_r = np.asarray(y_k, np.float64), np.asarray(y_r, np.float64)
        denom = float((y_r ** 2).mean()) or 1.0
        return float(((y_k - y_r) ** 2).mean() / denom)
    except Exception:
        return None


def _measured_stream_gbps():
    """Achievable dense-bf16 stream rate on THIS chip (slope-timed matvec
    chain; cancels the dispatch round-trip). The spec sheet number is not
    attainable through this runtime, so the roofline uses the measured one."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        rng = np.random.default_rng(0)
        N = K = 4096
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((16, K)), jnp.bfloat16)

        def chain(L):
            @jax.jit
            def f(x, w):
                def body(c, _):
                    y = jax.lax.dot_general(
                        c, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return (y * 1e-4).astype(jnp.bfloat16), None
                y, _ = jax.lax.scan(body, x, None, length=L)
                return jnp.sum(y.astype(jnp.float32))
            return f

        c1, c2 = chain(16), chain(96)
        float(c1(x, w)); float(c2(x, w))
        t1 = t2 = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(c1(x, w)); t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter(); float(c2(x, w)); t2 = min(t2, time.perf_counter() - t0)
        dt = (t2 - t1) / 80
        return N * K * 2 / dt / 1e9
    except Exception:
        return None


if __name__ == "__main__":
    main()
