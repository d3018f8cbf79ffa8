"""iSWA dual KV cache (llama_kv_cache_iswa, src/llama-kv-cache-iswa.*).

For interleaved local/global models, SWA layers keep only a ring of
window + chunk rows. Correctness bar: the dual-cache engine must produce
the SAME logits and greedy tokens as the single-cache engine on the same
model — the ring reconstruction (slot j holds the newest position <= q
congruent to j) is exact when ring >= window + chunk, so any divergence
beyond float summation order is a bug. Plus the actual memory win.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tpullm.models.llama import KVCache, swa_flags
from tpullm.runtime.engine import InferenceEngine
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_arch_gguf


@pytest.fixture(scope="module", params=["gemma2", "gemma3"])
def model(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(request.param)
    path = build_arch_gguf(str(d / "m.gguf"), request.param, seed=11)
    return load_model(path)


def test_swa_flags(model):
    cfg, _, _ = model
    flags = swa_flags(cfg)
    # every swa_pattern-th layer is full attention (a tiny model with
    # n_layer < pattern is legitimately all-SWA)
    assert any(flags)
    assert flags == [((li + 1) % cfg.swa_pattern) != 0
                     for li in range(cfg.n_layer)]


def test_dual_cache_smaller(model):
    cfg, _, _ = model
    S = 512
    single = KVCache.create(cfg, 1, S, jnp.bfloat16)
    dual = KVCache.create(cfg, 1, S, jnp.bfloat16, iswa=True, max_chunk=64)
    assert dual.dual and not single.dual
    nb = lambda c: sum(a.size * a.dtype.itemsize for a in
                       (c.k, c.v, c.kw, c.vw) if a is not None)
    assert nb(dual) < nb(single)
    # ring covers window + chunk
    assert dual.ring == min(cfg.sliding_window + 64, S)


def test_dual_matches_single(model):
    """Same model, both cache modes: identical greedy, near-identical
    logits (ring permutes key order -> summation-order float noise only)."""
    cfg, params, _ = model
    prompts = [[3, 9, 4, 17, 6, 2, 11, 5, 1, 8, 13, 7],
               [5, 2, 8, 1]]
    a = InferenceEngine(cfg, params, max_seq_len=128,
                        compute_dtype=jnp.float32, decode_chunk=4)
    b = InferenceEngine(cfg, params, max_seq_len=128,
                        compute_dtype=jnp.float32, decode_chunk=4,
                        iswa=True, prefill_chunk=32)
    assert b.iswa
    ra = a.generate(prompts, max_new_tokens=10, return_logits=True)
    rb = b.generate(prompts, max_new_tokens=10, return_logits=True)
    nmse = float(((ra.logits - rb.logits) ** 2).mean()
                 / (ra.logits ** 2).mean())
    assert nmse < 1e-10, nmse
    assert ra.tokens == rb.tokens


def test_dual_long_context_past_window(model):
    """Generation must stay consistent well past the sliding window, where
    the ring has wrapped many times (window=32 here)."""
    cfg, params, _ = model
    prompt = list(np.random.default_rng(0).integers(1, 90, 70))
    a = InferenceEngine(cfg, params, max_seq_len=256,
                        compute_dtype=jnp.float32, decode_chunk=8)
    b = InferenceEngine(cfg, params, max_seq_len=256,
                        compute_dtype=jnp.float32, decode_chunk=8,
                        iswa=True, prefill_chunk=32)
    ra = a.generate([prompt], max_new_tokens=24)
    rb = b.generate([prompt], max_new_tokens=24)
    assert ra.tokens == rb.tokens


def _serve_greedy(cfg, params, prompts, iswa, max_seq_len=256, n_new=12,
                  **kw):
    from tpullm.server.context import GenParams, ServerContext, Task

    ctx = ServerContext(cfg, params, None, n_slots=2,
                        max_seq_len=max_seq_len, decode_chunk=4,
                        prefill_chunk=32, compute_dtype=jnp.float32,
                        iswa=iswa, **kw)
    ctx.start()
    try:
        tasks = [Task(tokens=list(p), params=GenParams(
            max_tokens=n_new, temperature=0.0, ignore_eos=True))
            for p in prompts]
        for t in tasks:
            ctx.submit(t)
        outs = []
        for t in tasks:
            done = [p for k, p in t.events() if k == "done"]
            assert done, "task errored"
            outs.append(done[0]["tokens"])
        return outs, ctx
    finally:
        ctx.stop()


def test_server_iswa_matches_full(model):
    """VERDICT #8: server slots on the dual cache — same greedy output as
    full-context slots, with the SWA layers' KV actually window-sized."""
    cfg, params, _ = model
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(1, 90, 60)), list(rng.integers(1, 90, 9))]
    full, ctx_f = _serve_greedy(cfg, params, prompts, iswa=False)
    dual, ctx_d = _serve_greedy(cfg, params, prompts, iswa=True)
    assert dual == full
    assert ctx_d.memory.cache.dual and not ctx_f.memory.cache.dual
    nb = lambda c: sum(a.size * a.dtype.itemsize for a in
                       (c.k, c.v, c.kw, c.vw) if a is not None)
    assert nb(ctx_d.memory.cache) < nb(ctx_f.memory.cache)


def test_server_iswa_prefix_reuse_and_reprocess(model):
    """Back-to-back requests sharing a prefix: reuse must stay correct on
    the ring (or fall back to reprocessing) — outputs equal either way."""
    from tpullm.server.context import GenParams, ServerContext, Task

    cfg, params, _ = model
    rng = np.random.default_rng(5)
    base = list(rng.integers(1, 90, 50))
    ctx = ServerContext(cfg, params, None, n_slots=1, max_seq_len=256,
                        decode_chunk=4, prefill_chunk=32,
                        compute_dtype=jnp.float32, iswa=True)
    ctx.start()
    try:
        outs = []
        for tail in ([7, 3], [7, 3], [11]):  # 2nd reuses, 3rd truncates
            t = Task(tokens=base + tail, params=GenParams(
                max_tokens=8, temperature=0.0, ignore_eos=True))
            ctx.submit(t)
            done = [p for k, p in t.events() if k == "done"][0]
            outs.append(done["tokens"])
    finally:
        ctx.stop()
    assert outs[0] == outs[1]
    # oracle: the engine on a single cache
    eng = InferenceEngine(cfg, params, max_seq_len=256,
                          compute_dtype=jnp.float32, decode_chunk=4)
    ra = eng.generate([base + [11]], max_new_tokens=8)
    assert outs[2] == list(ra.tokens[0])


def test_server_iswa_context_shift_reprocesses(model):
    """Overflowing an iSWA server slot must reprocess (ring cannot shift)
    and keep generating rather than erroring out."""
    cfg, params, _ = model
    rng = np.random.default_rng(8)
    prompts = [list(rng.integers(1, 90, 40))]
    outs, ctx = _serve_greedy(cfg, params, prompts, iswa=True,
                              max_seq_len=64, n_new=40)
    assert len(outs[0]) == 40
    assert ctx.metrics.get("context_shifts_total", 0) >= 1


def test_chunked_prefill_logits_match(model):
    cfg, params, _ = model
    prompt = list(np.random.default_rng(1).integers(1, 90, 50))
    a = InferenceEngine(cfg, params, max_seq_len=128,
                        compute_dtype=jnp.float32)
    b = InferenceEngine(cfg, params, max_seq_len=128,
                        compute_dtype=jnp.float32, iswa=True,
                        prefill_chunk=32)
    la = a.logits_for([prompt])
    lb = b.logits_for([prompt])
    nmse = float(((la - lb) ** 2).mean() / (la ** 2).mean())
    assert nmse < 1e-10, nmse
