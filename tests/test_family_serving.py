"""Serving-path coverage for non-attention families (reference: the
server runs any arch llama_model_load accepts; memory dispatch in
src/llama-model.cpp create_memory). RWKV goes through the same
RecurrentSlotMemory/decode loop as mamba — these tests pin that the slot
loop's chunked prefill + scan decode reproduce the model's own
step-by-step greedy outputs exactly, and that slot state IO works on
non-mamba state trees."""
import numpy as np
import pytest
import jax.numpy as jnp

from tpullm.models.family import model_family
from tpullm.runtime.loader import load_model
from tpullm.server.context import GenParams, ServerContext
from tpullm.utils.synth import build_mamba_gguf, build_rwkv7_gguf


@pytest.fixture(scope="module")
def rwkv_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rw") / "rwkv.gguf")
    build_rwkv7_gguf(path, vocab_size=96, n_embd=32, n_layer=2, head_size=8)
    return load_model(path)


def _greedy_oracle(cfg, params, prompt, n, fwd, state):
    """Step-by-step greedy with the model's own forward (the truth)."""
    toks = list(prompt)
    out = []
    for _ in range(n):
        lg, state = fwd(params, cfg, jnp.asarray([toks], jnp.int32), state,
                        dtype=jnp.float32)
        nxt = int(np.asarray(lg[0, -1]).argmax())
        out.append(nxt)
        toks = [nxt]  # incremental: state carries the history
    return out


def test_rwkv_family_detected(rwkv_model):
    cfg, _, _ = rwkv_model
    assert model_family(cfg) == "rwkv"


def test_rwkv_server_matches_oracle(rwkv_model):
    from tpullm.models.rwkv import RwkvState, forward

    cfg, params, _ = rwkv_model
    ctx = ServerContext(cfg, params, None, n_slots=2, max_seq_len=128,
                        decode_chunk=4, prefill_chunk=8,
                        compute_dtype=jnp.float32)
    assert ctx.family == "rwkv"
    ctx.start()
    prompt = [3, 9, 4, 17, 6, 2, 11]
    want = _greedy_oracle(cfg, params, prompt, 6, forward,
                          RwkvState.create(cfg, 1))
    info = ctx.generate(prompt, GenParams(max_tokens=6, temperature=0.0))
    assert info["tokens"] == want, (info["tokens"], want)
    ctx.stop()


def test_rwkv_slot_state_roundtrip(rwkv_model, tmp_path):
    cfg, params, _ = rwkv_model
    ctx = ServerContext(cfg, params, None, n_slots=1, max_seq_len=128,
                        decode_chunk=2, prefill_chunk=8,
                        compute_dtype=jnp.float32)
    ctx.start()
    prompt = [5, 1, 7, 3]
    a = ctx.generate(prompt, GenParams(max_tokens=4, temperature=0.0))
    blob = ctx.memory.save_slot(0)
    assert blob["kind"] == "recurrent" and "leaf0" in blob
    p = str(tmp_path / "slot.npz")
    ctx.memory.save_slot_file(0, p)
    # wipe, then restore and continue: continuation must match a fresh run
    ctx.memory.truncate(0, 0)
    ctx.memory.load_slot_file(0, p)
    st = ctx.memory.slots[0]
    full = prompt + a["tokens"]
    assert st.tokens == full[: st.n_past]
    # prefix reuse: continuing the restored state skips re-prefill
    reuse = ctx.memory.prefix_match(0, full + [2])
    assert reuse == st.n_past
    ctx.stop()


def test_mamba_server_still_works(tmp_path):
    """Regression: the family generalization keeps the ssm path intact."""
    from tpullm.models.mamba import RecurrentState, forward

    path = str(tmp_path / "m.gguf")
    build_mamba_gguf(path, vocab_size=96, n_embd=32, n_layer=2)
    cfg, params, _ = load_model(path)
    assert model_family(cfg) == "ssm"
    ctx = ServerContext(cfg, params, None, n_slots=1, max_seq_len=128,
                        decode_chunk=4, prefill_chunk=8,
                        compute_dtype=jnp.float32)
    ctx.start()
    prompt = [3, 9, 4, 17]
    want = _greedy_oracle(cfg, params, prompt, 5, forward,
                          RecurrentState.create(cfg, 1))
    info = ctx.generate(prompt, GenParams(max_tokens=5, temperature=0.0))
    assert info["tokens"] == want
    ctx.stop()


def test_jamba_server_matches_oracle(tmp_path):
    """Hybrid (attention+recurrent) through the slot loop: chunked prefill
    with per-slot state slicing + per-row cache positions in decode must
    reproduce the model's own stepwise greedy exactly."""
    from tpullm.models.hybrid import HybridState, forward
    from tpullm.utils.synth import build_jamba_gguf

    path = str(tmp_path / "j.gguf")
    build_jamba_gguf(path, vocab_size=96, n_embd=32, n_layer=4,
                     n_head=4, n_head_kv=2, n_ff=64)
    cfg, params, _ = load_model(path)
    assert model_family(cfg) == "hybrid"

    prompt = [3, 9, 4, 17, 6, 2, 11, 5, 1]
    n_new = 6

    # oracle: full prefill + stepwise decode with the raw forward
    st = HybridState.create(cfg, 1, 64, jnp.float32)
    zeros = jnp.zeros((1,), jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    lg, st = forward(params, cfg, jnp.asarray([prompt], jnp.int32), pos, st,
                     0, zeros, dtype=jnp.float32)
    want = [int(np.asarray(lg[0, -1]).argmax())]
    for k in range(n_new - 1):
        p = len(prompt) + k
        lg, st = forward(params, cfg,
                         jnp.asarray([[want[-1]]], jnp.int32),
                         jnp.asarray([[p]], jnp.int32), st, p, zeros,
                         dtype=jnp.float32)
        want.append(int(np.asarray(lg[0, -1]).argmax()))

    ctx = ServerContext(cfg, params, None, n_slots=2, max_seq_len=64,
                        decode_chunk=3, prefill_chunk=4,
                        compute_dtype=jnp.float32)
    assert ctx.family == "hybrid"
    ctx.start()
    info = ctx.generate(prompt, GenParams(max_tokens=n_new, temperature=0.0))
    assert info["tokens"] == want, (info["tokens"], want)
    # reuse: exact continuation skips the shared-prefix prefill
    info2 = ctx.generate(prompt + want + [7],
                         GenParams(max_tokens=2, temperature=0.0))
    assert info2["stats"]["cached_tokens"] == len(prompt) + len(want)
    ctx.stop()


def test_jamba_context_full_finishes(tmp_path):
    """Hybrid memory cannot context-shift: overflow ends the generation."""
    from tpullm.utils.synth import build_jamba_gguf

    path = str(tmp_path / "j2.gguf")
    build_jamba_gguf(path, vocab_size=96, n_embd=32, n_layer=4,
                     n_head=4, n_head_kv=2, n_ff=64)
    cfg, params, _ = load_model(path)
    ctx = ServerContext(cfg, params, None, n_slots=1, max_seq_len=48,
                        decode_chunk=4, prefill_chunk=8,
                        compute_dtype=jnp.float32)
    ctx.start()
    info = ctx.generate([1, 2, 3, 4, 5, 6],
                        GenParams(max_tokens=64, temperature=0.0))
    # finished by context, not by max_tokens
    assert info["stats"]["completion_tokens"] < 64
    assert info["reason"] == "length"
    ctx.stop()


def test_t5_server_matches_engine(tmp_path):
    """Enc-dec serving: the server's t5 loop must reproduce T5Engine's
    greedy decode (the llama_encode + llama_decode flow)."""
    import tpullm.models.t5 as T
    from tpullm.utils.synth import build_t5_gguf

    path = str(tmp_path / "t5.gguf")
    build_t5_gguf(path, seed=7)
    cfg, params, _ = load_model(path)
    assert model_family(cfg) == "t5"

    prompt = [4, 9, 3, 17, 6]
    eng = T.T5Engine(cfg, params, max_seq_len=32)
    want = eng.generate(prompt, max_new_tokens=8)

    ctx = ServerContext(cfg, params, None, n_slots=1, max_seq_len=32,
                        compute_dtype=jnp.float32)
    assert ctx.family == "t5"
    ctx.start()
    info = ctx.generate(prompt, GenParams(max_tokens=8, temperature=0.0,
                                          ignore_eos=True))
    assert info["tokens"][: len(want)] == want, (info["tokens"], want)
    assert info["stats"]["prompt_tokens"] == len(prompt)
    ctx.stop()


def test_t5_server_streaming(tmp_path):
    from tpullm.server.context import Task
    from tpullm.utils.synth import build_t5_gguf

    path = str(tmp_path / "t5s.gguf")
    build_t5_gguf(path, seed=7)
    cfg, params, _ = load_model(path)
    ctx = ServerContext(cfg, params, None, n_slots=1, max_seq_len=32,
                        compute_dtype=jnp.float32)
    ctx.start()
    task = Task(tokens=[4, 9, 3], params=GenParams(
        max_tokens=5, temperature=0.0, stream=True, ignore_eos=True))
    ctx.submit(task)
    kinds = [k for k, _ in task.events()]
    assert kinds[-1] == "done" and "delta" in kinds
    ctx.stop()


def test_t5_concurrent_slots_match_sequential(tmp_path):
    """Slot-parallel enc-dec decoding: concurrent tasks with different
    prompt lengths produce exactly the single-task greedy outputs."""
    import tpullm.models.t5 as T
    from tpullm.server.context import Task
    from tpullm.utils.synth import build_t5_gguf

    path = str(tmp_path / "t5c.gguf")
    build_t5_gguf(path, seed=9)
    cfg, params, _ = load_model(path)
    prompts = [[4, 9, 3], [17, 6, 2, 11, 5, 8], [1, 2]]
    eng = T.T5Engine(cfg, params, max_seq_len=32)
    want = [eng.generate(p, max_new_tokens=6) for p in prompts]

    ctx = ServerContext(cfg, params, None, n_slots=3, max_seq_len=32,
                        compute_dtype=jnp.float32)
    ctx.start()
    try:
        # submit ALL before draining any: the three tasks decode together
        tasks = [ctx.submit(Task(tokens=list(p),
                                 params=GenParams(max_tokens=6,
                                                  temperature=0.0,
                                                  ignore_eos=True)))
                 for p in prompts]
        got = [None] * len(tasks)
        for ti, t in enumerate(tasks):
            for kind, payload in t.events():
                if kind == "done":
                    got[ti] = payload["tokens"]
    finally:
        ctx.stop()
    for g, w in zip(got, want):
        assert g is not None and g[: len(w)] == w, (g, w)
