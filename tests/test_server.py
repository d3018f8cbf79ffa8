"""Server integration tests (the reference's pytest server suite analogue,
tools/server/tests/unit/test_*.py): a real HTTP server over a tiny synthetic
GGUF model, exercised with urllib — completions, chat, streaming, tokenize,
metrics, concurrent requests, prefix reuse."""
import json
import socket
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.runtime.loader import load_model
from tpullm.server.context import GenParams, ServerContext, Task
from tpullm.server.http import serve
from tpullm.tokenizer import Tokenizer
from tpullm.utils.synth import build_llama_gguf


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    build_llama_gguf(path, vocab_size=512, n_embd=128, n_layer=2, n_head=4,
                     n_head_kv=2, n_ff=256, qtype=GGMLType.Q4_0, with_vocab=True)
    cfg, params, g = load_model(path)
    tok = Tokenizer.from_gguf(g)
    ctx = ServerContext(cfg, params, tok, n_slots=2, max_seq_len=256,
                        decode_chunk=4, prefill_chunk=64, model_name="tiny",
                        slot_save_path=str(tmp_path_factory.mktemp("slots")))
    # pick a free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = serve(ctx, "127.0.0.1", port, block=False)
    yield ctx, f"http://127.0.0.1:{port}"
    srv.shutdown()
    ctx.stop()


def _post(url, path, body):
    req = urllib.request.Request(
        url + path, json.dumps(body).encode(), {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return r.read().decode()


def test_health_props_models(server):
    ctx, url = server
    assert json.loads(_get(url, "/health"))["status"] == "ok"
    props = json.loads(_get(url, "/props"))
    assert props["n_slots"] == 2 and props["n_ctx"] == 256
    models = json.loads(_get(url, "/v1/models"))
    assert models["data"][0]["id"] == "tiny"


def test_completion_basic(server):
    ctx, url = server
    r = _post(url, "/v1/completions", {
        "prompt": "tok1 tok2 tok3", "max_tokens": 8, "temperature": 0})
    assert r["object"] == "text_completion"
    assert r["usage"]["completion_tokens"] <= 8
    assert r["choices"][0]["finish_reason"] in ("length", "stop")


def test_completion_deterministic_greedy(server):
    ctx, url = server
    a = _post(url, "/v1/completions", {"prompt": "tok5 tok6", "max_tokens": 6,
                                       "temperature": 0})
    b = _post(url, "/v1/completions", {"prompt": "tok5 tok6", "max_tokens": 6,
                                       "temperature": 0})
    assert a["choices"][0]["text"] == b["choices"][0]["text"]


def test_chat_completion(server):
    ctx, url = server
    r = _post(url, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 4, "temperature": 0})
    assert r["object"] == "chat.completion"
    assert r["choices"][0]["message"]["role"] == "assistant"


def test_streaming(server):
    ctx, url = server
    req = urllib.request.Request(
        url + "/v1/completions",
        json.dumps({"prompt": "tok1", "max_tokens": 6, "temperature": 0,
                    "stream": True}).encode(),
        {"Content-Type": "application/json"})
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                chunks.append(line[6:])
    assert chunks[-1] == "[DONE]"
    parsed = [json.loads(c) for c in chunks[:-1]]
    finals = [p for p in parsed if p["choices"][0]["finish_reason"]]
    assert len(finals) == 1 and finals[0]["timings"]["completion_tokens"] <= 6


def test_tokenize_roundtrip(server):
    ctx, url = server
    r = _post(url, "/tokenize", {"content": "tok1 tok2"})
    assert isinstance(r["tokens"], list) and r["tokens"]
    d = _post(url, "/detokenize", {"tokens": r["tokens"]})
    assert "tok1" in d["content"]


def test_concurrent_requests(server):
    ctx, url = server
    results = {}

    def go(i):
        results[i] = _post(url, "/v1/completions", {
            "prompt": f"tok{i} tok{i+1}", "max_tokens": 5, "temperature": 0})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    [t.start() for t in threads]
    [t.join(timeout=300) for t in threads]
    assert len(results) == 4
    for r in results.values():
        assert r["choices"][0]["finish_reason"] in ("length", "stop")


def test_prefix_reuse(server):
    ctx, url = server
    p = "tok7 tok8 tok9 tok10 tok11 tok12"
    _post(url, "/v1/completions", {"prompt": p, "max_tokens": 3, "temperature": 0})
    r2 = _post(url, "/v1/completions", {"prompt": p, "max_tokens": 3, "temperature": 0})
    assert r2["timings"]["cached_tokens"] > 0


def test_stop_string(server):
    ctx, url = server
    r = _post(url, "/v1/completions", {
        "prompt": "tok1 tok2", "max_tokens": 32, "temperature": 0, "stop": ["tok"]})
    assert "tok" not in r["choices"][0]["text"]
    assert r["choices"][0]["finish_reason"] == "stop"


def test_metrics(server):
    ctx, url = server
    m = _get(url, "/metrics")
    assert "tpullm:requests_total" in m
    assert "# TYPE" in m


def test_embeddings(server):
    ctx, url = server
    r = _post(url, "/v1/embeddings", {"input": ["tok1 tok2", "tok3"]})
    assert len(r["data"]) == 2
    v0 = r["data"][0]["embedding"]
    assert len(v0) == ctx.cfg.n_embd
    assert all(isinstance(x, float) for x in v0[:4])
    # deterministic
    r2 = _post(url, "/v1/embeddings", {"input": ["tok1 tok2"]})
    np.testing.assert_allclose(r2["data"][0]["embedding"], v0, rtol=1e-5)


def test_slot_save_restore(server, tmp_path):
    ctx, url = server
    p = "tok5 tok6 tok7 tok8"
    _post(url, "/v1/completions", {"prompt": p, "max_tokens": 2, "temperature": 0})
    # find the slot that served it
    import json as _json
    slots = _json.loads(_get(url, "/slots"))
    sid = max(range(len(slots)), key=lambda i: slots[i]["n_past"])
    n_before = slots[sid]["n_past"]
    f = "slot.npz"  # plain basename inside the configured slot-save dir
    r = _post(url, f"/slots/{sid}?action=save", {"filename": f})
    assert r["n_saved"] == n_before
    _post(url, f"/slots/{sid}?action=erase", {})
    assert ctx.memory.slots[sid].n_past == 0
    r = _post(url, f"/slots/{sid}?action=restore", {"filename": f})
    assert r["n_restored"] == n_before
    assert ctx.memory.slots[sid].tokens[: len(p.split())]  # tokens back


def test_slot_save_rejects_traversal(server):
    """Path components in the filename must be rejected (the reference
    validates filenames against --slot-save-path the same way)."""
    _, url = server
    for bad in ("../evil.npz", "/tmp/abs.npz", "a/b.npz", ".hidden"):
        try:
            _post(url, "/slots/0?action=save", {"filename": bad})
            raise AssertionError(f"filename {bad!r} was accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 400


def test_left_recursive_grammar_rejected(server):
    """A left-recursive GBNF grammar must produce a 4xx error, not hang or
    crash the automaton (llama_grammar_detect_left_recursion parity)."""
    _, url = server
    try:
        _post(url, "/v1/completions", {
            "prompt": "x", "max_tokens": 2,
            "grammar": 'root ::= root "a" | "b"'})
        raise AssertionError("left-recursive grammar was accepted")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "recursion" in e.read().decode()


def test_anthropic_messages(server):
    ctx, url = server
    r = _post(url, "/v1/messages", {
        "model": "tiny", "max_tokens": 4,
        "system": "be brief",
        "messages": [{"role": "user", "content": "hi"}],
        "temperature": 0})
    assert r["type"] == "message" and r["role"] == "assistant"
    assert r["content"][0]["type"] == "text"
    assert r["usage"]["output_tokens"] <= 4
    ct = _post(url, "/v1/messages/count_tokens", {
        "messages": [{"role": "user", "content": "hi"}]})
    assert ct["input_tokens"] > 0


def test_openai_responses(server):
    ctx, url = server
    r = _post(url, "/v1/responses", {
        "input": "hello", "max_output_tokens": 4, "temperature": 0})
    assert r["object"] == "response" and r["status"] == "completed"
    assert r["output"][0]["content"][0]["type"] == "output_text"


def test_context_shift_long_generation(server):
    ctx, url = server
    # ctx is 256; force generation beyond it -> context shift keeps going
    r = _post(url, "/v1/completions", {
        "prompt": "tok1 tok2", "max_tokens": 300, "temperature": 0.9,
        "ignore_eos": True, "seed": 7})
    assert r["usage"]["completion_tokens"] >= 250
    assert ctx.metrics.get("context_shifts_total", 0) >= 1


def test_infill(server):
    ctx, url = server
    r = _post(url, "/infill", {
        "input_prefix": "tok1 ", "input_suffix": " tok9",
        "max_tokens": 4, "temperature": 0})
    assert "content" in r and r["tokens_predicted"] <= 4


def test_logprobs(server):
    ctx, url = server
    r = _post(url, "/v1/completions", {
        "prompt": "tok1 tok2", "max_tokens": 4, "temperature": 0, "n_probs": 4})
    lp = r["choices"][0]["logprobs"]
    assert lp is not None
    assert len(lp["token_logprobs"]) == r["usage"]["completion_tokens"]
    assert all(v <= 0 for v in lp["token_logprobs"])
    assert len(lp["top_logprobs"][0]) == 4
    # greedy: sampled token must be the top-1
    top0 = max(lp["top_logprobs"][0].items(), key=lambda kv: kv[1])
    assert abs(top0[1] - lp["token_logprobs"][0]) < 1e-3


def test_mirostat(server):
    ctx, url = server
    r = _post(url, "/v1/completions", {
        "prompt": "tok1 tok2", "max_tokens": 8, "mirostat": 2,
        "mirostat_tau": 4.0, "seed": 3})
    assert r["usage"]["completion_tokens"] >= 1
    assert r["choices"][0]["finish_reason"] in ("length", "stop")


def test_grammar_constrained_completion(server):
    ctx, url = server
    r = _post(url, "/v1/completions", {
        "prompt": "tok1", "max_tokens": 8, "temperature": 0,
        "grammar": 'root ::= [a-m]+'})
    text = r["choices"][0]["text"]
    assert text, r
    assert all("a" <= c <= "m" for c in text), text


def test_lazy_grammar_trigger(server):
    """grammar_lazy + grammar_triggers: generation is UNCONSTRAINED until a
    trigger word appears in the emitted text; the match suffix replays into
    the automaton and sampling constrains from then on (llama_grammar lazy /
    trigger_patterns, src/llama-grammar.h + common/sampling.cpp)."""
    ctx, url = server
    from tpullm.grammar import GrammarConstraint

    forced = int(ctx.tok.encode("tok7", add_special=False)[-1])
    piece = GrammarConstraint('root ::= "x"', ctx.tok.vocab).piece(forced)
    assert piece and not all("a" <= c <= "m" for c in piece)
    # grammar: exactly one decode chunk (4) of the trigger word, then [a-m]+.
    # A +100 logit bias forces the trigger token while unconstrained; once
    # the trigger replays, the grammar bans it (piece has chars outside a-m).
    lit = json.dumps(piece)
    gbnf = f"root ::= {lit} {lit} {lit} {lit} [a-m]+"
    r = _post(url, "/v1/completions", {
        "prompt": "tok1 tok2", "max_tokens": 12, "temperature": 0,
        "logit_bias": {str(forced): 100.0},
        "grammar": gbnf, "grammar_lazy": True,
        "grammar_triggers": [{"type": "word", "value": piece}]})
    text = r["choices"][0]["text"]
    assert text.startswith(piece * 4), text  # phase 1: bias wins (no grammar)
    tail = text[len(piece) * 4:]
    assert tail and all("a" <= c <= "m" for c in tail), text  # phase 2


def test_generate_sync_api(server):
    ctx, url = server
    toks = ctx.tok.encode("tok3 tok4", add_special=True)
    info = ctx.generate(toks, GenParams(max_tokens=4, temperature=0.0))
    assert info["stats"]["completion_tokens"] <= 4


def test_logit_bias(server):
    ctx, url = server
    # +100 bias on one token forces greedy decoding to emit it every step
    forced = ctx.tok.encode("tok7", add_special=False)[-1]
    expected = ctx.tok.decode([forced] * 4)
    r = _post(url, "/completion", {
        "prompt": "tok1 tok2", "n_predict": 4, "temperature": 0,
        "logit_bias": {str(int(forced)): 100.0}})
    assert r["choices"][0]["text"] == expected

    # llama.cpp list form: false bans the token even against a +100 bias
    r1 = _post(url, "/completion", {
        "prompt": "tok1 tok2", "n_predict": 4, "temperature": 0,
        "logit_bias": [[int(forced), 100.0], [int(forced), False]]})
    assert r1["choices"][0]["text"] != expected

    # a later request on the same slots must not inherit any bias
    r2 = _post(url, "/completion", {
        "prompt": "tok1 tok2", "n_predict": 4, "temperature": 0})
    assert r2["choices"][0]["text"] != expected
    r3 = _post(url, "/completion", {
        "prompt": "tok1 tok2", "n_predict": 4, "temperature": 0})
    assert r3["choices"][0]["text"] == r2["choices"][0]["text"]


def test_whole_context_state(server):
    """POST /state?action=save|restore round-trips ALL slots' caches +
    token prefixes (llama_state_save_file/load_file analogue)."""
    ctx, url = server
    p = "tok9 tok2 tok6"
    _post(url, "/v1/completions", {"prompt": p, "max_tokens": 2,
                                   "temperature": 0})
    toks_before = [list(s.tokens) for s in ctx.memory.slots]
    r = _post(url, "/state?action=save", {"filename": "ctx.npz"})
    assert r["saved"] is True
    for i in range(ctx.n_slots):
        _post(url, f"/slots/{i}?action=erase", {})
    assert all(s.n_past == 0 for s in ctx.memory.slots)
    r = _post(url, "/state?action=restore", {"filename": "ctx.npz"})
    assert r["restored"] is True
    assert [list(s.tokens) for s in ctx.memory.slots] == toks_before


def test_webui_served_at_root(server):
    ctx, url = server
    html = _get(url, "/")
    assert "<!doctype html" in html.lower()
    assert "/v1/chat/completions" in html  # the UI drives the chat API
