"""Serving-core concurrency stress (test-thread-safety.cpp analogue).

The threaded queue/slot loop (server/context.py) plus handler threads share
slot state through the control queue; this hammers every mutating surface
concurrently — completions (stream + non-stream), slot save/erase/restore,
whole-context state ops, metrics/slots reads — and requires that nothing
ever 500s (409 slot-busy is the designed answer under contention) and the
server still serves correctly afterwards.
"""
import json
import socket
import threading
import urllib.error
import urllib.request

import pytest
import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.runtime.loader import load_model
from tpullm.server.context import ServerContext
from tpullm.server.http import serve
from tpullm.tokenizer import Tokenizer
from tpullm.utils.synth import build_llama_gguf


@pytest.fixture(scope="module")
def stress_server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    build_llama_gguf(path, vocab_size=256, n_embd=64, n_layer=2, n_head=4,
                     n_head_kv=2, n_ff=96, qtype=GGMLType.Q8_0,
                     with_vocab=True)
    cfg, params, g = load_model(path)
    tok = Tokenizer.from_gguf(g)
    ctx = ServerContext(cfg, params, tok, n_slots=2, max_seq_len=128,
                        decode_chunk=4, prefill_chunk=32, model_name="tiny",
                        slot_save_path=str(tmp_path_factory.mktemp("slots")))
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = serve(ctx, "127.0.0.1", port, block=False)
    yield ctx, f"http://127.0.0.1:{port}"
    srv.shutdown()
    ctx.stop()


def test_concurrent_mixed_load(stress_server):
    ctx, url = stress_server
    errors: list[str] = []
    done = threading.Event()

    def req(path, body=None, timeout=240):
        data = json.dumps(body).encode() if body is not None else None
        r = urllib.request.Request(
            url + path, data,
            {"Content-Type": "application/json"} if data else {})
        with urllib.request.urlopen(r, timeout=timeout) as resp:
            return resp.read()

    def worker_completion(i):
        for j in range(4):
            try:
                req("/v1/completions", {"prompt": f"tok{i} tok{j}",
                                        "max_tokens": 4, "temperature": 0})
            except urllib.error.HTTPError as e:
                errors.append(f"completion {e.code}")
            except Exception as e:
                errors.append(f"completion {type(e).__name__}")

    def worker_stream(i):
        for j in range(3):
            try:
                r = urllib.request.Request(
                    url + "/v1/completions",
                    json.dumps({"prompt": f"tok{i + j}", "max_tokens": 4,
                                "temperature": 0, "stream": True}).encode(),
                    {"Content-Type": "application/json"})
                with urllib.request.urlopen(r, timeout=240) as resp:
                    for _ in resp:
                        pass
            except urllib.error.HTTPError as e:
                errors.append(f"stream {e.code}")
            except Exception as e:
                errors.append(f"stream {type(e).__name__}")

    def worker_slots():
        while not done.is_set():
            for action, body in (("save", {"filename": "s.npz"}),
                                 ("erase", {}),
                                 ("restore", {"filename": "s.npz"})):
                try:
                    req(f"/slots/0?action={action}", body, timeout=60)
                except urllib.error.HTTPError as e:
                    if e.code not in (400, 409):  # busy/missing-file are fine
                        errors.append(f"slot {action} {e.code}")
                except Exception as e:
                    errors.append(f"slot {type(e).__name__}")

    def worker_state():
        while not done.is_set():
            for action in ("save", "restore"):
                try:
                    req(f"/state?action={action}", {"filename": "c.npz"},
                        timeout=60)
                except urllib.error.HTTPError as e:
                    if e.code not in (400, 409):
                        errors.append(f"state {action} {e.code}")
                except Exception as e:
                    errors.append(f"state {type(e).__name__}")

    def worker_reads():
        while not done.is_set():
            try:
                req("/metrics" if threading.get_ident() % 2 else "/slots",
                    timeout=30)
            except Exception as e:
                errors.append(f"read {type(e).__name__}")

    threads = ([threading.Thread(target=worker_completion, args=(i,))
                for i in range(3)]
               + [threading.Thread(target=worker_stream, args=(i,))
                  for i in range(2)]
               + [threading.Thread(target=worker_slots),
                  threading.Thread(target=worker_state),
                  threading.Thread(target=worker_reads)])
    for t in threads:
        t.start()
    for t in threads[:5]:  # completion/stream workers bound the run
        t.join(timeout=500)
    done.set()
    for t in threads[5:]:
        t.join(timeout=60)
    assert not errors, errors[:10]

    # the loop must still serve correctly after the storm
    out = json.loads(req("/v1/completions", {"prompt": "tok1 tok2",
                                             "max_tokens": 4,
                                             "temperature": 0}))
    assert out["choices"][0]["finish_reason"] in ("length", "stop")
