"""Router mode: child server process + proxying (server-models.cpp analogue).

Spawns ONE real child (slow: JAX startup per process), so a single test
covers load/list/proxy/unload.
"""
import json
import socket
import time
import urllib.request

from tpullm.gguf.constants import GGMLType
from tpullm.utils.synth import build_llama_gguf


def test_router_end_to_end(tmp_path):
    from tpullm.server.router import serve_router

    p = str(tmp_path / "a.gguf")
    build_llama_gguf(p, vocab_size=256, n_embd=128, n_layer=1, n_head=4,
                     n_head_kv=2, n_ff=128, qtype=GGMLType.Q4_0, with_vocab=True)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv, router = serve_router({"modelA": p}, port=port, block=False,
                               extra_args=["-c", "128", "-np", "1"])
    url = f"http://127.0.0.1:{port}"
    try:
        # child startup = jax import + model load: generous retry loop so a
        # loaded single-core host (concurrent benches) can't flake this
        deadline = time.time() + 180
        h = None
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(url + "/health", timeout=30) as r:
                    h = json.loads(r.read())
                break
            except Exception:
                time.sleep(2)
        assert h is not None, "router never became healthy"
        assert h["models"] == ["modelA"]
        with urllib.request.urlopen(url + "/v1/models", timeout=30) as r:
            models = json.loads(r.read())
        assert models["data"][0]["id"] == "modelA"
        req = urllib.request.Request(
            url + "/v1/completions",
            json.dumps({"model": "modelA", "prompt": "tok1", "max_tokens": 2,
                        "temperature": 0}).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["object"] == "text_completion"
        req = urllib.request.Request(
            url + "/models/unload", json.dumps({"model": "modelA"}).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["unloaded"] is True
    finally:
        srv.shutdown()
        router.shutdown()
