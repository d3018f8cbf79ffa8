"""Runtime LoRA: adapter GGUF load + apply == dense weight folding."""
import numpy as np
import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.gguf.writer import GGUFWriter
from tpullm.models.llama import KVCache, forward
from tpullm.ops.qtensor import QTensor
from tpullm.runtime.loader import load_model
from tpullm.runtime.lora import apply_lora_to_params, load_lora
from tpullm.utils.synth import build_llama_gguf


def _write_adapter(path, n_layer, n_embd, n_head_q, r, rng, alpha=16.0):
    w = GGUFWriter(path, arch="llama")
    w.add_string("general.type", "adapter")
    w.add_string("adapter.type", "lora")
    w.add_float32("adapter.lora.alpha", alpha)
    tensors = {}
    for l in range(n_layer):
        a = (rng.standard_normal((r, n_embd)) * 0.05).astype(np.float32)
        b = (rng.standard_normal((n_head_q, r)) * 0.05).astype(np.float32)
        w.add_tensor(f"blk.{l}.attn_q.weight.lora_a", a)
        w.add_tensor(f"blk.{l}.attn_q.weight.lora_b", b)
        tensors[l] = (a, b)
    w.write()
    return tensors


def test_lora_apply_equals_folding(tmp_path):
    rng = np.random.default_rng(0)
    base = str(tmp_path / "base.gguf")
    n_embd, n_layer = 256, 2
    build_llama_gguf(base, vocab_size=128, n_embd=n_embd, n_layer=n_layer,
                     n_head=4, n_head_kv=2, n_ff=256, qtype=GGMLType.Q8_0)
    cfg, params, _ = load_model(base, fuse=False)

    r, alpha, scale = 4, 16.0, 1.0
    ad = str(tmp_path / "adapter.gguf")
    tensors = _write_adapter(ad, n_layer, n_embd, n_embd, r, rng, alpha)

    lora, meta = load_lora(ad, n_layer, scale)
    assert meta["rank"] == r and meta["alpha"] == alpha
    lp = apply_lora_to_params(params, lora, meta)

    tokens = jnp.asarray([[3, 9, 27]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)

    def run(p):
        cache = KVCache.create(cfg, 1, 8)
        logits, _ = forward(p, cfg, tokens, pos, cache, 0, vf)
        return np.asarray(logits)

    with_lora = run(lp)
    base_out = run(params)
    assert not np.allclose(with_lora, base_out, atol=1e-3)  # adapter bites

    # fold: W'q = Wq + (alpha/r)*B@A as dense f32 weights
    folded = dict(params)
    layers = dict(params["layers"])
    wq = layers["wq"]
    dense = []
    for l in range(n_layer):
        sub = QTensor(wq.qtype, wq.shape[1:], {k: v[l] for k, v in wq.data.items()})
        a, b = tensors[l]
        dense.append(np.asarray(sub.dequant(jnp.float32)) + (alpha / r) * (b @ a))
    layers["wq"] = QTensor(GGMLType.F32, (n_layer,) + wq.shape[1:],
                           {"w": jnp.asarray(np.stack(dense))})
    folded["layers"] = layers
    folded_out = run(folded)
    np.testing.assert_allclose(with_lora, folded_out, rtol=0.1, atol=0.15)
    err = np.abs(with_lora - folded_out).mean()
    assert err < 0.02, err


def test_control_vector(tmp_path):
    import numpy as np
    import jax.numpy as jnp

    from tpullm.gguf.writer import GGUFWriter
    from tpullm.runtime.lora import apply_control_vector, load_control_vector
    from tpullm.utils.synth import build_llama_gguf

    base = str(tmp_path / "b.gguf")
    build_llama_gguf(base, vocab_size=128, n_embd=128, n_layer=2, n_head=4,
                     n_head_kv=2, n_ff=128, qtype=GGMLType.Q8_0)
    cfg, params, _ = load_model(base)

    cv = str(tmp_path / "cv.gguf")
    w = GGUFWriter(cv, arch="controlvector")
    rng = np.random.default_rng(0)
    dirs_ref = rng.standard_normal((2, 128)).astype(np.float32) * 0.2
    for l in range(2):
        w.add_tensor(f"direction.{l + 1}", dirs_ref[l])
    w.write()

    dirs = load_control_vector(cv, cfg.n_layer)
    np.testing.assert_allclose(dirs, dirs_ref, rtol=1e-6)
    cp = apply_control_vector(params, dirs)

    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)

    def run(p):
        cache = KVCache.create(cfg, 1, 8)
        logits, _ = forward(p, cfg, tokens, pos, cache, 0, vf)
        return np.asarray(logits)

    out_cv = run(cp)
    out_base = run(params)
    assert not np.allclose(out_cv, out_base, atol=1e-3)
    # zero vector is a no-op
    zero = apply_control_vector(params, np.zeros_like(dirs_ref))
    np.testing.assert_allclose(run(zero), out_base, rtol=1e-4, atol=1e-4)


def test_export_lora_merges(tmp_path):
    """export_lora output == runtime-applied adapter (logit equality)."""
    rng = np.random.default_rng(1)
    base = str(tmp_path / "base.gguf")
    n_embd, n_layer = 256, 2
    build_llama_gguf(base, vocab_size=128, n_embd=n_embd, n_layer=n_layer,
                     n_head=4, n_head_kv=2, n_ff=256, qtype=GGMLType.F32)
    ad = str(tmp_path / "adapter.gguf")
    _write_adapter(ad, n_layer, n_embd, n_embd, 4, rng, alpha=8.0)

    from tpullm.tools.export_lora import merge

    merged = merge(base, [(ad, 1.0)], str(tmp_path / "merged.gguf"))
    cfg_m, params_m, _ = load_model(merged, fuse=False)
    cfg, params, _ = load_model(base, fuse=False)
    lora, meta = load_lora(ad, n_layer, 1.0)
    lp = apply_lora_to_params(params, lora, meta)

    tokens = jnp.asarray([[3, 9, 27]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)

    def run(c, p):
        cache = KVCache.create(c, 1, 8, jnp.float32)
        logits, _ = forward(p, c, tokens, pos, cache, 0, vf,
                            dtype=jnp.float32)
        return np.asarray(logits)

    np.testing.assert_allclose(run(cfg_m, params_m), run(cfg, lp),
                               rtol=2e-3, atol=2e-3)


def test_cvector_generator_roundtrip(tmp_path):
    """Generated control vector loads back and biases the residual."""
    base = str(tmp_path / "base.gguf")
    build_llama_gguf(base, vocab_size=256, n_embd=64, n_layer=3, n_head=4,
                     n_head_kv=2, n_ff=96, qtype=GGMLType.F32,
                     with_vocab=True)
    from tpullm.runtime.loader import load_model as lm
    from tpullm.tokenizer import Tokenizer
    from tpullm.gguf.reader import GGUFFile
    from tpullm.tools.cvector_generator import build_cvector, \
        write_cvector_gguf
    from tpullm.runtime.lora import load_control_vector, \
        apply_control_vector

    cfg, params, g = lm(base, fuse=False)
    tok = Tokenizer.from_gguf(g)
    dirs = build_cvector(cfg, params, tok,
                         ["abc good", "tok4 nice"],
                         ["abc bad", "tok4 awful"])
    assert dirs.shape == (cfg.n_layer, cfg.n_embd)
    assert np.abs(dirs[:-1]).sum() > 0  # non-final layers got directions
    assert np.abs(dirs[-1]).sum() == 0  # final layer skipped (reference)
    out = str(tmp_path / "cv.gguf")
    write_cvector_gguf(out, dirs)
    loaded = load_control_vector(out, cfg.n_layer)
    np.testing.assert_allclose(loaded[:-1], dirs[:-1], rtol=1e-6)
    cp = apply_control_vector(params, loaded, scale=2.0)
    tokens = jnp.asarray([[3, 9]], jnp.int32)
    pos = jnp.asarray([[0, 1]], jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)
    cache = KVCache.create(cfg, 1, 8, jnp.float32)
    a, _ = forward(cp, cfg, tokens, pos, cache, 0, vf, dtype=jnp.float32)
    cache = KVCache.create(cfg, 1, 8, jnp.float32)
    b, _ = forward(params, cfg, tokens, pos, cache, 0, vf,
                   dtype=jnp.float32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_server_lora_adapters_endpoint(tmp_path):
    """GET/POST /lora-adapters lists and re-scales adapters live."""
    import json
    import socket
    import urllib.request

    from tpullm.server.context import ServerContext
    from tpullm.server.http import serve
    from tpullm.tokenizer import Tokenizer

    rng = np.random.default_rng(2)
    base = str(tmp_path / "b.gguf")
    build_llama_gguf(base, vocab_size=512, n_embd=256, n_layer=2, n_head=4,
                     n_head_kv=2, n_ff=256, qtype=GGMLType.Q8_0,
                     with_vocab=True)
    ad = str(tmp_path / "a.gguf")
    _write_adapter(ad, 2, 256, 256, 4, rng)
    cfg, params, g = load_model(base)
    tok = Tokenizer.from_gguf(g)
    ctx = ServerContext(cfg, params, tok, n_slots=1, max_seq_len=128,
                        decode_chunk=4, lora=[(ad, 1.0)])
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = serve(ctx, "127.0.0.1", port, block=False)
    try:
        url = f"http://127.0.0.1:{port}"

        def post_completion():
            req = urllib.request.Request(
                url + "/v1/completions",
                json.dumps({"prompt": "tok1 tok2", "max_tokens": 4,
                            "temperature": 0}).encode(),
                {"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())["choices"][0]["text"]

        with urllib.request.urlopen(url + "/lora-adapters", timeout=30) as r:
            lst = json.loads(r.read())
        assert lst and lst[0]["scale"] == 1.0
        t1 = post_completion()
        req = urllib.request.Request(
            url + "/lora-adapters",
            json.dumps([{"id": 0, "scale": 8.0}]).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            lst = json.loads(r.read())
        assert lst[0]["scale"] == 8.0
        t2 = post_completion()
        # a big scale change must alter greedy output on a random model
        assert t1 != t2, (t1, t2)
    finally:
        srv.shutdown()
        ctx.stop()
