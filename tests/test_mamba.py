"""Mamba-1: forward parity vs a numpy oracle of the reference scan math
(ggml_compute_forward_ssm_scan_f32), state continuity, prefill==decode."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpullm.gguf.constants import GGMLType
from tpullm.models.mamba import RecurrentState, forward, is_recurrent
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_mamba_gguf


def _softplus(x):
    return np.log1p(np.exp(x))


def _np_mamba(W, cfg, tokens, conv0=None, ssm0=None):
    """Sequential oracle; returns (logits, conv_tails, ssm_states)."""
    n_layer, D = cfg.n_layer, cfg.n_embd
    Di, Ds, dc, dtr = (cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_d_conv,
                       cfg.ssm_dt_rank)
    T = len(tokens)
    x = W["token_embd.weight"][tokens]  # (T, D)
    conv = (np.zeros((n_layer, Di, dc - 1), np.float32) if conv0 is None
            else conv0.copy())
    ssm = (np.zeros((n_layer, Di, Ds), np.float32) if ssm0 is None
           else ssm0.copy())

    def rms(v, w, eps=1e-5):
        return v / np.sqrt((v**2).mean(-1, keepdims=True) + eps) * w

    for l in range(n_layer):
        p = f"blk.{l}."
        h = rms(x, W[p + "attn_norm.weight"])
        xz = h @ W[p + "ssm_in.weight"].T  # (T, 2*Di)
        xs, z = xz[:, :Di], xz[:, Di:]
        # causal depthwise conv over [conv_state, xs]
        wconv = W[p + "ssm_conv1d.weight"]  # (Di, dc)
        xt = np.concatenate([conv[l].T, xs], axis=0)  # (dc-1+T, Di)
        y = np.zeros_like(xs)
        for t in range(T):
            y[t] = (xt[t:t + dc] * wconv.T).sum(0)
        conv[l] = xt[T:].T
        xs = y + W[p + "ssm_conv1d.bias"]
        xs = xs / (1 + np.exp(-xs))  # silu
        x_db = xs @ W[p + "ssm_x.weight"].T
        dt, B, C = (x_db[:, :dtr], x_db[:, dtr:dtr + Ds], x_db[:, dtr + Ds:])
        dt = dt @ W[p + "ssm_dt.weight"].T + W[p + "ssm_dt.bias"]
        A = W[p + "ssm_a"]  # (Di, Ds)
        yout = np.zeros((T, Di), np.float32)
        s = ssm[l]
        for t in range(T):
            dt_sp = _softplus(dt[t])  # (Di,)
            dA = np.exp(dt_sp[:, None] * A)  # (Di, Ds)
            s = s * dA + B[t][None, :] * (xs[t] * dt_sp)[:, None]
            yout[t] = (s * C[t][None, :]).sum(-1)
        ssm[l] = s
        yout = yout + xs * W[p + "ssm_d"]
        yout = yout * (z / (1 + np.exp(-z)))
        x = x + yout @ W[p + "ssm_out.weight"].T
    x = rms(x, W["output_norm.weight"])
    logits = x @ W["token_embd.weight"].T  # tied lm_head
    return logits, conv, ssm


@pytest.fixture(scope="module")
def mamba_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mamba") / "m.gguf")
    W = {}
    build_mamba_gguf(path, vocab_size=128, n_embd=64, n_layer=2, scale=0.2,
                     weight_cb=lambda n, a: W.__setitem__(n, a.copy()))
    cfg, params, _ = load_model(path)
    return cfg, params, W


def test_mamba_config(mamba_model):
    cfg, _, _ = mamba_model
    assert cfg.arch == "mamba" and is_recurrent(cfg)
    assert cfg.ssm_d_inner == 128 and cfg.ssm_d_state == 16
    assert cfg.ssm_d_conv == 4 and cfg.ssm_dt_rank == 4


def test_mamba_forward_matches_numpy(mamba_model):
    cfg, params, W = mamba_model
    toks = np.array([3, 17, 42, 9, 77, 5], np.int32)
    ref_logits, ref_conv, ref_ssm = _np_mamba(W, cfg, toks)
    st = RecurrentState.create(cfg, 1)
    logits, new_st = forward(params, cfg, jnp.asarray(toks[None]), st,
                             dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits[0]), ref_logits,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_st.conv[:, 0]), ref_conv,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_st.ssm[:, 0]), ref_ssm,
                               rtol=2e-4, atol=2e-4)


def test_mamba_prefill_equals_stepwise(mamba_model):
    """One T=6 pass == six T=1 passes threading the state (the associative
    scan and the sequential recurrence are the same map)."""
    cfg, params, _ = mamba_model
    toks = np.array([3, 17, 42, 9, 77, 5], np.int32)
    st = RecurrentState.create(cfg, 1)
    full_logits, full_st = forward(params, cfg, jnp.asarray(toks[None]), st,
                                   dtype=jnp.float32)
    st = RecurrentState.create(cfg, 1)
    outs = []
    for t in toks:
        lg, st = forward(params, cfg, jnp.asarray([[t]], jnp.int32), st,
                         dtype=jnp.float32)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full_logits[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st.ssm), np.asarray(full_st.ssm),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st.conv), np.asarray(full_st.conv),
                               rtol=2e-4, atol=2e-4)


def test_mamba_state_continuation(mamba_model):
    """Splitting a sequence across two forward calls == one call."""
    cfg, params, _ = mamba_model
    toks = np.array([3, 17, 42, 9, 77, 5, 23, 61], np.int32)
    st = RecurrentState.create(cfg, 1)
    full, _ = forward(params, cfg, jnp.asarray(toks[None]), st, jnp.float32)
    st = RecurrentState.create(cfg, 1)
    _, st = forward(params, cfg, jnp.asarray(toks[None, :5]), st, jnp.float32)
    part2, _ = forward(params, cfg, jnp.asarray(toks[None, 5:]), st, jnp.float32)
    np.testing.assert_allclose(np.asarray(part2[0]), np.asarray(full[0, 5:]),
                               rtol=2e-4, atol=2e-4)


def test_mamba_falcon_rms_variant(tmp_path):
    path = str(tmp_path / "fm.gguf")
    W = {}
    build_mamba_gguf(path, vocab_size=64, n_embd=32, n_layer=1, scale=0.2,
                     dt_b_c_rms=True,
                     weight_cb=lambda n, a: W.__setitem__(n, a.copy()))
    cfg, params, _ = load_model(path)
    assert cfg.ssm_dt_b_c_rms
    st = RecurrentState.create(cfg, 1)
    toks = jnp.asarray([[1, 5, 9]], jnp.int32)
    logits, _ = forward(params, cfg, toks, st, jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
    # differs from the non-normalized math
    build_mamba_gguf(str(tmp_path / "nm.gguf"), vocab_size=64, n_embd=32,
                     n_layer=1, scale=0.2)
    cfg2, params2, _ = load_model(str(tmp_path / "nm.gguf"))
    logits2, _ = forward(params2, cfg2, toks, RecurrentState.create(cfg2, 1),
                         jnp.float32)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2), atol=1e-4)


def test_mamba_quantized_runs(tmp_path):
    path = str(tmp_path / "mq.gguf")
    build_mamba_gguf(path, vocab_size=128, n_embd=128, n_layer=2,
                     qtype=GGMLType.Q8_0, scale=0.1)
    cfg, params, _ = load_model(path)
    st = RecurrentState.create(cfg, 2)
    toks = jnp.asarray([[1, 5, 9, 2], [7, 3, 8, 4]], jnp.int32)
    logits, st = forward(params, cfg, toks, st)
    assert logits.shape == (2, 4, 128)
    assert np.isfinite(np.asarray(logits)).all()


def test_mamba_left_padding(mamba_model):
    """A left-padded row must match the unpadded run exactly."""
    cfg, params, _ = mamba_model
    toks = np.array([3, 17, 42, 9], np.int32)
    st = RecurrentState.create(cfg, 1)
    ref, ref_st = forward(params, cfg, jnp.asarray(toks[None]), st,
                          jnp.float32)
    padded = np.concatenate([np.zeros(3, np.int32), toks])
    st = RecurrentState.create(cfg, 1)
    out, out_st = forward(params, cfg, jnp.asarray(padded[None]), st,
                          jnp.float32, valid_from=jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(out[0, 3:]), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_st.ssm), np.asarray(ref_st.ssm),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_st.conv), np.asarray(ref_st.conv),
                               rtol=2e-4, atol=2e-4)


def test_mamba_recurrent_engine(mamba_model):
    """Engine chunked decode == manual stepwise greedy decode."""
    import jax

    from tpullm.runtime.recurrent import RecurrentEngine

    cfg, params, _ = mamba_model
    eng = RecurrentEngine(cfg, params, compute_dtype=jnp.float32,
                          decode_chunk=4)
    prompts = [[3, 17, 42], [9, 77, 5, 23, 61]]
    r = eng.generate(prompts, max_new_tokens=8)
    assert len(r.tokens) == 2 and all(len(t) == 8 for t in r.tokens)

    # oracle: thread state manually, greedy
    for b, prompt in enumerate(prompts):
        st = RecurrentState.create(cfg, 1)
        lg, st = forward(params, cfg, jnp.asarray([prompt], jnp.int32), st,
                         jnp.float32)
        toks = []
        t = int(np.argmax(np.asarray(lg[0, -1])))
        toks.append(t)
        for _ in range(7):
            lg, st = forward(params, cfg, jnp.asarray([[t]], jnp.int32), st,
                             jnp.float32)
            t = int(np.argmax(np.asarray(lg[0, -1])))
            toks.append(t)
        assert toks == r.tokens[b], (b, toks, r.tokens[b])


def test_mamba_right_padding(mamba_model):
    """Right-padded rows (server prefill buckets) match unpadded, including
    the conv tail; an n_valid=0 row passes its state through untouched."""
    cfg, params, _ = mamba_model
    toks = np.array([3, 17, 42, 9], np.int32)
    st = RecurrentState.create(cfg, 1)
    ref, ref_st = forward(params, cfg, jnp.asarray(toks[None]), st,
                          jnp.float32)
    padded = np.concatenate([toks, np.zeros(4, np.int32)])
    st = RecurrentState.create(cfg, 1)
    out, out_st = forward(params, cfg, jnp.asarray(padded[None]), st,
                          jnp.float32, n_valid=jnp.asarray([4]))
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_st.conv), np.asarray(ref_st.conv),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_st.ssm), np.asarray(ref_st.ssm),
                               rtol=2e-4, atol=2e-4)
    # n_valid=0: state identity
    _, same_st = forward(params, cfg, jnp.asarray(padded[None]), ref_st,
                         jnp.float32, n_valid=jnp.asarray([0]))
    np.testing.assert_allclose(np.asarray(same_st.conv),
                               np.asarray(ref_st.conv), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(same_st.ssm),
                               np.asarray(ref_st.ssm), rtol=1e-6, atol=1e-7)


def test_mamba_server_e2e(tmp_path):
    """Full HTTP serving path on a recurrent model: completion, streaming
    continuation reuse, embeddings, slot save/restore."""
    import json
    import socket
    import urllib.request

    from tpullm.server.context import ServerContext
    from tpullm.server.http import serve
    from tpullm.tokenizer import Tokenizer

    path = str(tmp_path / "srv.gguf")
    build_mamba_gguf(path, vocab_size=512, n_embd=64, n_layer=2, scale=0.1,
                     with_vocab=True)
    cfg, params, g = load_model(path)
    tok = Tokenizer.from_gguf(g)
    ctx = ServerContext(cfg, params, tok, n_slots=2, max_seq_len=256,
                        decode_chunk=4, prefill_chunk=32, model_name="mamba")
    assert ctx.recurrent
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = serve(ctx, "127.0.0.1", port, block=False)
    try:
        def post(p, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{p}", json.dumps(body).encode(),
                {"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=180) as r:
                return json.loads(r.read())

        r = post("/v1/completions", {"prompt": "ab cd", "max_tokens": 8,
                                     "temperature": 0})
        assert r["usage"]["completion_tokens"] == 8
        text1 = r["choices"][0]["text"]

        # deterministic: same request same output
        r2 = post("/v1/completions", {"prompt": "ab cd", "max_tokens": 8,
                                      "temperature": 0})
        assert r2["choices"][0]["text"] == text1

        # continuation prompt reuses the running state (prefix_match)
        full = post("/v1/completions", {"prompt": "ab cd" + text1,
                                        "max_tokens": 4, "temperature": 0})
        assert full["usage"]["completion_tokens"] == 4

        emb = post("/v1/embeddings", {"input": ["ab cd"]})
        assert len(emb["data"][0]["embedding"]) == cfg.n_embd

        # logit_bias + sampling still work through the shared decode path
        rb = post("/v1/completions", {"prompt": "ab", "max_tokens": 4,
                                      "temperature": 0,
                                      "logit_bias": {"9": 100.0}})
        assert rb["choices"][0]["text"] == ctx.tok.decode([9] * 4)
    finally:
        srv.shutdown()
        ctx.stop()


def _np_mamba2(W, cfg, tokens):
    """Sequential Mamba-2 oracle (scalar per-head decay, grouped norm)."""
    Di, Ds, dc = cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_d_conv
    nh, G = cfg.ssm_dt_rank, cfg.ssm_n_group
    hd = Di // nh
    dxbc = Di + 2 * G * Ds
    T = len(tokens)
    x = W["token_embd.weight"][tokens]

    def rms(v, w, eps=1e-5):
        return v / np.sqrt((v**2).mean(-1, keepdims=True) + eps) * w

    for l in range(cfg.n_layer):
        p = f"blk.{l}."
        h = rms(x, W[p + "attn_norm.weight"])
        zxbcdt = h @ W[p + "ssm_in.weight"].T
        z, xbc, dt = (zxbcdt[:, :Di], zxbcdt[:, Di:Di + dxbc],
                      zxbcdt[:, Di + dxbc:])
        wconv = W[p + "ssm_conv1d.weight"]  # (dxbc, dc)
        xt = np.concatenate([np.zeros((dc - 1, dxbc), np.float32), xbc], 0)
        y = np.zeros_like(xbc)
        for t in range(T):
            y[t] = (xt[t:t + dc] * wconv.T).sum(0)
        xbc = y + W[p + "ssm_conv1d.bias"]
        xbc = xbc / (1 + np.exp(-xbc))
        xs = xbc[:, :Di]
        Bt = xbc[:, Di:Di + G * Ds].reshape(T, G, Ds)
        Ct = xbc[:, Di + G * Ds:].reshape(T, G, Ds)
        dt_sp = np.log1p(np.exp(dt + W[p + "ssm_dt.bias"]))  # (T,nh)
        A = W[p + "ssm_a"].reshape(-1)
        D = W[p + "ssm_d"].reshape(-1)
        s = np.zeros((nh, hd, Ds), np.float32)
        yout = np.zeros((T, Di), np.float32)
        for t in range(T):
            for hh in range(nh):
                g = hh // (nh // G)
                dA = np.exp(dt_sp[t, hh] * A[hh])
                xv = xs[t, hh * hd:(hh + 1) * hd] * dt_sp[t, hh]
                s[hh] = s[hh] * dA + xv[:, None] * Bt[t, g][None, :]
                yout[t, hh * hd:(hh + 1) * hd] = (s[hh] * Ct[t, g][None, :]).sum(-1)
        yout = yout + xs * np.repeat(D, hd)
        yout = yout * (z / (1 + np.exp(-z)))
        yg = yout.reshape(T, G, Di // G)
        wn = W[p + "ssm_norm.weight"]
        yg = yg / np.sqrt((yg**2).mean(-1, keepdims=True) + 1e-5) * wn[None]
        yout = yg.reshape(T, Di)
        x = x + yout @ W[p + "ssm_out.weight"].T
    x = rms(x, W["output_norm.weight"])
    return x @ W["token_embd.weight"].T


def test_mamba2_forward_matches_numpy(tmp_path):
    from tpullm.utils.synth import build_mamba2_gguf

    path = str(tmp_path / "m2.gguf")
    W = {}
    build_mamba2_gguf(path, vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                      n_group=2, scale=0.2,
                      weight_cb=lambda n, a: W.__setitem__(n, a.copy()))
    cfg, params, _ = load_model(path)
    assert cfg.arch == "mamba2" and cfg.ssm_n_group == 2
    toks = np.array([3, 17, 42, 9, 77], np.int32)
    ref = _np_mamba2(W, cfg, toks)
    st = RecurrentState.create(cfg, 1)
    logits, _ = forward(params, cfg, jnp.asarray(toks[None]), st, jnp.float32)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, rtol=3e-4, atol=3e-4)


def test_mamba2_prefill_equals_stepwise(tmp_path):
    from tpullm.utils.synth import build_mamba2_gguf

    path = str(tmp_path / "m2b.gguf")
    build_mamba2_gguf(path, vocab_size=64, n_embd=32, n_layer=1, n_head=4,
                      n_group=2, scale=0.2)
    cfg, params, _ = load_model(path)
    toks = np.array([3, 7, 12, 9], np.int32)
    st = RecurrentState.create(cfg, 1)
    full, full_st = forward(params, cfg, jnp.asarray(toks[None]), st,
                            jnp.float32)
    st = RecurrentState.create(cfg, 1)
    outs = []
    for t in toks:
        lg, st = forward(params, cfg, jnp.asarray([[t]], jnp.int32), st,
                         jnp.float32)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(st.ssm), np.asarray(full_st.ssm),
                               rtol=3e-4, atol=3e-4)


def test_mamba2_engine(tmp_path):
    from tpullm.runtime.recurrent import RecurrentEngine
    from tpullm.utils.synth import build_mamba2_gguf

    path = str(tmp_path / "m2c.gguf")
    build_mamba2_gguf(path, vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                      n_group=2, scale=0.1)
    cfg, params, _ = load_model(path)
    eng = RecurrentEngine(cfg, params, compute_dtype=jnp.float32,
                          decode_chunk=4)
    r = eng.generate([[3, 17, 42]], max_new_tokens=8)
    assert len(r.tokens[0]) == 8
    assert all(0 <= t < 128 for t in r.tokens[0])
