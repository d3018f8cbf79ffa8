"""PLaMo-2 hybrid (src/models/plamo2.cpp): per-head scalar-decay mamba
layers with dt/B/C norms + roped attention with per-head q/k norms, both
post-normed (sandwich), fused-swiglu FFN on every layer.

Strongest check: greedy-decode differential against the reference engine
on a shared synthetic checkpoint (llama-completion, CPU build)."""
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

REF_BIN = "/tmp/refbuild/bin"

from tpullm.models.hybrid import HybridState, attn_layer_ids, forward, is_hybrid
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_plamo2_gguf


@pytest.fixture(scope="module")
def plamo2(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("p2") / "plamo2.gguf")
    build_plamo2_gguf(path, pattern="mama", seed=7)
    return path, load_model(path, fuse=False)


def test_config_and_banks(plamo2):
    path, (cfg, params, g) = plamo2
    assert is_hybrid(cfg)
    assert cfg.post_norms and cfg.attn_qk_norm and cfg.hybrid_rope
    assert attn_layer_ids(cfg) == [1, 3]
    assert abs(cfg.attn_scale - 1 / np.sqrt(cfg.head_dim_v)) < 1e-9
    st = HybridState.create(cfg, 2, 32, jnp.float32)
    assert st.k.shape[0] == 2
    assert st.conv.shape[0] == 2  # 2 mamba layers


def _full(cfg, params, toks, S=32):
    st = HybridState.create(cfg, 1, S, jnp.float32)
    lg, st = forward(params, cfg, toks, jnp.arange(toks.shape[1])[None],
                     st, 0, jnp.zeros(1, jnp.int32), dtype=jnp.float32)
    return lg, st


def test_incremental_equals_full(plamo2):
    path, (cfg, params, g) = plamo2
    toks = jnp.asarray([[5, 9, 270, 266, 281, 300]], jnp.int32)
    lg_full, _ = _full(cfg, params, toks)
    st = HybridState.create(cfg, 1, 32, jnp.float32)
    outs = []
    for t in range(toks.shape[1]):
        lg, st = forward(params, cfg, toks[:, t:t + 1],
                         jnp.asarray([[t]], jnp.int32), st, t,
                         jnp.zeros(1, jnp.int32), dtype=jnp.float32)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(lg_full[0]),
                               rtol=2e-4, atol=2e-4)


def test_logits_finite(plamo2):
    path, (cfg, params, g) = plamo2
    lg, st = _full(cfg, params, jnp.asarray([[4, 270, 300]], jnp.int32))
    assert np.isfinite(np.asarray(lg)).all()
    assert float(jnp.abs(st.ssm).max()) > 0


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-completion")),
    reason=f"no reference build at {REF_BIN}")
def test_reference_greedy_parity(plamo2):
    path, (cfg, params, g) = plamo2
    from tpullm.tokenizer import Tokenizer

    tok = Tokenizer.from_gguf(g)
    prompt, n = "abc tok4", 6
    out = subprocess.run(
        [os.path.join(REF_BIN, "llama-completion"), "-m", path, "-p", prompt,
         "-n", str(n), "--temp", "0", "--no-warmup", "-t", "1"],
        capture_output=True, timeout=300, stdin=subprocess.DEVNULL)
    assert out.returncode == 0, out.stderr.decode(errors="replace")[-1500:]
    # byte-fallback tokens can emit invalid UTF-8: replace on both sides
    ref_cont = out.stdout.decode("utf-8", errors="replace").split(
        prompt, 1)[-1].strip("\n")
    ids = tok.encode(prompt, add_special=True)
    st = HybridState.create(cfg, 1, 64, jnp.float32)
    pos0, cur, toks_out = 0, ids, []
    for _ in range(n):
        lg, st = forward(params, cfg, jnp.asarray([cur], jnp.int32),
                         jnp.arange(pos0, pos0 + len(cur))[None], st, pos0,
                         jnp.zeros(1, jnp.int32), dtype=jnp.float32)
        nxt = int(np.argmax(np.asarray(lg)[0, -1]))
        toks_out.append(nxt)
        pos0 += len(cur)
        cur = [nxt]
    ours = tok.decode(toks_out)
    assert ours.strip() == ref_cont.strip() or \
        len(os.path.commonprefix([ours.strip(), ref_cont.strip()])) >= \
        0.8 * len(ref_cont.strip()), (ours, ref_cont)
