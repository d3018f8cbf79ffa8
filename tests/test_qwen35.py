"""qwen35 / qwen35moe (src/models/qwen35.cpp, qwen35moe.cpp): the gated
delta-net hybrid with SEPARATE beta/alpha projections, TILED (not
interleaved) k-head repeat, M-RoPE'd gated full attention every 4th layer,
dense FFN or MoE + sigmoid-gated shared expert.

Strongest check: greedy-decode differential vs the reference engine."""
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

REF_BIN = "/tmp/refbuild/bin"

from tpullm.models.hybrid import HybridState, attn_layer_ids, forward, is_hybrid
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_qwen35_gguf

CASES = ["qwen35", "qwen35moe"]


@pytest.fixture(scope="module", params=CASES)
def model(request, tmp_path_factory):
    arch = request.param
    path = str(tmp_path_factory.mktemp("q") / f"{arch}.gguf")
    build_qwen35_gguf(path, moe=arch.endswith("moe"), seed=9)
    return arch, path, load_model(path, fuse=False)


def test_routing(model):
    arch, path, (cfg, params, g) = model
    assert is_hybrid(cfg)
    assert cfg.full_attn_interval == 4
    assert attn_layer_ids(cfg) == [3]  # every 4th layer full attention
    assert cfg.attn_out_gate and cfg.attn_qk_norm


def test_incremental_equals_full(model):
    arch, path, (cfg, params, g) = model
    toks = jnp.asarray([[5, 9, 40, 33, 12, 7]], jnp.int32)
    st = HybridState.create(cfg, 1, 32, jnp.float32)
    lg_full, _ = forward(params, cfg, toks,
                         jnp.arange(toks.shape[1])[None], st, 0,
                         jnp.zeros(1, jnp.int32), dtype=jnp.float32)
    st = HybridState.create(cfg, 1, 32, jnp.float32)
    outs = []
    for t in range(toks.shape[1]):
        lg, st = forward(params, cfg, toks[:, t:t + 1],
                         jnp.asarray([[t]], jnp.int32), st, t,
                         jnp.zeros(1, jnp.int32), dtype=jnp.float32)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(lg_full[0]),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-completion")),
    reason=f"no reference build at {REF_BIN}")
def test_reference_greedy_parity(model):
    arch, path, (cfg, params, g) = model
    from tpullm.tokenizer import Tokenizer

    tok = Tokenizer.from_gguf(g)
    prompt, n = "abc tok4", 6
    out = subprocess.run(
        [os.path.join(REF_BIN, "llama-completion"), "-m", path, "-p", prompt,
         "-n", str(n), "--temp", "0", "--no-warmup", "-t", "1"],
        capture_output=True, timeout=300, stdin=subprocess.DEVNULL)
    assert out.returncode == 0, out.stderr.decode(errors="replace")[-1500:]
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
        0.8 * len(ref_cont.strip()), (arch, ours, ref_cont)
