"""deci (nemotron-NAS) and openelm: per-layer-shape attention archs routed
through the hybrid group walker with shape-derived head counts.

deci (src/models/deci.cpp): per-layer (n_head, n_head_kv, n_ff) with
attention-free, "linear attention" (norm->wo), and FFN-free layer kinds.
openelm (src/models/openelm.cpp): per-layer head counts, fused QKV,
shared per-head-dim q/k norms, tied embeddings.

Strongest check: greedy-decode differential vs the reference engine."""
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

REF_BIN = "/tmp/refbuild/bin"

from tpullm.models.family import model_family
from tpullm.models.hybrid import HybridState, attn_layer_ids, forward, is_hybrid
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_deci_gguf, build_openelm_gguf

CASES = ["deci", "openelm"]


@pytest.fixture(scope="module", params=CASES)
def model(request, tmp_path_factory):
    arch = request.param
    path = str(tmp_path_factory.mktemp("d") / f"{arch}.gguf")
    if arch == "deci":
        build_deci_gguf(path, seed=3)
    else:
        build_openelm_gguf(path, seed=3)
    return arch, path, load_model(path, fuse=False)


def test_routing_and_banks(model):
    arch, path, (cfg, params, g) = model
    assert cfg.hybrid_graph and is_hybrid(cfg)
    assert model_family(cfg) == "hybrid"
    if arch == "deci":
        assert cfg.head_pattern == (4, 4, 0, 4)
        assert attn_layer_ids(cfg) == [0, 3]  # kv>0 only
    else:
        assert cfg.head_pattern == (2, 4, 4)
        assert attn_layer_ids(cfg) == [0, 1, 2]
    st = HybridState.create(cfg, 1, 32, jnp.float32)
    assert st.k.shape[0] == len(attn_layer_ids(cfg))


def _full(cfg, params, toks, S=32):
    st = HybridState.create(cfg, 1, S, jnp.float32)
    lg, st = forward(params, cfg, toks, jnp.arange(toks.shape[1])[None],
                     st, 0, jnp.zeros(1, jnp.int32), dtype=jnp.float32)
    return lg, st


def test_incremental_equals_full(model):
    arch, path, (cfg, params, g) = model
    toks = jnp.asarray([[5, 9, 40, 33, 12, 7]], jnp.int32)
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
