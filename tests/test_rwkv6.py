"""RWKV6 + rwkv6qwen2 family: forward/state invariants and greedy parity vs
the reference engine (mirrors tests/test_rwkv.py for RWKV7)."""
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from tpullm.models.rwkv import RwkvState, forward, is_rwkv
from tpullm.runtime.loader import load_model
from tpullm.tokenizer import Tokenizer
from tpullm.utils.synth import build_rwkv6_gguf

REF_BIN = "/tmp/refbuild/bin"


@pytest.fixture(scope="module", params=["rwkv6", "rwkv6qwen2"])
def rwkv6(request, tmp_path_factory):
    arch = request.param
    path = str(tmp_path_factory.mktemp("m") / f"{arch}.gguf")
    kw = dict(rescale_every=2) if arch == "rwkv6" else dict(n_head_kv=2)
    build_rwkv6_gguf(path, arch=arch, seed=11, **kw)
    return arch, path, load_model(path, fuse=False)


def _greedy(cfg, params, tok, prompt, n):
    ids = tok.encode(prompt, add_special=True)
    st = RwkvState.create(cfg, 1)
    out, cur = [], ids
    for _ in range(n):
        lg, st = forward(params, cfg, jnp.asarray([cur], jnp.int32), st,
                         dtype=jnp.float32)
        nxt = int(np.argmax(np.asarray(lg)[0, -1]))
        out.append(nxt)
        cur = [nxt]
    return out


def test_forward_and_state(rwkv6):
    arch, _, (cfg, params, g) = rwkv6
    assert is_rwkv(cfg) and cfg.wkv_head_size == 16
    assert cfg.arch == arch
    st = RwkvState.create(cfg, 1)
    lg, st2 = forward(params, cfg, jnp.asarray([[3, 9, 4]], jnp.int32), st,
                      dtype=jnp.float32)
    assert np.isfinite(np.asarray(lg)).all()
    assert float(jnp.abs(st2.wkv).sum()) > 0


def test_incremental_equals_full(rwkv6):
    arch, _, (cfg, params, g) = rwkv6
    seq = [3, 9, 4, 17, 6, 2]
    st = RwkvState.create(cfg, 1)
    full, _ = forward(params, cfg, jnp.asarray([seq], jnp.int32), st,
                      dtype=jnp.float32)
    st = RwkvState.create(cfg, 1)
    for i, t in enumerate(seq):
        lg, st = forward(params, cfg, jnp.asarray([[t]], jnp.int32), st,
                         dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(lg)[0, 0],
                                   np.asarray(full)[0, i],
                                   rtol=2e-4, atol=2e-4)


def test_right_pad_state_stops(rwkv6):
    arch, _, (cfg, params, g) = rwkv6
    seq = [5, 8, 2]
    st = RwkvState.create(cfg, 1)
    _, st_a = forward(params, cfg, jnp.asarray([seq], jnp.int32), st,
                      dtype=jnp.float32)
    st = RwkvState.create(cfg, 1)
    _, st_b = forward(params, cfg, jnp.asarray([seq + [0, 0]], jnp.int32), st,
                      dtype=jnp.float32, n_valid=jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(st_a.wkv), np.asarray(st_b.wkv),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_a.shift), np.asarray(st_b.shift),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-completion")),
    reason=f"no reference build at {REF_BIN}")
def test_reference_greedy_parity(rwkv6):
    arch, path, (cfg, params, g) = rwkv6
    tok = Tokenizer.from_gguf(g)
    prompt, n = "abc tok4", 8
    out = subprocess.run(
        [os.path.join(REF_BIN, "llama-completion"), "-m", path, "-p", prompt,
         "-n", str(n), "--temp", "0", "--no-warmup", "-t", "1"],
        capture_output=True, text=True, timeout=300, stdin=subprocess.DEVNULL)
    assert out.returncode == 0, out.stderr[-1500:]
    ref_cont = out.stdout.split(prompt, 1)[-1].strip("\n")
    ours = tok.decode(_greedy(cfg, params, tok, prompt, n))
    assert ours.strip() == ref_cont.strip() or \
        len(os.path.commonprefix([ours.strip(), ref_cont.strip()])) >= \
        0.8 * len(ref_cont.strip()), (arch, ours, ref_cont)
