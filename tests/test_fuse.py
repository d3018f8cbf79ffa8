"""Fused QKV/gate-up weights: forward equivalence vs unfused."""
import numpy as np
import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.models.llama import KVCache, forward
from tpullm.ops.fuse import concat_kmajor, fuse_layer_weights, fused_offsets, pad256
from tpullm.ops.qtensor import qtensor_from_float
from tpullm.ops.qmm import qmm
from tpullm.utils.synth import synth_qparams


def test_concat_kmajor_matmul():
    rng = np.random.default_rng(0)
    K = 512
    sizes = [256, 300, 128]
    qts, denses = [], []
    for i, n in enumerate(sizes):
        w = (rng.standard_normal((n, K)) * 0.02).astype(np.float32)
        qt = qtensor_from_float(w, GGMLType.Q4_K, device_put=False, layout="kmajor")
        qts.append(qt)
        denses.append(np.asarray(qt.dequant(jnp.float32)))
    fused = concat_kmajor(qts)
    x = jnp.asarray(rng.standard_normal((3, K)), jnp.bfloat16)
    y = np.asarray(qmm(x, fused, jnp.float32, interpret=True))
    offs = fused_offsets(sizes)
    for i, n in enumerate(sizes):
        got = y[:, offs[i]: offs[i] + n]
        ref = np.asarray(x, np.float32) @ denses[i].T
        nmse = ((got - ref) ** 2).mean() / (ref**2).mean()
        assert nmse < 5e-5, f"part {i}"


def test_forward_fused_equals_unfused():
    cfg, params = synth_qparams(
        vocab_size=256, n_embd=512, n_layer=2, n_head=4, n_head_kv=2,
        n_ff=512, qtype=GGMLType.Q4_K, seed=1,
    )
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    positions = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)

    def run(p):
        cache = KVCache.create(cfg, 1, 16)
        logits, _ = forward(p, cfg, tokens, positions, cache, 0, vf)
        return np.asarray(logits)

    base = run(params)
    fused = dict(params)
    fused["layers"] = fuse_layer_weights(params["layers"])
    assert "wqkv" in fused["layers"] and "ffn_gateup" in fused["layers"]
    got = run(fused)
    np.testing.assert_allclose(got, base, rtol=2e-2, atol=2e-2)
    # tight agreement in practice (same dequant math, same dot order per part)
    assert float(np.abs(got - base).mean()) < 1e-3
