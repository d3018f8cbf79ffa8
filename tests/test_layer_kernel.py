"""Fused layer-block kernel vs the unfused XLA path (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpullm.gguf.constants import GGMLType
from tpullm.ops.fuse import fuse_layer_weights, pad256
from tpullm.ops.layer_kernel import ffn_block, supported
from tpullm.ops.qtensor import QTensor
from tpullm.utils.synth import synth_qparams


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q4_0])
def test_ffn_block_matches_unfused(qtype):
    cfg, params = synth_qparams(
        vocab_size=128, n_embd=512, n_layer=2, n_head=4, n_head_kv=2,
        n_ff=512, qtype=qtype, seed=3,
    )
    layers = fuse_layer_weights(params["layers"])
    qw = {k: v for k, v in layers.items() if isinstance(v, QTensor)}
    assert supported(cfg, qw)

    rng = np.random.default_rng(0)
    B, T, D = 1, 1, cfg.n_embd
    Hd = cfg.n_head * cfg.head_dim_v
    att = jnp.asarray(rng.standard_normal((B, T, Hd)) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, jnp.bfloat16)

    li = jnp.int32(1)
    got = np.asarray(
        ffn_block(att, x, layers["ffn_norm"][1], qw, li, cfg, interpret=True)
    ).astype(np.float32)

    # unfused reference with the same weights (layer 1)
    def sl(qt):
        return QTensor(qt.qtype, qt.shape[1:], {k: v[1] for k, v in qt.data.items()})

    wo = sl(qw["wo"]).dequant(jnp.float32)
    gu = sl(qw["ffn_gateup"]).dequant(jnp.float32)
    dn = sl(qw["ffn_down"]).dequant(jnp.float32)
    attf = np.asarray(att, np.float32).reshape(1, Hd)
    xf = np.asarray(x, np.float32).reshape(1, D)
    x2 = xf + attf @ np.asarray(wo).T[:, :D]
    nw = np.asarray(layers["ffn_norm"][1])
    h2 = x2 / np.sqrt((x2**2).mean(-1, keepdims=True) + cfg.rms_eps) * nw
    y = h2 @ np.asarray(gu).T
    g, u = y[:, : cfg.n_ff], y[:, pad256(cfg.n_ff): pad256(cfg.n_ff) + cfg.n_ff]
    hmid = g / (1 + np.exp(-g)) * u
    out = x2 + hmid @ np.asarray(dn).T[:, :D]

    nmse = ((got.reshape(1, D) - out) ** 2).mean() / (out**2).mean()
    assert nmse < 5e-4, nmse


def test_ffn_block_qkv_fold():
    """Folded variant: same x_out as ffn_block, and the emitted qkv equals
    rmsnorm(x_out, attn_norm[l+1]) @ wqkv[l+1]."""
    from tpullm.ops.layer_kernel import ffn_block_qkv
    from tpullm.ops.qmm import qmm

    cfg, params = synth_qparams(
        vocab_size=128, n_embd=512, n_layer=3, n_head=4, n_head_kv=2,
        n_ff=512, qtype=GGMLType.Q4_K, seed=11,
    )
    layers = fuse_layer_weights(params["layers"])
    qw = {k: v for k, v in layers.items() if isinstance(v, QTensor)}
    anrm = layers["attn_norm"]

    rng = np.random.default_rng(2)
    B, T, D = 1, 1, cfg.n_embd
    Hd = cfg.n_head * cfg.head_dim_v
    att = jnp.asarray(rng.standard_normal((B, T, Hd)) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, jnp.bfloat16)

    li = jnp.int32(1)
    from tpullm.ops.layer_kernel import ffn_block

    x_plain = np.asarray(
        ffn_block(att, x, layers["ffn_norm"][1], qw, li, cfg, interpret=True),
        np.float32)
    x_fold, qkv = ffn_block_qkv(att, x, layers["ffn_norm"][1], anrm, qw, li,
                                cfg, interpret=True)
    x_fold = np.asarray(x_fold, np.float32)
    np.testing.assert_allclose(x_fold, x_plain, rtol=2e-2, atol=2e-3)

    # expected next-layer qkv (layer 2) from the fold output
    from tpullm.models.llama import rms_norm

    h = rms_norm(jnp.asarray(x_fold, jnp.bfloat16), anrm[2], cfg.rms_eps)
    want = np.asarray(qmm(h, qw["wqkv"], jnp.bfloat16,
                          layer=jnp.int32(2), interpret=True), np.float32)
    got = np.asarray(qkv, np.float32)
    denom = max(float((want**2).mean()), 1e-9)
    nmse = float(((got - want) ** 2).mean() / denom)
    assert nmse < 5e-3, nmse


def test_ffn_block_batch_rows():
    cfg, params = synth_qparams(
        vocab_size=128, n_embd=512, n_layer=1, n_head=4, n_head_kv=2,
        n_ff=512, qtype=GGMLType.Q4_K, seed=5,
    )
    layers = fuse_layer_weights(params["layers"])
    qw = {k: v for k, v in layers.items() if isinstance(v, QTensor)}
    rng = np.random.default_rng(1)
    B, T, D = 4, 1, cfg.n_embd
    Hd = cfg.n_head * cfg.head_dim_v
    att = jnp.asarray(rng.standard_normal((B, T, Hd)) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, jnp.bfloat16)
    y = np.asarray(ffn_block(att, x, layers["ffn_norm"][0], qw, jnp.int32(0),
                             cfg, interpret=True))
    assert y.shape == (B, T, D)
    assert np.isfinite(y).all()
    # row independence: row 0 result equals the single-row call
    y0 = np.asarray(ffn_block(att[:1], x[:1], layers["ffn_norm"][0], qw,
                              jnp.int32(0), cfg, interpret=True))
    np.testing.assert_allclose(y[0], y0[0], rtol=2e-2, atol=1e-3)
