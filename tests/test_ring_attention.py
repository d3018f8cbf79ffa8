"""Ring attention (sequence parallel) vs single-device reference.

8 virtual CPU devices (conftest forces the host-platform mesh): the
ring-rotated streaming-softmax result must match plain full attention to
float32 tolerance for causal and bidirectional cases, GQA-free heads.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpullm.parallel.ring import ring_attention_sharded


def _ref_attention(q, k, v, causal):
    s = np.einsum("bqhd,bkhd->bhqk", np.float64(q), np.float64(k))
    s /= np.sqrt(q.shape[-1])
    if causal:
        T = q.shape[1]
        mask = np.arange(T)[:, None] >= np.arange(T)[None, :]
        s = np.where(mask[None, None], s, -np.inf)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, np.float64(v))


@pytest.fixture(scope="module")
def mesh():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("sp",))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(mesh, causal):
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 64, 4, 16  # T/8 = 8 per device
    q = rng.normal(0, 1, (B, T, H, D)).astype(np.float32)
    k = rng.normal(0, 1, (B, T, H, D)).astype(np.float32)
    v = rng.normal(0, 1, (B, T, H, D)).astype(np.float32)
    got = np.asarray(ring_attention_sharded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh,
        causal=causal))
    want = _ref_attention(q, k, v, causal)
    nmse = float(((got - want) ** 2).mean() / (want ** 2).mean())
    assert nmse < 1e-10, nmse


def test_ring_first_token_row(mesh):
    """Causal row 0 attends only itself — masked ring blocks must not
    contaminate it (the -inf/corr guards)."""
    rng = np.random.default_rng(1)
    B, T, H, D = 1, 32, 2, 8
    q = rng.normal(0, 1, (B, T, H, D)).astype(np.float32)
    k = rng.normal(0, 1, (B, T, H, D)).astype(np.float32)
    v = rng.normal(0, 1, (B, T, H, D)).astype(np.float32)
    got = np.asarray(ring_attention_sharded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh, causal=True))
    np.testing.assert_allclose(got[0, 0], v[0, 0], rtol=1e-5, atol=1e-5)
