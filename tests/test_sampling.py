"""Sampler chain distribution-property tests (analogue of tests/test-sampling.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpullm.ops.sampling import (
    SamplerConfig,
    apply_min_p,
    apply_penalties,
    apply_top_k,
    apply_top_p,
    apply_typical,
    make_sample_fn,
)


def logits_from_probs(p):
    return jnp.log(jnp.asarray(p, jnp.float32))


def surviving(logits):
    return set(np.where(np.isfinite(np.asarray(logits)))[1].tolist())


def test_top_k():
    lg = logits_from_probs([[0.1, 0.2, 0.3, 0.4]])
    assert surviving(apply_top_k(lg, 2)) == {2, 3}
    assert surviving(apply_top_k(lg, 0)) == {0, 1, 2, 3}


def test_top_p():
    lg = logits_from_probs([[0.1, 0.2, 0.3, 0.4]])
    # cumulative from top: 0.4, 0.7, 0.9 -> p=0.5 keeps {3, 2}
    assert surviving(apply_top_p(lg, 0.5)) == {2, 3}
    assert surviving(apply_top_p(lg, 1.0)) == {0, 1, 2, 3}
    # always keeps at least the argmax
    assert 3 in surviving(apply_top_p(lg, 1e-9))


def test_min_p():
    lg = logits_from_probs([[0.01, 0.09, 0.4, 0.5]])
    keep = surviving(apply_min_p(lg, 0.2))  # threshold 0.2*0.5 = 0.1
    assert keep == {2, 3}


def test_typical():
    lg = logits_from_probs([[0.97, 0.01, 0.01, 0.01]])
    keep = surviving(apply_typical(lg, 0.5))
    assert 0 in keep


def test_penalties():
    lg = jnp.asarray([[1.0, 2.0, -1.0, 0.5]])
    counts = jnp.asarray([[2, 0, 1, 0]], jnp.int32)
    cfg = SamplerConfig(penalty_repeat=2.0, penalty_freq=0.1, penalty_present=0.5)
    out = np.asarray(apply_penalties(lg, counts, cfg))[0]
    assert out[0] == pytest.approx(1.0 / 2.0 - 0.2 - 0.5)
    assert out[1] == pytest.approx(2.0)
    assert out[2] == pytest.approx(-1.0 * 2.0 - 0.1 - 0.5)


def test_greedy_and_dist():
    lg = logits_from_probs([[0.05, 0.05, 0.1, 0.8]])
    g = make_sample_fn(SamplerConfig(greedy=True))
    assert int(g(lg, jax.random.PRNGKey(0))[0]) == 3
    # dist with temp: sampled distribution roughly matches probs
    s = make_sample_fn(SamplerConfig(temperature=1.0))
    keys = jax.random.split(jax.random.PRNGKey(1), 512)
    toks = np.asarray(jax.vmap(lambda k: s(lg, k))(keys)).ravel()
    frac3 = (toks == 3).mean()
    assert 0.7 < frac3 < 0.9


def test_low_temperature_concentrates():
    lg = logits_from_probs([[0.3, 0.7]])
    s = make_sample_fn(SamplerConfig(temperature=0.05))
    keys = jax.random.split(jax.random.PRNGKey(2), 256)
    toks = np.asarray(jax.vmap(lambda k: s(lg, k))(keys)).ravel()
    assert (toks == 1).mean() > 0.99


def test_chain_composition_jits():
    cfg = SamplerConfig(temperature=0.8, top_k=40, top_p=0.95, min_p=0.05)
    fn = jax.jit(make_sample_fn(cfg))
    lg = jax.random.normal(jax.random.PRNGKey(3), (4, 256))
    toks = fn(lg, jax.random.PRNGKey(4))
    assert toks.shape == (4,) and toks.dtype == jnp.int32
