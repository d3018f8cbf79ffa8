"""On-device sampler chain.

The reference's default CPU chain order (common/common.h:244-254, SURVEY A.4):
penalties -> dry -> top_n_sigma -> top_k -> typical_p -> top_p -> min_p -> xtc
-> temperature -> dist. Its "backend sampler" (in-graph sampling,
llama.h:381-382) is the model here: the whole chain runs jitted on device so
multi-step decode never round-trips logits to the host.

All transforms are (B, V) f32 logits -> logits with masked-out candidates at
-inf; `sample` draws from the surviving distribution with a JAX PRNG key.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


@dataclass(frozen=True)
class SamplerConfig:
    """Static sampler parameters (part of the jit signature)."""

    temperature: float = 1.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0
    min_p: float = 0.0
    typical_p: float = 1.0
    top_n_sigma: float = 0.0
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.1
    # penalties (applied against a token-count buffer)
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    greedy: bool = False

    @property
    def needs_penalties(self) -> bool:
        return (
            self.penalty_repeat != 1.0
            or self.penalty_freq != 0.0
            or self.penalty_present != 0.0
        )


def apply_penalties(logits, counts, cfg: SamplerConfig):
    """counts: (B, V) int32 occurrences in the penalty window
    (llama.cpp llama_sampler_penalties semantics, src/llama-sampler.cpp)."""
    used = counts > 0
    rep = jnp.where(
        logits <= 0, logits * cfg.penalty_repeat, logits / cfg.penalty_repeat
    )
    out = jnp.where(used, rep, logits)
    out = out - counts * cfg.penalty_freq - used.astype(jnp.float32) * cfg.penalty_present
    return out


def apply_top_k(logits, k: int):
    if k <= 0:
        return logits
    v = logits.shape[-1]
    k = min(k, v)
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits, p: float):
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep the first)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < p], axis=-1
    )
    n_keep = keep_sorted.sum(axis=-1, keepdims=True)
    kth = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_min_p(logits, p: float):
    if p <= 0.0:
        return logits
    mx = logits.max(axis=-1, keepdims=True)
    # prob >= p * prob_max  <=>  logit >= logit_max + log(p)
    return jnp.where(logits < mx + jnp.log(p), NEG_INF, logits)


def apply_typical(logits, p: float):
    if p >= 1.0:
        return logits
    logp = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(logp)
    ent = -(probs * jnp.where(probs > 0, logp, 0.0)).sum(axis=-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)
    order = jnp.argsort(shifted, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < p], axis=-1
    )
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    return jnp.where(keep, logits, NEG_INF)


def apply_top_n_sigma(logits, n: float):
    if n <= 0.0:
        return logits
    mx = logits.max(axis=-1, keepdims=True)
    valid = logits > NEG_INF
    mean = jnp.where(valid, logits, 0.0).sum(-1, keepdims=True) / valid.sum(-1, keepdims=True)
    var = (jnp.where(valid, logits - mean, 0.0) ** 2).sum(-1, keepdims=True) / valid.sum(-1, keepdims=True)
    std = jnp.sqrt(var)
    return jnp.where(logits < mx - n * std, NEG_INF, logits)


def apply_xtc(logits, key, probability: float, threshold: float):
    """Exclude-the-top-choice sampler (llama.cpp llama_sampler_xtc)."""
    if probability <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    above = probs >= threshold
    n_above = above.sum(axis=-1, keepdims=True)
    # remove all above-threshold tokens except the least-probable of them
    min_above = jnp.where(above, probs, jnp.inf).min(axis=-1, keepdims=True)
    drop = above & (probs > min_above) & (n_above >= 2)
    roll = jax.random.uniform(key, (logits.shape[0], 1))
    do = roll < probability
    return jnp.where(do & drop, NEG_INF, logits)


def apply_temperature(logits, t: float):
    if t <= 0.0:
        # greedy via temperature 0: keep only argmax
        mx = logits.max(axis=-1, keepdims=True)
        return jnp.where(logits < mx, NEG_INF, logits)
    return logits / t


def make_sample_fn(cfg: SamplerConfig):
    """-> jittable (logits (B,V), key, counts (B,V) | None) -> tokens (B,)."""

    def fn(logits, key, counts=None):
        logits = logits.astype(jnp.float32)
        if cfg.greedy:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if cfg.needs_penalties and counts is not None:
            logits = apply_penalties(logits, counts, cfg)
        if cfg.top_n_sigma > 0:
            logits = apply_top_n_sigma(logits, cfg.top_n_sigma)
        logits = apply_top_k(logits, cfg.top_k)
        logits = apply_typical(logits, cfg.typical_p)
        logits = apply_top_p(logits, cfg.top_p)
        logits = apply_min_p(logits, cfg.min_p)
        if cfg.xtc_probability > 0:
            key, sub = jax.random.split(key)
            logits = apply_xtc(logits, sub, cfg.xtc_probability, cfg.xtc_threshold)
        logits = apply_temperature(logits, cfg.temperature)
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

    return fn


GREEDY = SamplerConfig(greedy=True)
