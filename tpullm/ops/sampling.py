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
    mirostat_tau: float = 0.0  # >0 enables mirostat (see mirostat_v)
    mirostat_eta: float = 0.1
    mirostat_v: int = 2  # 1 = zipf-estimated dynamic top-k (v1), 2 = v2
    dry_multiplier: float = 0.0  # >0 enables DRY
    dry_base: float = 1.75
    dry_allowed: int = 2
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


# ---------------------------------------------------------------------------
# Batched per-row sampler: every parameter is a (B,) array, so one compiled
# function serves slots with heterogeneous sampler settings (the reference's
# per-sequence backend samplers, llama.h:381-382) without recompilation.
# Neutral values disable a stage per row (top_k=0, top_p=1, min_p=0,
# typical_p=1, top_n_sigma=0, xtc_probability=0, temperature=1,
# penalty_repeat=1/freq=0/present=0; temperature<=0 = greedy).
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class BatchSamplerParams:
    temperature: jnp.ndarray  # (B,) f32; <=0 means greedy
    top_k: jnp.ndarray  # (B,) i32; 0 disables
    top_p: jnp.ndarray  # (B,) f32
    min_p: jnp.ndarray  # (B,) f32
    typical_p: jnp.ndarray  # (B,) f32
    top_n_sigma: jnp.ndarray  # (B,) f32
    xtc_probability: jnp.ndarray  # (B,) f32
    xtc_threshold: jnp.ndarray  # (B,) f32
    penalty_repeat: jnp.ndarray  # (B,) f32
    penalty_freq: jnp.ndarray  # (B,) f32
    penalty_present: jnp.ndarray  # (B,) f32
    mirostat_tau: jnp.ndarray  # (B,) f32; >0 enables mirostat
    mirostat_eta: jnp.ndarray  # (B,) f32
    mirostat_v: jnp.ndarray  # (B,) i32: 1 | 2
    dry_multiplier: jnp.ndarray  # (B,) f32; >0 enables DRY
    dry_base: jnp.ndarray  # (B,) f32
    dry_allowed: jnp.ndarray  # (B,) i32 allowed repeat length

    _FIELDS = (
        "temperature", "top_k", "top_p", "min_p", "typical_p", "top_n_sigma",
        "xtc_probability", "xtc_threshold", "penalty_repeat", "penalty_freq",
        "penalty_present", "mirostat_tau", "mirostat_eta", "mirostat_v",
        "dry_multiplier", "dry_base", "dry_allowed",
    )

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._FIELDS), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def neutral(B: int):
        f = lambda v: jnp.full((B,), v, jnp.float32)
        return BatchSamplerParams(
            temperature=f(0.0), top_k=jnp.zeros(B, jnp.int32), top_p=f(1.0),
            min_p=f(0.0), typical_p=f(1.0), top_n_sigma=f(0.0),
            xtc_probability=f(0.0), xtc_threshold=f(0.1), penalty_repeat=f(1.0),
            penalty_freq=f(0.0), penalty_present=f(0.0),
            mirostat_tau=f(0.0), mirostat_eta=f(0.1),
            mirostat_v=jnp.full((B,), 2, jnp.int32),
            dry_multiplier=f(0.0), dry_base=f(1.75),
            dry_allowed=jnp.full((B,), 2, jnp.int32),
        )

    def with_row(self, i: int, cfg: SamplerConfig) -> "BatchSamplerParams":
        """Functional per-slot update from a scalar SamplerConfig."""
        vals = dict(
            temperature=0.0 if cfg.greedy else cfg.temperature,
            top_k=cfg.top_k, top_p=cfg.top_p, min_p=cfg.min_p,
            typical_p=cfg.typical_p, top_n_sigma=cfg.top_n_sigma,
            xtc_probability=cfg.xtc_probability, xtc_threshold=cfg.xtc_threshold,
            penalty_repeat=cfg.penalty_repeat, penalty_freq=cfg.penalty_freq,
            penalty_present=cfg.penalty_present,
            mirostat_tau=getattr(cfg, "mirostat_tau", 0.0),
            mirostat_eta=getattr(cfg, "mirostat_eta", 0.1),
            mirostat_v=getattr(cfg, "mirostat_v", 2),
            dry_multiplier=getattr(cfg, "dry_multiplier", 0.0),
            dry_base=getattr(cfg, "dry_base", 1.75),
            dry_allowed=getattr(cfg, "dry_allowed", 2),
        )
        new = {f: getattr(self, f).at[i].set(vals[f]) for f in self._FIELDS}
        return BatchSamplerParams(**new)


def _col(x):
    return x[:, None]


def apply_dry(logits, ordered, p: BatchSamplerParams, max_match: int = 16):
    """DRY repetition penalty (llama_sampler_dry, vectorized on device).

    ordered: (B, N) recent tokens oldest->newest (-1 = empty). For every
    position i, the match length m_i is the longest suffix of the context
    that equals the tokens ending just before i; the token ordered[i] (which
    would EXTEND that repeat) is penalized by multiplier * base^(m-allowed)
    for m >= allowed, taking the max match per candidate token.
    """
    B, N = ordered.shape
    V = logits.shape[-1]
    # eq[b, i, j]: ordered[i-1-j] == ordered[N-1-j] (suffix alignment)
    js = jnp.arange(max_match)
    idx_ctx = jnp.arange(N)[:, None] - 1 - js[None, :]  # (N, J)
    valid = idx_ctx >= 0
    ctx = ordered[:, jnp.maximum(idx_ctx, 0)]  # (B, N, J)
    tail = ordered[:, None, N - 1 - js]  # (B, 1, J)
    eq = (ctx == tail) & valid[None] & (ctx >= 0)
    m = jnp.cumprod(eq.astype(jnp.int32), axis=-1).sum(axis=-1)  # (B, N)
    cand = ordered  # token that would extend the match ending at i-1
    pen_exp = m - p.dry_allowed[:, None] + 1
    pen = jnp.where(
        (pen_exp > 0) & (cand >= 0),
        _col(p.dry_multiplier) * _col(p.dry_base) ** (pen_exp - 1).astype(jnp.float32),
        0.0,
    )
    # scatter-max per token id
    out = jnp.zeros((B, V), logits.dtype)
    out = out.at[jnp.arange(B)[:, None], jnp.maximum(cand, 0)].max(pen)
    return logits - out


def sample_batch(logits, p: BatchSamplerParams, key, counts=None, mu=None,
                 dry_ctx=None, bias=None):
    """(B, V) f32 logits + per-row params -> (B,) i32 tokens (or
    (tokens, new_mu) when ``mu`` is given). Chain order follows
    common/common.h:244-254 (penalties -> top_n_sigma -> top_k -> typical ->
    top_p -> min_p -> xtc -> temperature -> dist); rows with
    mirostat_tau > 0 run mirostat v2 instead of the truncation stack
    (llama_sampler_mirostat_v2)."""
    logits = logits.astype(jnp.float32)
    if bias is not None:  # per-row logit bias (llama_sampler_init_logit_bias)
        logits = logits + bias
    B, V = logits.shape
    raw = logits

    if counts is not None:
        used = counts > 0
        rep = jnp.where(
            logits <= 0, logits * _col(p.penalty_repeat), logits / _col(p.penalty_repeat)
        )
        logits = jnp.where(used, rep, logits)
        logits = logits - counts * _col(p.penalty_freq) \
            - used.astype(jnp.float32) * _col(p.penalty_present)

    if dry_ctx is not None:
        logits = apply_dry(logits, dry_ctx, p)

    # --- candidate truncation --------------------------------------------
    # Full-vocab sorts dominate sampler cost at 128k vocab (~2.4 ms/step on
    # v5e). The truncation stack instead runs on the top-K candidates from a
    # single lax.top_k: exact whenever the surviving set fits in K (always
    # for V <= K; for larger vocabs the reference's own default chain
    # truncates to top_k=40 anyway, and the dropped tail mass beyond the
    # top-256 of the distribution is negligible). Elementwise passes
    # (penalties, DRY, bias) above and reductions below stay full-vocab.
    K = min(256, V)
    # top_n_sigma threshold from full-vocab stats (reductions, no sort)
    mx_full = logits.max(axis=-1, keepdims=True)
    mean = logits.mean(axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.maximum(((logits - mean) ** 2).mean(-1, keepdims=True), 0.0))

    vals, idx = jax.lax.top_k(logits, K)  # (B, K) descending
    pos = jnp.arange(K)[None, :]

    thr = jnp.where(_col(p.top_n_sigma) > 0, mx_full - _col(p.top_n_sigma) * std,
                    NEG_INF)
    vals = jnp.where(vals < thr, NEG_INF, vals)

    # top_k (per-row k; 0 -> everything): vals are sorted, mask by position
    kk = jnp.where(p.top_k > 0, jnp.minimum(p.top_k, K), K)
    vals = jnp.where(pos >= _col(kk), NEG_INF, vals)

    # typical_p over the current candidate set (matches the reference chain,
    # where typical sees the list already truncated by upstream samplers)
    logp = jax.nn.log_softmax(vals, axis=-1)
    probs = jnp.exp(logp)
    ent = -(probs * jnp.where(probs > 0, logp, 0.0)).sum(-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)
    order = jnp.argsort(shifted, axis=-1)
    sp = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sp, axis=-1)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < _col(p.typical_p)], axis=-1
    )
    keep = jnp.zeros_like(keep_sorted).at[jnp.arange(B)[:, None], order].set(keep_sorted)
    vals = jnp.where(keep | (_col(p.typical_p) >= 1.0), vals, NEG_INF)

    # top_p (typical may mask arbitrary positions: re-sort the K candidates)
    sd = jnp.sort(vals, axis=-1)[..., ::-1]
    pr = jax.nn.softmax(sd, axis=-1)
    cum = jnp.cumsum(pr, axis=-1)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < _col(p.top_p)], axis=-1
    )
    n_keep = keep_sorted.sum(axis=-1, keepdims=True)
    kth = jnp.take_along_axis(sd, n_keep - 1, axis=-1)
    vals = jnp.where((vals < kth) & (_col(p.top_p) < 1.0), NEG_INF, vals)

    # min_p
    mx = vals.max(axis=-1, keepdims=True)
    minp_thr = jnp.where(_col(p.min_p) > 0, mx + jnp.log(_col(p.min_p)), NEG_INF)
    vals = jnp.where(vals < minp_thr, NEG_INF, vals)

    # xtc
    key, sub = jax.random.split(key)
    probs = jax.nn.softmax(vals, axis=-1)
    above = probs >= _col(p.xtc_threshold)
    n_above = above.sum(axis=-1, keepdims=True)
    min_above = jnp.where(above, probs, jnp.inf).min(axis=-1, keepdims=True)
    drop = above & (probs > min_above) & (n_above >= 2)
    roll = jax.random.uniform(sub, (B, 1))
    vals = jnp.where((roll < _col(p.xtc_probability)) & drop, NEG_INF, vals)

    # mirostat rows bypass the truncation stack (surprise measured on the
    # raw distribution; full-vocab logsumexp only)
    if mu is not None:
        tau_on = _col(p.mirostat_tau) > 0
        lse_raw = jax.scipy.special.logsumexp(raw, axis=-1, keepdims=True)
        vals_raw = jnp.take_along_axis(raw, idx, axis=-1)
        # v2: filter by surprise > mu
        surprise = (lse_raw - vals_raw) / jnp.log(2.0)
        miro_vals = jnp.where(surprise > _col(mu), NEG_INF, vals_raw)
        # always keep the candidate argmax so the row can't go empty
        mx_keep = vals_raw >= vals_raw.max(-1, keepdims=True)
        miro_vals = jnp.where(mx_keep, vals_raw, miro_vals)
        # v1 (llama_sampler_mirostat_apply): zipf exponent s_hat from the
        # top adjacent prob ratios, dynamic k from (s_hat, mu), then top-k.
        # Runs on the top-K window (the adjacent-ratio b_i terms are
        # normalizer-free, so the window softmax is exact for them).
        Kw = vals_raw.shape[-1]
        m_pairs = min(99, Kw - 1)
        srt = jnp.sort(vals_raw, axis=-1)[..., ::-1]
        lp_s = jax.nn.log_softmax(srt, axis=-1)
        i_ar = jnp.arange(m_pairs, dtype=jnp.float32)
        t_i = jnp.log((i_ar + 2.0) / (i_ar + 1.0))[None, :]
        b_i = lp_s[:, :m_pairs] - lp_s[:, 1:m_pairs + 1]
        s_hat = (t_i * b_i).sum(-1) / jnp.maximum((t_i * t_i).sum(-1), 1e-9)
        eps_hat = jnp.maximum(s_hat - 1.0, 1e-4)
        k1 = ((eps_hat * jnp.exp2(mu))
              / (1.0 - jnp.float32(V) ** (-eps_hat))) ** (1.0 / s_hat)
        k1 = jnp.clip(k1, 1, Kw)
        v1_vals = jnp.where(pos < k1[:, None].astype(jnp.float32),
                            vals_raw, NEG_INF)
        use_v1 = tau_on & (_col(p.mirostat_v) == 1)
        vals = jnp.where(use_v1, v1_vals,
                         jnp.where(tau_on, miro_vals, vals))

    # temperature / greedy
    greedy_mask = jnp.where(vals < vals.max(-1, keepdims=True), NEG_INF, vals)
    t = _col(p.temperature)
    vals = jnp.where(t > 0, vals / jnp.where(t > 0, t, 1.0), greedy_mask)

    j = jax.random.categorical(key, vals, axis=-1)
    toks = jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0].astype(jnp.int32)
    if mu is None:
        return toks
    # mu update from the OBSERVED surprise of the sampled token
    lse_raw = jax.scipy.special.logsumexp(raw, axis=-1)
    obs = (lse_raw - jnp.take_along_axis(raw, toks[:, None], axis=-1)[:, 0]) \
        / jnp.log(2.0)
    new_mu = mu - p.mirostat_eta * (obs - p.mirostat_tau)
    new_mu = jnp.where(p.mirostat_tau > 0, new_mu, mu)
    return toks, new_mu


@jax.tree_util.register_pytree_node_class
@dataclass
class PenaltyState:
    """Ring buffer of the last-N accepted tokens per row + token counts
    (llama.cpp llama_sampler_penalties window semantics)."""

    counts: jnp.ndarray  # (B, V) i32
    ring: jnp.ndarray  # (B, N) i32, -1 = empty
    pos: jnp.ndarray  # (B,) i32 next write index

    def tree_flatten(self):
        return (self.counts, self.ring, self.pos), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def create(B: int, V: int, window: int = 64):
        return PenaltyState(
            counts=jnp.zeros((B, V), jnp.int32),
            ring=jnp.full((B, window), -1, jnp.int32),
            pos=jnp.zeros((B,), jnp.int32),
        )

    def push(self, tokens):
        """Accept one token per row; evicts the oldest beyond the window."""
        B, N = self.ring.shape
        rows = jnp.arange(B)
        old = self.ring[rows, self.pos]
        dec = jnp.where(old >= 0, 1, 0)
        counts = self.counts.at[rows, jnp.maximum(old, 0)].add(-dec)
        counts = counts.at[rows, tokens].add(1)
        ring = self.ring.at[rows, self.pos].set(tokens)
        return PenaltyState(counts, ring, (self.pos + 1) % N)

    def clear_row(self, i: int):
        return PenaltyState(
            self.counts.at[i].set(0), self.ring.at[i].set(-1), self.pos.at[i].set(0)
        )

    def ordered(self):
        """Ring -> (B, N) tokens oldest->newest (-1 where empty)."""
        B, N = self.ring.shape
        idx = (jnp.arange(N)[None, :] + self.pos[:, None]) % N
        return jnp.take_along_axis(self.ring, idx, axis=1)
