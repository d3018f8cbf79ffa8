"""Speculative decoding: on-device n-gram self-speculation + batched verify.

Reference: common/speculative.cpp + the model-free NGRAM_* modes
(common/common.h:158-165, common/ngram-map.cpp). Verification follows
common_sampler_sample_and_accept_n (common/sampling.h:83): the target
decodes [cur, draft...] in one ubatch and accepts the longest prefix whose
target samples equal the draft.

TPU-native inversion: drafting AND verification run inside one jitted
lax.scan — the n-gram lookup is a vectorized match over the on-device token
history, so a whole speculation chunk (many iterations) runs without any
host round-trip. No KV rollback is needed: cache rows are position-masked,
so rejected rows are simply overwritten by the next iteration (the slot
layout makes the reference's KV checkpointing, server-context.cpp:363-380,
unnecessary).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def ngram_draft(hist, n_hist, k: int):
    """Propose k continuation tokens by matching the last bigram of
    hist[:n_hist] against earlier history (NGRAM_SIMPLE analogue).

    hist: (S,) i32 token ring (valid prefix [0, n_hist)). Returns (k,) i32
    draft (falls back to repeating the last token when no match).
    """
    S = hist.shape[0]
    t0 = hist[jnp.maximum(n_hist - 2, 0)]
    t1 = hist[jnp.maximum(n_hist - 1, 0)]
    idx = jnp.arange(S - 1)
    ok = (hist[:-1] == t0) & (hist[1:] == t1) & (idx + 2 < n_hist) & (n_hist >= 2)
    # prefer the LAST match (recency, like the reference's ngram map updates)
    score = jnp.where(ok, idx, -1)
    pos = jnp.max(score)
    found = pos >= 0
    start = jnp.clip(pos + 2, 0, S - k)
    draft = jax.lax.dynamic_slice(hist, (start,), (k,))
    return jnp.where(found, draft, jnp.full((k,), t1, jnp.int32)), found


def make_spec_step(fwd, sample_fn, k: int):
    """One speculation iteration: draft k, verify in one forward.

    fwd(tokens (1,T), positions (1,T), cache, cache_pos) -> (logits (1,T,V), cache)
    Returns step(carry) with carry = (cur, pos, cache, hist, n_hist, key) and
    per-step outputs (tokens (k+1,), n_emitted scalar).
    """

    def step(carry, _):
        cur, pos, cache, hist, n_hist, key = carry
        draft, found = ngram_draft(hist, n_hist, k)
        toks_in = jnp.concatenate([cur[None], draft])  # (k+1,)
        positions = pos + jnp.arange(k + 1, dtype=jnp.int32)
        logits, cache = fwd(toks_in[None], positions[None], cache, pos)
        key, sub = jax.random.split(key)
        out = sample_fn(logits[0], sub)  # (k+1,) target samples
        match = out[:k] == draft
        n_acc = jax.lax.associative_scan(jnp.logical_and, match).sum()
        # emitted tokens: draft[:n_acc] then out[n_acc]
        emit = jnp.where(jnp.arange(k + 1) < n_acc,
                         jnp.concatenate([draft, draft[-1:]]),
                         0)
        emit = emit.at[n_acc].set(out[n_acc])
        n_emit = n_acc + 1
        # history append: [cur] + draft[:n_acc] ... + out[n_acc]? The history
        # must contain exactly the accepted sequence: positions pos..pos+n_acc
        # hold [cur, draft[:n_acc]]; the new cur = out[n_acc] lands next step.
        upd = jnp.concatenate([cur[None], draft])
        write_mask = jnp.arange(k + 1) <= n_acc
        old = jax.lax.dynamic_slice(hist, (jnp.minimum(pos, hist.shape[0] - k - 1),), (k + 1,))
        hist = jax.lax.dynamic_update_slice(
            hist, jnp.where(write_mask, upd, old),
            (jnp.minimum(pos, hist.shape[0] - k - 1),))
        cur = out[n_acc]
        pos = pos + n_emit
        n_hist = n_hist + n_emit
        return (cur, pos, cache, hist, n_hist, key), (emit, n_emit)

    return step


class SpeculativeDecoder:
    """Chunked on-device speculative decode loop for one sequence."""

    def __init__(self, engine, k: int = 6, n_iters: int = 8):
        from ..models.llama import forward

        self.eng = engine
        self.k = k
        self.n_iters = n_iters
        cfg = engine.cfg

        def fwd(tokens, positions, cache, cache_pos):
            logits, cache = forward(
                engine.params, cfg, tokens, positions, cache,
                cache_pos=cache_pos,
                valid_from=jnp.zeros((1,), jnp.int32), dtype=engine.dtype,
            )
            return logits, cache

        self._fwd = fwd

        @jax.jit
        def prefill_rp(tokens, positions, cache, last_idx):
            logits, cache = forward(
                engine.params, cfg, tokens, positions, cache, cache_pos=0,
                valid_from=jnp.zeros((1,), jnp.int32), dtype=engine.dtype,
                logits_idx=last_idx,
            )
            return logits, cache

        self._prefill_rp = prefill_rp
        self._chunk = None

    def _build(self, sample_fn):
        step = make_spec_step(self._fwd, sample_fn, self.k)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def chunk(cur, pos, cache, hist, n_hist, key):
            (cur, pos, cache, hist, n_hist, key), (emits, n_emits) = jax.lax.scan(
                step, (cur, pos, cache, hist, n_hist, key), None,
                length=self.n_iters)
            return cur, pos, cache, hist, n_hist, emits, n_emits

        return chunk

    def generate(self, prompt: list[int], max_new_tokens: int = 64,
                 greedy: bool = True, seed: int = 0):
        """Returns (tokens, stats). Greedy verification is exact (identical
        to plain greedy decode); sampled mode verifies with per-position
        independent samples."""
        eng = self.eng
        from ..ops.sampling import GREEDY, make_sample_fn

        sample_scalar = make_sample_fn(GREEDY) if greedy else eng_default_sampler(eng)

        def sample_fn(logits2d, key):  # (T, V) -> (T,)
            return sample_scalar(logits2d, key)

        if self._chunk is None:
            self._chunk = self._build(sample_fn)

        # right-padded prefill: slot index == token position (the spec loop
        # tracks one counter for both)
        n0 = len(prompt)
        Tb = 16
        while Tb < n0:
            Tb *= 2
        toks = np.zeros((1, Tb), np.int32)
        toks[0, :n0] = prompt
        pos_in = jnp.arange(Tb, dtype=jnp.int32)[None]
        cache = eng.new_cache(1)
        logits, cache = self._prefill_rp(
            jnp.asarray(toks), pos_in, cache, jnp.int32(n0 - 1))
        cur = jnp.argmax(logits[0, 0]).astype(jnp.int32)
        S = eng.max_seq_len
        hist = jnp.zeros((S,), jnp.int32)
        hist = hist.at[:n0].set(jnp.asarray(prompt, jnp.int32))
        n_hist = jnp.int32(n0)
        pos = jnp.int32(n0)
        key = jax.random.PRNGKey(seed)

        out: list[int] = [int(cur)]
        n_drafted = n_accepted = 0
        while len(out) < max_new_tokens and int(pos) + self.n_iters * (self.k + 1) < S:
            cur, pos, cache, hist, n_hist, emits, n_emits = self._chunk(
                cur, pos, cache, hist, n_hist, key)
            key = jax.random.fold_in(key, len(out))
            emits = np.asarray(emits)  # (n_iters, k+1)
            n_emits = np.asarray(n_emits)
            for it in range(self.n_iters):
                n = int(n_emits[it])
                out.extend(int(t) for t in emits[it, :n])
                n_drafted += self.k
                n_accepted += n - 1
        stats = {
            "n_drafted": n_drafted,
            "n_accepted": n_accepted,
            "accept_rate": round(n_accepted / max(n_drafted, 1), 3),
        }
        return out[:max_new_tokens], stats


def eng_default_sampler(eng):
    from ..ops.sampling import SamplerConfig, make_sample_fn

    return make_sample_fn(SamplerConfig(temperature=1.0, top_k=40))


class DraftModelSpeculativeDecoder:
    """Two-model speculative decoding (SPEC_TYPE_DRAFT,
    common/speculative.cpp): a small draft model proposes k tokens
    greedily, the target verifies them in one ubatch and accepts the
    longest matching prefix. Both models run inside one jitted chunk, so
    the whole draft+verify loop stays on device.
    """

    def __init__(self, target_engine, draft_cfg, draft_params,
                 k: int = 6, n_iters: int = 8):
        from ..models.llama import forward

        self.eng = target_engine
        self.k = k
        self.n_iters = n_iters
        self.draft_cfg = draft_cfg
        self.draft_params = draft_params
        tcfg = target_engine.cfg

        def fwd_t(tokens, positions, cache, cache_pos):
            return forward(target_engine.params, tcfg, tokens, positions,
                           cache, cache_pos=cache_pos,
                           valid_from=jnp.zeros((1,), jnp.int32),
                           dtype=target_engine.dtype)

        def fwd_d(tokens, positions, cache, cache_pos):
            return forward(draft_params, draft_cfg, tokens, positions,
                           cache, cache_pos=cache_pos,
                           valid_from=jnp.zeros((1,), jnp.int32),
                           dtype=target_engine.dtype)

        k_ = k

        def step(carry, _):
            cur, pos, tc, dc = carry

            # draft: consume cur, then propose k tokens greedily
            def dstep(dcarry, i):
                tok, dpos, dc = dcarry
                logits, dc = fwd_d(tok[None, None], dpos[None, None], dc, dpos)
                nxt = jnp.argmax(logits[0, 0]).astype(jnp.int32)
                return (nxt, dpos + 1, dc), nxt

            (last, _, dc), drafts = jax.lax.scan(
                dstep, (cur, pos, dc), jnp.arange(k_))

            toks_in = jnp.concatenate([cur[None], drafts])  # (k+1,)
            positions = pos + jnp.arange(k_ + 1, dtype=jnp.int32)
            logits, tc = fwd_t(toks_in[None], positions[None], tc, pos)
            out = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (k+1,)
            match = out[:k_] == drafts
            n_acc = jax.lax.associative_scan(jnp.logical_and, match).sum()
            emit = jnp.where(jnp.arange(k_ + 1) < n_acc,
                             jnp.concatenate([drafts, drafts[-1:]]), 0)
            emit = emit.at[n_acc].set(out[n_acc])
            cur = out[n_acc]
            pos = pos + n_acc + 1
            return (cur, pos, tc, dc), (emit, n_acc + 1)

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def chunk(cur, pos, tc, dc):
            (cur, pos, tc, dc), (emits, n_emits) = jax.lax.scan(
                step, (cur, pos, tc, dc), None, length=n_iters)
            return cur, pos, tc, dc, emits, n_emits

        self._chunk = chunk

        from ..models.llama import forward as _fwd

        def mk_prefill(params, cfg):
            @jax.jit
            def _p(tokens, positions, cache, last_idx):
                logits, cache = _fwd(params, cfg, tokens, positions, cache,
                                     cache_pos=0,
                                     valid_from=jnp.zeros((1,), jnp.int32),
                                     dtype=target_engine.dtype,
                                     logits_idx=last_idx)
                return logits, cache
            return _p

        self._prefill_t = mk_prefill(target_engine.params, tcfg)
        self._prefill_d = mk_prefill(draft_params, draft_cfg)

    def generate(self, prompt: list[int], max_new_tokens: int = 64):
        from ..models.llama import KVCache

        eng = self.eng
        n0 = len(prompt)
        Tb = 16
        while Tb < n0:
            Tb *= 2
        toks = np.zeros((1, Tb), np.int32)
        toks[0, :n0] = prompt
        pos_in = jnp.arange(Tb, dtype=jnp.int32)[None]
        tc = eng.new_cache(1)
        dc = KVCache.create(self.draft_cfg, 1, eng.max_seq_len, eng.dtype)
        logits, tc = self._prefill_t(jnp.asarray(toks), pos_in, tc,
                                     jnp.int32(n0 - 1))
        _, dc = self._prefill_d(jnp.asarray(toks), pos_in, dc,
                                jnp.int32(n0 - 1))
        cur = jnp.argmax(logits[0, 0]).astype(jnp.int32)
        pos = jnp.int32(n0)

        out = [int(cur)]
        n_drafted = n_accepted = 0
        budget = self.n_iters * (self.k + 1)
        while len(out) < max_new_tokens and int(pos) + budget < eng.max_seq_len:
            cur, pos, tc, dc, emits, n_emits = self._chunk(cur, pos, tc, dc)
            emits = np.asarray(emits)
            n_emits = np.asarray(n_emits)
            for it in range(self.n_iters):
                n = int(n_emits[it])
                out.extend(int(t) for t in emits[it, :n])
                n_drafted += self.k
                n_accepted += n - 1
        stats = {"n_drafted": n_drafted, "n_accepted": n_accepted,
                 "accept_rate": round(n_accepted / max(n_drafted, 1), 3)}
        return out[:max_new_tokens], stats


class NgramMap:
    """Stats-tracking n-gram -> m-gram map (common/ngram-map.h, the
    NGRAM_MAP speculative mode): every key n-gram that recurs in the
    token history stores up to 4 following m-grams with occurrence counts
    and the acceptance length of the last draft tried from each. Drafts
    fire only for keys seen >= min_hits times, picking the value with the
    best (last-acceptance, count) record — so the map self-tunes toward
    m-grams the target model actually accepts.
    """

    MAX_VALUES = 4

    def __init__(self, size_key: int = 4, size_value: int = 12,
                 min_hits: int = 2):
        self.n = size_key
        self.m = size_value
        self.min_hits = min_hits
        # key tuple -> {value tuple: [count, last_n_accepted]}
        self.map: dict = {}
        self._indexed = 0
        self._tokens: list = []
        self._last = None  # (key, value) of the outstanding draft

    def begin(self, tokens: list) -> None:
        """(Re)build from a fresh history (reasoning blocks may have been
        stripped: common_ngram_map_begin)."""
        self.map.clear()
        self._tokens = []
        self._indexed = 0
        self._last = None
        self.extend(tokens)

    def extend(self, tokens: list) -> None:
        """Index newly appended history incrementally."""
        self._tokens.extend(int(t) for t in tokens)
        n, m = self.n, self.m
        t = self._tokens
        start = max(self._indexed, 0)
        for i in range(start, len(t) - n - m + 1):
            key = tuple(t[i: i + n])
            val = tuple(t[i + n: i + n + m])
            vals = self.map.setdefault(key, {})
            if val in vals:
                vals[val][0] += 1
            elif len(vals) < self.MAX_VALUES:
                vals[val] = [1, -1]
            else:  # evict the weakest (lowest count, never-accepted first)
                worst = min(vals, key=lambda v: (vals[v][1] >= 0, vals[v][0]))
                if vals[worst][0] <= 1:
                    del vals[worst]
                    vals[val] = [1, -1]
        self._indexed = max(len(t) - n - m + 1, 0)

    def draft(self, sampled: int) -> list:
        """Tokens to speculate after `sampled` (empty = no draft)."""
        self._last = None
        t = self._tokens
        if len(t) < self.n - 1:
            return []
        key = tuple(t[len(t) - self.n + 1:] + [int(sampled)]) \
            if self.n > 1 else (int(sampled),)
        vals = self.map.get(key)
        if not vals:
            return []
        hits = sum(v[0] for v in vals.values())
        if hits < self.min_hits:
            return []
        # best: previously-accepted drafts first, then frequency
        best = max(vals, key=lambda v: (vals[v][1], vals[v][0]))
        if vals[best][1] == 0:
            return []  # last try was fully rejected: stop wasting verifies
        self._last = (key, best)
        return list(best)

    def accept(self, n_accepted: int) -> None:
        """Feed back how many draft tokens the target accepted
        (common_ngram_map_accept)."""
        if self._last is not None:
            key, val = self._last
            self.map[key][val][1] = int(n_accepted)
            self._last = None


class NgramMapSpeculativeDecoder:
    """Host-loop speculative decode with the NgramMap drafter (the
    reference's NGRAM_MAP mode): draft from history statistics, verify
    each draft with ONE jitted target forward over [cur, draft...], and
    feed the acceptance length back into the map. Greedy verification is
    exact — output identical to plain greedy decode."""

    def __init__(self, engine, size_key: int = 4, size_value: int = 12,
                 min_hits: int = 2):
        from ..models.llama import forward

        self.eng = engine
        self.map = NgramMap(size_key, size_value, min_hits)
        cfg = engine.cfg

        @jax.jit
        def verify(tokens, positions, cache, cache_pos):
            logits, cache = forward(
                engine.params, cfg, tokens, positions, cache,
                cache_pos=cache_pos, valid_from=jnp.zeros((1,), jnp.int32),
                dtype=engine.dtype)
            return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), cache

        self._verify = verify

        @jax.jit
        def prefill(tokens, positions, cache, last_idx):
            logits, cache = forward(
                engine.params, cfg, tokens, positions, cache, cache_pos=0,
                valid_from=jnp.zeros((1,), jnp.int32), dtype=engine.dtype,
                logits_idx=last_idx)
            return jnp.argmax(logits[0, 0]).astype(jnp.int32), cache

        self._prefill = prefill

    def generate(self, prompt: list[int], max_new_tokens: int = 64):
        eng = self.eng
        n0 = len(prompt)
        Tb = 16
        while Tb < n0:
            Tb *= 2
        toks = np.zeros((1, Tb), np.int32)
        toks[0, :n0] = prompt
        cache = eng.new_cache(1)
        cur, cache = self._prefill(
            jnp.asarray(toks), jnp.arange(Tb, dtype=jnp.int32)[None], cache,
            jnp.int32(n0 - 1))
        cur = int(cur)
        self.map.begin(prompt)
        out = [cur]
        pos = n0
        n_drafted = n_accepted = 0
        S = eng.max_seq_len
        k = self.map.m
        while len(out) < max_new_tokens and pos + k + 1 < S:
            draft = self.map.draft(cur)
            kd = len(draft)
            toks_in = np.asarray([cur] + draft + [0] * (k - kd), np.int32)
            positions = pos + np.arange(k + 1, dtype=np.int32)
            got, cache = self._verify(jnp.asarray(toks_in[None]),
                                      jnp.asarray(positions[None]), cache,
                                      jnp.int32(pos))
            got = np.asarray(got)  # (k+1,) target greedy at each position
            n_acc = 0
            while n_acc < kd and got[n_acc] == draft[n_acc]:
                n_acc += 1
            emitted = ([draft[i] for i in range(n_acc)] + [int(got[n_acc])])
            if kd:
                self.map.accept(n_acc)
                n_drafted += kd
                n_accepted += n_acc
            self.map.extend([cur] + emitted[:-1])
            out.extend(emitted)
            pos += n_acc + 1
            cur = emitted[-1]
        stats = {"n_drafted": n_drafted, "n_accepted": n_accepted,
                 "accept_rate": round(n_accepted / max(n_drafted, 1), 3)}
        return out[:max_new_tokens], stats
