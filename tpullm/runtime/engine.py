"""Inference engine: jitted prefill/decode over bucketed static shapes.

The reference rebuilds a ggml graph every ubatch and reuses it when topology
matches (src/llama-context.cpp:1185 can_reuse). The XLA inversion: trace once
per (batch, seq-bucket) signature and let the compilation cache do graph
reuse; shapes are bucketed to powers of two to bound the number of compiles.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import KVCache, forward


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclass
class GenerationResult:
    tokens: list[list[int]]
    logits: np.ndarray | None = None  # (B, vocab) last-step logits
    n_prefill: int = 0
    n_decode: int = 0


class InferenceEngine:
    """Single-model batch inference (greedy / sampled via Sampler)."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: dict,
        max_seq_len: int = 1024,
        compute_dtype=jnp.bfloat16,
        kv_dtype=None,
        donate_cache: bool = True,
    ):
        self.cfg = cfg
        self.params = params
        self.max_seq_len = max_seq_len
        self.dtype = compute_dtype
        self.kv_dtype = kv_dtype or compute_dtype

        fwd = functools.partial(forward, cfg=cfg, dtype=compute_dtype)

        def _prefill(params, tokens, positions, cache, valid_from):
            logits, cache = fwd(
                params, tokens=tokens, positions=positions, cache=cache,
                cache_pos=0, valid_from=valid_from,
            )
            return logits[:, -1, :], cache

        def _step(params, tokens, positions, cache, cache_pos, valid_from):
            logits, cache = fwd(
                params, tokens=tokens, positions=positions, cache=cache,
                cache_pos=cache_pos, valid_from=valid_from,
            )
            return logits[:, -1, :], cache

        donate = (3,) if donate_cache else ()
        self._prefill = jax.jit(_prefill, donate_argnums=donate)
        self._step = jax.jit(_step, donate_argnums=(3,) if donate_cache else ())

    def new_cache(self, batch: int) -> KVCache:
        return KVCache.create(self.cfg, batch, self.max_seq_len, self.kv_dtype)

    def prepare_batch(self, prompts: list[list[int]]):
        """Left-pad to a power-of-two bucket; returns device inputs."""
        B = len(prompts)
        lens = np.array([len(p) for p in prompts], np.int32)
        T = _bucket(int(lens.max()))
        tokens = np.zeros((B, T), np.int32)
        positions = np.zeros((B, T), np.int32)
        for i, p in enumerate(prompts):
            pad = T - len(p)
            tokens[i, pad:] = p
            positions[i, pad:] = np.arange(len(p))
        valid_from = T - lens
        return jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(valid_from), T, lens

    def generate(
        self,
        prompts: list[list[int]],
        max_new_tokens: int = 32,
        sampler=None,
        eos_id: int | None = None,
        return_logits: bool = False,
    ) -> GenerationResult:
        tokens, positions, valid_from, T, lens = self.prepare_batch(prompts)
        B = tokens.shape[0]
        if T + max_new_tokens > self.max_seq_len:
            raise ValueError(
                f"prompt bucket {T} + {max_new_tokens} new > max_seq_len {self.max_seq_len}"
            )
        cache = self.new_cache(B)
        logits, cache = self._prefill(self.params, tokens, positions, cache, valid_from)

        out = [[] for _ in range(B)]
        finished = np.zeros(B, bool)
        cur_pos = lens.copy()  # next real position per seq
        last_logits = None
        for t in range(max_new_tokens):
            if sampler is None:
                nxt = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
            else:
                nxt = sampler(np.asarray(logits))
            for i in range(B):
                if not finished[i]:
                    out[i].append(int(nxt[i]))
                    if eos_id is not None and nxt[i] == eos_id:
                        finished[i] = True
            last_logits = logits
            if finished.all() or t == max_new_tokens - 1:
                break
            step_tokens = jnp.asarray(nxt[:, None])
            step_positions = jnp.asarray(cur_pos[:, None].astype(np.int32))
            logits, cache = self._step(
                self.params, step_tokens, step_positions, cache,
                jnp.int32(T + t), valid_from,
            )
            cur_pos += 1
        return GenerationResult(
            tokens=out,
            logits=np.asarray(last_logits) if return_logits else None,
            n_prefill=int(lens.sum()),
            n_decode=sum(len(o) for o in out),
        )

    def logits_for(self, prompts: list[list[int]]) -> np.ndarray:
        """Last-position logits, no generation (testing/perplexity)."""
        tokens, positions, valid_from, T, lens = self.prepare_batch(prompts)
        cache = self.new_cache(tokens.shape[0])
        logits, _ = self._prefill(self.params, tokens, positions, cache, valid_from)
        return np.asarray(logits)
