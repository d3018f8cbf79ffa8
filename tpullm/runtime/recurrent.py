"""Batch inference engine for recurrent (Mamba/SSM) models.

Counterpart of the reference's recurrent-memory serving path
(llama_memory_recurrent, src/llama-memory-recurrent.*): the per-sequence
state is a fixed-size pytree instead of a growing KV cache, so decode cost
is length-independent and the "cache" never fills.

Mirrors InferenceEngine's API (prepare_batch / generate / logits_for) with
the same chunked on-device decode: a lax.scan advances `decode_chunk` tokens
per dispatch with sampling in-graph.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.mamba import RecurrentState, forward
from ..ops.sampling import GREEDY, SamplerConfig, make_sample_fn
from .engine import GenerationResult, _bucket


class RecurrentEngine:
    def __init__(self, cfg: ModelConfig, params: dict,
                 compute_dtype=jnp.bfloat16, decode_chunk: int = 32):
        self.cfg = cfg
        self.params = params
        self.dtype = compute_dtype
        self.decode_chunk = decode_chunk

        fwd = functools.partial(forward, cfg=cfg, dtype=compute_dtype)

        def _prefill(params, tokens, state, valid_from):
            logits, state = fwd(params, tokens=tokens, state=state,
                                valid_from=valid_from,
                                logits_idx=tokens.shape[1] - 1)
            return logits[:, -1, :], state

        self._prefill = jax.jit(_prefill, donate_argnums=(2,))
        self._decode_fns: dict = {}

    def _decode_fn(self, sampler: SamplerConfig, chunk: int):
        key_ = (sampler, chunk)
        if key_ in self._decode_fns:
            return self._decode_fns[key_]
        fwd = functools.partial(forward, cfg=self.cfg, dtype=self.dtype)
        sample = make_sample_fn(sampler)

        def _chunk(params, tok0, state, key):
            def body(carry, _):
                tok, state, key = carry
                logits, state = fwd(params, tokens=tok[:, None], state=state)
                key, sub = jax.random.split(key)
                nxt = sample(logits[:, -1, :], sub)
                return (nxt, state, key), nxt

            (tok, state, key), toks = jax.lax.scan(
                body, (tok0, state, key), None, length=chunk)
            return toks, state

        fn = jax.jit(_chunk, donate_argnums=(2,))
        self._decode_fns[key_] = fn
        return fn

    def prepare_batch(self, prompts: list[list[int]]):
        B = len(prompts)
        lens = np.array([len(p) for p in prompts], np.int32)
        T = _bucket(int(lens.max()))
        tokens = np.zeros((B, T), np.int32)
        for i, p in enumerate(prompts):
            tokens[i, T - len(p):] = p  # left-pad (recurrence masks pads)
        valid_from = T - lens
        return jnp.asarray(tokens), jnp.asarray(valid_from), T, lens

    def generate(self, prompts, max_new_tokens: int = 32,
                 sampler: SamplerConfig | None = None, seed: int = 0,
                 eos_id: int | None = None,
                 return_logits: bool = False) -> GenerationResult:
        sampler = sampler or GREEDY
        tokens, valid_from, T, lens = self.prepare_batch(prompts)
        B = tokens.shape[0]
        state = RecurrentState.create(self.cfg, B)
        logits, state = self._prefill(self.params, tokens, state, valid_from)
        first_logits = np.asarray(logits) if return_logits else None

        key = jax.random.PRNGKey(seed)
        sample = make_sample_fn(sampler)
        key, sub = jax.random.split(key)
        tok = jax.jit(sample)(logits, sub)

        out_chunks = [np.asarray(tok)[None]]
        produced = 1
        while produced < max_new_tokens:
            fn = self._decode_fn(sampler, self.decode_chunk)
            key, sub = jax.random.split(key)
            toks, state = fn(self.params, tok, state, sub)
            toks_np = np.asarray(toks)
            out_chunks.append(toks_np)
            produced += self.decode_chunk
            tok = toks[-1]
            if eos_id is not None:
                flat = np.concatenate(out_chunks, axis=0)
                if all((flat[:, b] == eos_id).any() for b in range(B)):
                    break

        flat = np.concatenate(out_chunks, axis=0)
        out: list[list[int]] = []
        for b in range(B):
            seq = flat[:, b].tolist()
            if eos_id is not None and eos_id in seq:
                seq = seq[: seq.index(eos_id) + 1]
            out.append(seq[:max_new_tokens])
        return GenerationResult(tokens=out, logits=first_logits,
                                n_prefill=int(lens.sum()),
                                n_decode=sum(len(o) for o in out))

    def logits_for(self, prompts) -> np.ndarray:
        tokens, valid_from, T, lens = self.prepare_batch(prompts)
        state = RecurrentState.create(self.cfg, tokens.shape[0])
        logits, _ = self._prefill(self.params, tokens, state, valid_from)
        return np.asarray(logits)
