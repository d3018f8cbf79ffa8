"""Inference engine: jitted prefill + on-device multi-step decode.

The reference rebuilds a ggml graph every ubatch and reuses it when topology
matches (src/llama-context.cpp:1185 can_reuse). The XLA inversion: trace once
per (batch, seq-bucket) signature and let the compilation cache do graph
reuse; shapes are bucketed to powers of two to bound the number of compiles.

Decode runs CHUNKED ON DEVICE: a lax.scan advances `decode_chunk` tokens per
dispatch with the sampler chain in-graph (the reference's "backend sampler",
llama.h:381), so host<->device latency is amortized 1/chunk. EOS is detected
on host between chunks (slight overrun, bounded by chunk size).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import KVCache, forward
from ..ops.sampling import GREEDY, SamplerConfig, make_sample_fn


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclass
class GenerationResult:
    tokens: list[list[int]]
    logits: np.ndarray | None = None  # (B, vocab) logits after the prompt
    n_prefill: int = 0
    n_decode: int = 0


class InferenceEngine:
    """Single-model batch inference with on-device sampling."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: dict,
        max_seq_len: int = 1024,
        compute_dtype=jnp.bfloat16,
        kv_dtype=None,
        decode_chunk: int = 32,
        iswa: bool = False,  # dual SWA/full KV cache (gemma2/3 style)
        prefill_chunk: int = 128,  # iswa: bounds the ring size (W + chunk)
    ):
        self.cfg = cfg
        self.params = params
        self.max_seq_len = max_seq_len
        self.dtype = compute_dtype
        self.kv_dtype = kv_dtype or compute_dtype
        self.decode_chunk = decode_chunk
        from ..models.llama import swa_flags

        self.iswa = bool(iswa and any(swa_flags(cfg))
                         and self.kv_dtype not in ("q8", "int8"))
        self.prefill_chunk = prefill_chunk

        fwd = functools.partial(forward, cfg=cfg, dtype=compute_dtype)

        def _prefill(params, tokens, positions, cache, valid_from):
            logits, cache = fwd(
                params, tokens=tokens, positions=positions, cache=cache,
                cache_pos=0, valid_from=valid_from,
            )
            return logits[:, -1, :], cache

        self._prefill = jax.jit(_prefill, donate_argnums=(3,))

        def _prefill_at(params, tokens, positions, cache, valid_from, pos0):
            logits, cache = fwd(
                params, tokens=tokens, positions=positions, cache=cache,
                cache_pos=pos0, valid_from=valid_from,
            )
            return logits[:, -1, :], cache

        # iswa mode prefills in <= prefill_chunk pieces (the SWA ring only
        # holds window + chunk rows, so no single forward may write more)
        self._prefill_at = jax.jit(_prefill_at, donate_argnums=(3,))

        def _prefill_embeds(params, tokens, embeds, positions, cache, valid_from):
            logits, cache = fwd(
                params, tokens=tokens, positions=positions, cache=cache,
                cache_pos=0, valid_from=valid_from, embeds=embeds,
            )
            return logits[:, -1, :], cache

        # multimodal path: prompt rows arrive as embeddings (vision projector
        # output spliced between text rows, multimodal/mtmd.py embed_prompt)
        self._prefill_embeds = jax.jit(_prefill_embeds, donate_argnums=(4,))
        self._decode_fns: dict = {}
        self._sample_fns: dict = {}

    def _sample_fn(self, sampler: SamplerConfig):
        # cache the jitted first-token sampler: a fresh jax.jit wrapper per
        # generate() call would recompile (~0.8 s) every request
        fn = self._sample_fns.get(sampler)
        if fn is None:
            fn = jax.jit(make_sample_fn(sampler))
            self._sample_fns[sampler] = fn
        return fn

    def _decode_fn(self, sampler: SamplerConfig, chunk: int,
                   use_eos: bool = False, kv_view: int | None = None):
        key_ = (sampler, chunk, use_eos, kv_view)
        if key_ in self._decode_fns:
            return self._decode_fns[key_]
        fwd = functools.partial(forward, cfg=self.cfg, dtype=self.dtype,
                                kv_view_len=kv_view)
        sample = make_sample_fn(sampler)

        def _chunk(params, tok0, pos0, cache, slot0, valid_from, key,
                   eos_id=None):
            def step(carry):
                tok, cache, pos, slot, key, done = carry
                logits, cache = fwd(
                    params, tokens=tok[:, None], positions=pos[:, None],
                    cache=cache, cache_pos=slot, valid_from=valid_from,
                )
                key, sub = jax.random.split(key)
                nxt = sample(logits[:, -1, :], sub)
                if eos_id is not None:
                    done = done | (nxt == eos_id)
                return (nxt, cache, pos + 1, slot + 1, key, done)

            def body(carry, _):
                if eos_id is not None:
                    # once every row has sampled EOS the remaining scan
                    # iterations skip the whole layer stack (lax.cond does
                    # not execute the untaken branch, so no HBM stream);
                    # emitted tokens repeat the EOS — the host trims them
                    carry = jax.lax.cond(carry[-1].all(), lambda c: c, step,
                                         carry)
                else:
                    carry = step(carry)
                return carry, carry[0]

            done0 = jnp.zeros(tok0.shape, bool)
            (tok, cache, pos, slot, key, done), toks = jax.lax.scan(
                body, (tok0, cache, pos0, slot0, key, done0), None,
                length=chunk)
            return toks, cache  # toks: (chunk, B)

        if use_eos:
            fn = jax.jit(_chunk, donate_argnums=(3,))
        else:
            fn = jax.jit(functools.partial(_chunk, eos_id=None),
                         donate_argnums=(3,))
        self._decode_fns[key_] = fn
        return fn

    def new_cache(self, batch: int) -> KVCache:
        return KVCache.create(self.cfg, batch, self.max_seq_len, self.kv_dtype,
                              iswa=self.iswa, max_chunk=self.prefill_chunk)

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
        sampler: SamplerConfig | None = None,
        seed: int = 0,
        eos_id: int | None = None,
        return_logits: bool = False,
        embeds: list | None = None,  # per-prompt (T_i, n_embd) f32 or None
    ) -> GenerationResult:
        sampler = sampler or GREEDY
        tokens, positions, valid_from, T, lens = self.prepare_batch(prompts)
        B = tokens.shape[0]
        if T >= self.max_seq_len:
            raise ValueError(
                f"prompt bucket {T} >= max_seq_len {self.max_seq_len}")
        # clamp to the remaining room (the reference truncates generation at
        # the context limit rather than refusing the request)
        max_new_tokens = min(max_new_tokens, self.max_seq_len - T + 1)
        cache = self.new_cache(B)
        if self.iswa and embeds is None and T > self.prefill_chunk:
            # chunked prefill: each piece writes <= prefill_chunk rows so
            # the SWA ring (window + chunk) never wraps within one forward
            C = self.prefill_chunk
            logits = None
            for o in range(0, T, C):
                logits, cache = self._prefill_at(
                    self.params, tokens[:, o:o + C], positions[:, o:o + C],
                    cache, valid_from, jnp.int32(o))
        elif embeds is not None:
            emb = np.zeros((B, T, self.cfg.n_embd), np.float32)
            for i, e in enumerate(embeds):
                if e is None:  # text-only row: gather its rows host-side
                    e = np.asarray(self.params["tok_embd"].take_rows(
                        jnp.asarray(np.asarray(prompts[i], np.int32)),
                        jnp.float32), np.float32)
                assert e.shape[0] == len(prompts[i]), "embeds/prompt mismatch"
                emb[i, T - len(prompts[i]):] = e
            logits, cache = self._prefill_embeds(
                self.params, tokens, jnp.asarray(emb), positions, cache,
                valid_from)
        else:
            logits, cache = self._prefill(self.params, tokens, positions, cache, valid_from)
        first_logits = np.asarray(logits) if return_logits else None

        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        tok = self._sample_fn(sampler)(logits, sub)

        out_chunks = [np.asarray(tok)[None]]  # (1, B)
        produced = 1
        slot = T
        pos = jnp.asarray(lens.astype(np.int32))
        # fixed chunk size in steady state (variable chunks would recompile
        # per length); at the context edge shrink to power-of-two tail
        # chunks so the remaining room is still used (bounded compile set)
        while produced < max_new_tokens and slot < self.max_seq_len:
            room = self.max_seq_len - slot
            if room >= self.decode_chunk:
                chunk = self.decode_chunk
            else:
                chunk = 1 << (room.bit_length() - 1)  # largest pow2 <= room
            use_eos = eos_id is not None
            # bucket the attention view by the furthest slot this chunk
            # writes: the decode kernel's grid then scales with actual
            # depth, not max_seq_len (log2 many compiles, cached)
            need = slot + chunk
            kv_view = 512
            while kv_view < need:
                kv_view *= 2
            kv_view = min(kv_view, self.max_seq_len)
            fn = self._decode_fn(sampler, chunk, use_eos, kv_view)
            key, sub = jax.random.split(key)
            eos_arg = (jnp.int32(eos_id),) if use_eos else ()
            toks, cache = fn(self.params, tok, pos, cache, jnp.int32(slot),
                             valid_from, sub, *eos_arg)
            toks_np = np.asarray(toks)  # (chunk, B)
            out_chunks.append(toks_np)
            produced += chunk
            slot += chunk
            pos = pos + chunk
            tok = toks[-1]
            if eos_id is not None:
                flat = np.concatenate(out_chunks, axis=0)
                if all((flat[:, b] == eos_id).any() for b in range(B)):
                    break

        flat = np.concatenate(out_chunks, axis=0)  # (N, B)
        out: list[list[int]] = []
        for b in range(B):
            seq = flat[:, b].tolist()
            if eos_id is not None and eos_id in seq:
                seq = seq[: seq.index(eos_id) + 1]
            out.append(seq[:max_new_tokens])
        return GenerationResult(
            tokens=out,
            logits=first_logits,
            n_prefill=int(lens.sum()),
            n_decode=sum(len(o) for o in out),
        )

    def logits_for(self, prompts: list[list[int]]) -> np.ndarray:
        """Logits after the prompt's last token (testing/perplexity)."""
        tokens, positions, valid_from, T, lens = self.prepare_batch(prompts)
        cache = self.new_cache(tokens.shape[0])
        if self.iswa and T > self.prefill_chunk:
            C = self.prefill_chunk
            logits = None
            for o in range(0, T, C):
                logits, cache = self._prefill_at(
                    self.params, tokens[:, o:o + C], positions[:, o:o + C],
                    cache, valid_from, jnp.int32(o))
        else:
            logits, _ = self._prefill(self.params, tokens, positions, cache,
                                      valid_from)
        return np.asarray(logits)
