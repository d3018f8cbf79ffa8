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
        self._sample_fns: dict = {}

    def _sample_fn(self, sampler: SamplerConfig):
        fn = self._sample_fns.get(sampler)
        if fn is None:
            fn = jax.jit(make_sample_fn(sampler))
            self._sample_fns[sampler] = fn
        return fn

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
        key, sub = jax.random.split(key)
        tok = self._sample_fn(sampler)(logits, sub)

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


class RecurrentSlotMemory:
    """SlotMemory analogue for recurrent models (llama_memory_recurrent,
    src/llama-memory-recurrent.*): a fixed-size state bank per slot instead
    of KV rows (exposed as .cache so the server slot loop is shared).
    Prefix reuse is all-or-nothing (the state is a running
    summary — only a full continuation of the cached tokens can reuse it),
    and context never fills, so context_shift is a no-op."""

    def __init__(self, cfg: ModelConfig, n_slots: int,
                 max_seq_len: int = 1 << 30, kv_dtype=None,
                 family: str = "ssm"):
        from ..models.family import recurrent_ops
        from .memory import SlotState

        self.cfg = cfg
        self.n_slots = n_slots
        self.max_seq_len = max_seq_len
        self.family = family
        state_create, _ = recurrent_ops(family)
        self.cache = state_create(cfg, n_slots)
        self.slots = [SlotState() for _ in range(n_slots)]

        def _reset(state, i):
            z = jax.tree_util.tree_map(
                lambda a: a.at[:, i].set(jnp.zeros_like(a[:, i])), state)
            return z

        self._reset = jax.jit(_reset, donate_argnums=(0,))

        def _copy(state, src, dst):
            return jax.tree_util.tree_map(
                lambda a: a.at[:, dst].set(a[:, src]), state)

        self._copy = jax.jit(_copy, donate_argnums=(0,))

    def prefix_match(self, slot: int, tokens: list[int]) -> int:
        st = self.slots[slot]
        n = st.n_past
        if 0 < n < len(tokens) and st.tokens[:n] == tokens[:n]:
            return n  # exact continuation: state summarises tokens[:n]
        return 0

    def truncate(self, slot: int, n_keep: int):
        st = self.slots[slot]
        if n_keep < st.n_past:  # cannot rewind a running state: reset
            self.cache = self._reset(self.cache, jnp.int32(slot))
            st.n_past = 0
            st.tokens = []

    def clear_slot(self, slot: int):
        self.truncate(slot, 0)
        self.slots[slot].clear()

    def copy_slot(self, src: int, dst: int):
        self.cache = self._copy(self.cache, jnp.int32(src), jnp.int32(dst))
        self.slots[dst].n_past = self.slots[src].n_past
        self.slots[dst].tokens = list(self.slots[src].tokens)

    def context_shift(self, slot: int, n_keep: int, n_discard: int):
        pass  # recurrent context is unbounded

    # -- state IO (llama_state_seq_* analogue) ------------------------------

    def save_slot(self, slot: int) -> dict:
        st = self.slots[slot]
        leaves, _ = jax.tree_util.tree_flatten(self.cache)
        blob = {
            "version": 1,
            "kind": "recurrent",
            "tokens": np.asarray(st.tokens, np.int32),
            "n_past": np.int64(st.n_past),
        }
        # state leaves generically (batch is axis 1 for every recurrent
        # family: RecurrentState (L,B,...), RwkvState (L,B,...))
        for j, a in enumerate(leaves):
            # via jnp: np.asarray lacks a direct bf16->f32 cast path
            blob[f"leaf{j}"] = np.asarray(jnp.asarray(a[:, slot], jnp.float32))
        return blob

    def load_slot(self, slot: int, blob: dict) -> int:
        leaves, treedef = jax.tree_util.tree_flatten(self.cache)
        new = [a.at[:, slot].set(jnp.asarray(blob[f"leaf{j}"], a.dtype))
               for j, a in enumerate(leaves)]
        self.cache = jax.tree_util.tree_unflatten(treedef, new)
        st = self.slots[slot]
        st.tokens = [int(t) for t in blob["tokens"]]
        st.n_past = int(blob["n_past"])
        return st.n_past

    def save_slot_file(self, slot: int, path: str):
        np.savez(path, **self.save_slot(slot))

    def load_slot_file(self, slot: int, path: str) -> int:
        z = np.load(path)
        return self.load_slot(slot, {k: z[k] for k in z.files})

    # -------------------------------------------------- whole-context state

    def save_state(self) -> dict:
        """All slots' recurrent states + token prefixes in one blob
        (whole-context llama_state_get_data analogue for the recurrent
        memory, src/llama-memory-recurrent state IO)."""
        leaves, _ = jax.tree_util.tree_flatten(self.cache)
        blob = {"version": 2, "n_slots": np.int32(self.n_slots)}
        for j, a in enumerate(leaves):
            blob[f"leaf{j}"] = np.asarray(jnp.asarray(a, jnp.float32))
        for i, st in enumerate(self.slots):
            blob[f"slot{i}_tokens"] = np.asarray(st.tokens, np.int32)
            blob[f"slot{i}_n_past"] = np.int32(st.n_past)
        return blob

    def load_state(self, blob: dict) -> None:
        assert int(blob["version"]) == 2, "unsupported state version"
        assert int(blob["n_slots"]) == self.n_slots, "slot count mismatch"
        leaves, treedef = jax.tree_util.tree_flatten(self.cache)
        self.cache = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(blob[f"leaf{j}"], a.dtype)
                      for j, a in enumerate(leaves)])
        for i, st in enumerate(self.slots):
            st.tokens = [int(t) for t in blob[f"slot{i}_tokens"]]
            st.n_past = int(blob[f"slot{i}_n_past"])

    def save_state_file(self, path: str) -> None:
        np.savez(path, **self.save_state())

    def load_state_file(self, path: str) -> None:
        z = np.load(path)
        self.load_state({k: z[k] for k in z.files})


class HybridSlotMemory(RecurrentSlotMemory):
    """Slot memory for attention+recurrent hybrids (Jamba — the
    llama_memory_hybrid composition, src/llama-memory-hybrid.*).

    The state bank is a HybridState with batch axis 1 on every leaf, so
    all the generic slot machinery (reset/copy/state IO as tree leaves)
    is inherited. Prefix reuse stays all-or-nothing — the recurrent half
    cannot rewind — and context cannot shift: when the KV half fills, the
    generation ends (the reference refuses context-shift for hybrid
    memory too)."""

    def __init__(self, cfg, n_slots: int, max_seq_len: int, kv_dtype=None):
        import jax.numpy as _jnp

        from ..models.hybrid import HybridState
        from .memory import SlotState

        self.cfg = cfg
        self.n_slots = n_slots
        self.max_seq_len = max_seq_len
        self.family = "hybrid"
        self.cache = HybridState.create(cfg, n_slots, max_seq_len,
                                        kv_dtype or _jnp.bfloat16)
        self.slots = [SlotState() for _ in range(n_slots)]

        def _reset(state, i):
            return jax.tree_util.tree_map(
                lambda a: a.at[:, i].set(jnp.zeros_like(a[:, i])), state)

        self._reset = jax.jit(_reset, donate_argnums=(0,))

        def _copy(state, src, dst):
            return jax.tree_util.tree_map(
                lambda a: a.at[:, dst].set(a[:, src]), state)

        self._copy = jax.jit(_copy, donate_argnums=(0,))
