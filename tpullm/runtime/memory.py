"""Slot-based KV memory for the serving engine.

The reference's memory module (src/llama-memory.h:46-120, llama-kv-cache.*)
manages a unified cell pool with per-cell seq bookkeeping because CPU/GPU
graphs are rebuilt per ubatch. The TPU-native inversion: one preallocated
device KV pair (L, n_slots, S_max, H_kv, D) with *contiguous* per-slot
regions (slot == sequence), host-side metadata (lengths + token history),
and jitted in-place updates. Static shapes mean zero recompiles; "finding a
slot" is a host-side free-list pop instead of a cell scan (find_slot,
src/llama-kv-cache.h:185).

Supported sequence ops (llama_memory_i parity):
- clear / remove-suffix (truncate)      <- seq_rm(p0, -1)
- context_shift(n_keep, n_discard)      <- seq_rm + seq_add + K rope-shift on
  device (build_graph_shift analogue, src/llama-kv-cache.cpp:1800)
- prefix reuse: longest common prefix with the slot's previous content
  (server-side cache_prompt, tools/server/server-context.cpp:2309)
- copy_slot (seq_cp; whole-sequence copy for speculative/branching)
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import KVCache, rope_cache, apply_rope


@dataclass
class SlotState:
    n_past: int = 0  # tokens currently materialized in the cache
    tokens: list = field(default_factory=list)  # token history (prompt+gen)

    def clear(self):
        self.n_past = 0
        self.tokens = []


class SlotMemory:
    """Host bookkeeping + device KV arrays for n_slots sequences."""

    def __init__(self, cfg: ModelConfig, n_slots: int, max_seq_len: int,
                 kv_dtype=jnp.bfloat16, iswa: bool = False,
                 max_chunk: int = 0):
        self.cfg = cfg
        self.n_slots = n_slots
        self.max_seq_len = max_seq_len
        # iswa: SWA layers get a (window + max_chunk) ring bank instead of
        # full-context rows (llama_kv_cache_iswa, src/llama-kv-cache-iswa.h:14)
        self.cache = KVCache.create(cfg, n_slots, max_seq_len, kv_dtype,
                                    iswa=iswa, max_chunk=max_chunk)
        self.slots = [SlotState() for _ in range(n_slots)]
        self._shift_fn = jax.jit(
            functools.partial(_context_shift, cfg=cfg), donate_argnums=(0,))

    # -- host-side sequence bookkeeping ------------------------------------

    def prefix_match(self, slot: int, tokens: list[int]) -> int:
        """Longest reusable prefix of `tokens` already in the slot's cache.
        Leaves at least one token to (re)decode so logits exist."""
        st = self.slots[slot]
        n = 0
        limit = min(st.n_past, len(tokens) - 1)
        hist = st.tokens
        while n < limit and n < len(hist) and hist[n] == tokens[n]:
            n += 1
        if n and self.cache.dual:
            # iSWA ring validity: continuing from n reads SWA window rows
            # [n-W, n); a ring row for position p survives only while no
            # later position p+ring has been written (reference analogue:
            # llama_kv_cache_iswa::seq_rm fails on non-suffix removal and
            # the server falls back to reprocessing)
            oldest = max(0, n - self.cfg.sliding_window)
            if oldest + self.cache.ring < st.n_past:
                return 0
        return n

    def truncate(self, slot: int, n_keep: int):
        """seq_rm(slot, n_keep, -1): drop cached tokens >= n_keep."""
        st = self.slots[slot]
        st.n_past = min(st.n_past, n_keep)
        st.tokens = st.tokens[:n_keep]

    def clear_slot(self, slot: int):
        self.slots[slot].clear()

    def copy_slot(self, src: int, dst: int):
        """seq_cp whole-sequence: device rows dst <- src + host metadata."""
        self.cache = _copy_slot(self.cache, jnp.int32(src), jnp.int32(dst))
        self.slots[dst].n_past = self.slots[src].n_past
        self.slots[dst].tokens = list(self.slots[src].tokens)

    # -- state serialization (llama_state_seq_* analogue, llama.h:770-884) --

    def save_slot(self, slot: int) -> dict:
        """Snapshot a sequence: tokens + its KV rows (host numpy)."""
        st = self.slots[slot]
        n = st.n_past
        blob = {
            "version": 2,
            "tokens": np.asarray(st.tokens[:n], np.int32),
        }
        if self.cache.quantized:
            # RAW int8 rows + scales: a quantize->dequantize round trip
            # would be lossy; the reference preserves cache bytes too
            # (llama_state_seq_get_data)
            blob["kq"] = np.asarray(self.cache.k[:, slot, :, :n], np.int8)
            blob["vq"] = np.asarray(self.cache.v[:, slot, :, :n], np.int8)
            blob["ks"] = np.asarray(self.cache.ks[:, slot, :, :n], np.float32)
            blob["vs"] = np.asarray(self.cache.vs[:, slot, :, :n], np.float32)
        else:
            # f32 on disk: npz cannot round-trip ml_dtypes bfloat16
            blob["k"] = np.asarray(self.cache.k[:, slot, :, :n], np.float32)
            blob["v"] = np.asarray(self.cache.v[:, slot, :, :n], np.float32)
        if self.cache.dual:  # iSWA: the SWA layers' ring plane, raw
            blob["kw"] = np.asarray(self.cache.kw[:, slot], np.float32)
            blob["vw"] = np.asarray(self.cache.vw[:, slot], np.float32)
            blob["ring"] = np.int32(self.cache.ring)
        return blob

    def load_slot(self, slot: int, blob: dict) -> int:
        """Restore a snapshot into a slot; returns n_past restored."""
        assert int(blob.get("version", 1)) in (1, 2)
        toks = [int(t) for t in blob["tokens"]]
        n = len(toks)
        if n > self.max_seq_len:
            raise ValueError(f"snapshot {n} tokens > max_seq_len {self.max_seq_len}")
        if self.cache.quantized:
            if "kq" in blob:  # v2: raw int8 rows + scales (bit-exact)
                kq = jnp.asarray(blob["kq"], jnp.int8)
                vq = jnp.asarray(blob["vq"], jnp.int8)
                ksc = jnp.asarray(blob["ks"], jnp.float32)
                vsc = jnp.asarray(blob["vs"], jnp.float32)
            else:  # v1 back-compat: requantize dequantized rows
                from ..models.llama import _kv_quant

                kq, ksc = _kv_quant(jnp.asarray(blob["k"], jnp.float32))
                vq, vsc = _kv_quant(jnp.asarray(blob["v"], jnp.float32))
            self.cache = KVCache(
                self.cache.k.at[:, slot, :, :n].set(kq),
                self.cache.v.at[:, slot, :, :n].set(vq),
                self.cache.ks.at[:, slot, :, :n].set(ksc),
                self.cache.vs.at[:, slot, :, :n].set(vsc),
            )
        else:
            k = jnp.asarray(blob["k"], self.cache.k.dtype)
            v = jnp.asarray(blob["v"], self.cache.v.dtype)
            kw, vw, ring = self.cache.kw, self.cache.vw, self.cache.ring
            if self.cache.dual:
                if "kw" not in blob or int(blob["ring"]) != ring:
                    raise ValueError("snapshot iSWA ring mismatch")
                kw = kw.at[:, slot].set(jnp.asarray(blob["kw"], kw.dtype))
                vw = vw.at[:, slot].set(jnp.asarray(blob["vw"], vw.dtype))
            self.cache = KVCache(
                self.cache.k.at[:, slot, :, :n].set(k),
                self.cache.v.at[:, slot, :, :n].set(v),
                kw=kw, vw=vw, ring=ring,
            )
        st = self.slots[slot]
        st.tokens = toks
        st.n_past = n
        return n

    def save_slot_file(self, slot: int, path: str):
        np.savez(path, **self.save_slot(slot))

    def load_slot_file(self, slot: int, path: str) -> int:
        z = np.load(path)
        return self.load_slot(slot, {k: z[k] for k in z.files} | {"version": 1})

    # -------------------------------------------------- whole-context state

    def save_state(self) -> dict:
        """Serialize ALL slots + caches into one blob (the whole-context
        llama_state_get_data analogue, include/llama.h:770-800). Quantized
        caches save raw int8 + scales (no dequant round-trip)."""
        blob = {
            "version": 3,  # v3: head-major (L, B, Hkv, S, D) cache layout
            "n_slots": np.int32(self.n_slots),
            "max_len": np.int32(self.max_seq_len),
            "k": np.asarray(self.cache.k.astype(jnp.float32)
                            if self.cache.k.dtype != jnp.int8 else self.cache.k),
            "v": np.asarray(self.cache.v.astype(jnp.float32)
                            if self.cache.v.dtype != jnp.int8 else self.cache.v),
        }
        if self.cache.quantized:
            blob["ks"] = np.asarray(self.cache.ks)
            blob["vs"] = np.asarray(self.cache.vs)
        if self.cache.dual:
            blob["kw"] = np.asarray(self.cache.kw.astype(jnp.float32))
            blob["vw"] = np.asarray(self.cache.vw.astype(jnp.float32))
            blob["ring"] = np.int32(self.cache.ring)
        for i, st in enumerate(self.slots):
            blob[f"slot{i}_tokens"] = np.asarray(st.tokens, np.int32)
            blob[f"slot{i}_n_past"] = np.int32(st.n_past)
        return blob

    def load_state(self, blob: dict) -> None:
        """Restore a save_state() blob (llama_state_set_data). Shapes must
        match the running configuration."""
        assert int(blob["version"]) == 3, "unsupported state version"
        assert int(blob["n_slots"]) == self.n_slots, "slot count mismatch"
        assert int(blob["max_len"]) == self.max_seq_len, "context size mismatch"
        assert tuple(blob["k"].shape) == tuple(self.cache.k.shape), \
            "cache layout mismatch"
        k = jnp.asarray(blob["k"], self.cache.k.dtype)
        v = jnp.asarray(blob["v"], self.cache.v.dtype)
        if self.cache.quantized:
            self.cache = KVCache(k, v, jnp.asarray(blob["ks"]),
                                 jnp.asarray(blob["vs"]))
        elif self.cache.dual:
            if "kw" not in blob or int(blob["ring"]) != self.cache.ring:
                raise ValueError("state iSWA ring mismatch")
            self.cache = KVCache(
                k, v,
                kw=jnp.asarray(blob["kw"], self.cache.kw.dtype),
                vw=jnp.asarray(blob["vw"], self.cache.vw.dtype),
                ring=self.cache.ring)
        else:
            self.cache = KVCache(k, v)
        for i, st in enumerate(self.slots):
            st.tokens = [int(t) for t in blob[f"slot{i}_tokens"]]
            st.n_past = int(blob[f"slot{i}_n_past"])

    def save_state_file(self, path: str) -> None:
        """Session file (llama_state_save_file): one npz holding the whole
        serving context; reload with load_state_file to resume with all
        prefix caches warm."""
        np.savez(path, **self.save_state())

    def load_state_file(self, path: str) -> None:
        z = np.load(path)
        self.load_state({k: z[k] for k in z.files})

    def context_shift(self, slot: int, n_keep: int, n_discard: int):
        """Discard tokens [n_keep, n_keep+n_discard); roll the tail left and
        rope-shift cached K by -n_discard (on device)."""
        st = self.slots[slot]
        n_past = st.n_past
        assert n_keep + n_discard <= n_past
        if self.cache.dual:
            # iSWA ring rows are keyed by pos % ring; a shift changes every
            # kept position, so the ring cannot be rolled in place — callers
            # must reprocess (the reference refuses SWA-cache seq_add too)
            raise RuntimeError("context_shift unsupported on an iSWA cache")
        self.cache = self._shift_fn(
            self.cache, jnp.int32(slot), jnp.int32(n_keep),
            jnp.int32(n_discard), jnp.int32(n_past),
        )
        st.tokens = st.tokens[:n_keep] + st.tokens[n_keep + n_discard:]
        st.n_past = n_past - n_discard


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_slot(cache: KVCache, src, dst):
    def cp(buf):
        if buf is None:
            return None
        row = jax.lax.dynamic_slice_in_dim(buf, src, 1, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(buf, row, dst, axis=1)

    return KVCache(cp(cache.k), cp(cache.v), cp(cache.ks), cp(cache.vs),
                   cp(cache.kw), cp(cache.vw), ring=cache.ring)


def _context_shift(cache: KVCache, slot, n_keep, n_discard, n_past, *, cfg):
    """Roll rows [n_keep+nd, n_past) to [n_keep, n_past-nd) for one slot and
    apply the RoPE delta rotation theta(-nd) to the moved K rows.

    The cache is head-major (L, B, Hkv, S, D); the slot slice is transposed
    to seq-major here (a rare maintenance op — the shift itself is the
    expensive part) so the roll/rotate logic runs on (L, 1, S, H, D)."""
    S = cache.max_len
    idx = jnp.arange(S)
    moved = (idx >= n_keep) & (idx < n_past - n_discard)
    src = jnp.where(moved, idx + n_discard, idx)

    def _slot_sm(buf):  # (L, B, Hkv, S, D) -> seq-major (L, 1, S, Hkv, D)
        return jax.lax.dynamic_slice_in_dim(
            buf, slot, 1, axis=1).transpose(0, 1, 3, 2, 4)

    k_slot = _slot_sm(cache.k)
    v_slot = _slot_sm(cache.v)
    if cache.quantized:  # dequantize this slot, shift in float, requantize
        ks = jnp.take(jax.lax.dynamic_slice_in_dim(
            cache.ks, slot, 1, axis=1).transpose(0, 1, 3, 2), src, axis=2)
        vs = jnp.take(jax.lax.dynamic_slice_in_dim(
            cache.vs, slot, 1, axis=1).transpose(0, 1, 3, 2), src, axis=2)
        k_slot = (k_slot.astype(jnp.float32))
        v_slot = (v_slot.astype(jnp.float32))
    k_rolled = jnp.take(k_slot, src, axis=2)
    v_rolled = jnp.take(v_slot, src, axis=2)
    if cache.quantized:
        k_rolled = k_rolled * ks[..., None]
        v_rolled = v_rolled * vs[..., None]

    # RoPE delta: rotating a post-rope K from position p to p-nd multiplies
    # by the rotation at angle (-nd) — constant across rows.
    L, _, _, H, D = k_rolled.shape
    delta = (-n_discard).astype(jnp.float32) * jnp.ones((1, 1), jnp.float32)
    cos, sin = rope_cache(cfg, delta)  # (1,1,half)
    kr = k_rolled.reshape(L, S, H, D).astype(jnp.bfloat16)
    cosS = jnp.broadcast_to(cos, (1, S, cos.shape[-1]))
    sinS = jnp.broadcast_to(sin, (1, S, sin.shape[-1]))

    def rot_layer(k_l):
        return apply_rope(k_l[None], cosS, sinS, cfg.rope_type, cfg.rope_dim)[0]

    def upd(buf, val):
        # val seq-major (L, S, H, ...) -> head-major slot row
        vt = (val.transpose(0, 2, 1, 3) if val.ndim == 4
              else val.transpose(0, 2, 1))[:, None]
        return jax.lax.dynamic_update_slice_in_dim(buf, vt, slot, axis=1)

    if cache.quantized:
        from ..models.llama import _kv_quant

        k_shifted = jax.vmap(rot_layer)(kr).astype(jnp.float32)
        k_new = jnp.where(moved[None, :, None, None], k_shifted,
                          k_rolled.reshape(L, S, H, D))
        kq, ksc = _kv_quant(k_new)
        vq, vsc = _kv_quant(v_rolled.reshape(L, S, H, -1))
        return KVCache(upd(cache.k, kq), upd(cache.v, vq),
                       upd(cache.ks, ksc), upd(cache.vs, vsc))
    k_shifted = jax.vmap(rot_layer)(kr).astype(cache.k.dtype)
    k_new = jnp.where(moved[None, :, None, None], k_shifted, k_rolled.reshape(L, S, H, D))
    return KVCache(
        upd(cache.k, k_new),
        upd(cache.v, v_rolled.reshape(L, S, H, -1).astype(cache.v.dtype)),
    )
