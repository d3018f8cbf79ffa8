"""Multi-host SPMD serving loop (SURVEY §2.12).

The reference spans nodes with a byte-level RPC offload protocol
(tools/rpc, ggml-rpc.cpp). The TPU-native shape is SPMD: every host runs
THIS loop in lockstep over a global mesh; the coordinator (process 0)
owns the request queue and an HTTP frontend, and each iteration it
broadcasts a small control message (op + shapes) plus token payloads so
all hosts issue identical jitted steps. Collectives ride ICI within a
slice and DCN across slices; the control plane is one
`broadcast_from_coordinator` per step, not a custom wire protocol.

Ops: IDLE (heartbeat), PREFILL (tokens follow), DECODE (n steps of
greedy decode with sampling replicated on every host — logits are
replicated, so every host samples the same token without an extra
broadcast), STOP (leave the loop).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

OP_IDLE, OP_PREFILL, OP_DECODE, OP_STOP = 0, 1, 2, 3


class MultiHostEngine:
    """Lockstep SPMD engine: construct on EVERY host with the same model
    (each host loads the checkpoint itself), then either call the
    collective `generate()` from all hosts, or run `serve(tasks)` on the
    coordinator while the others run `follow()`.
    """

    def __init__(self, cfg, params, mesh, max_seq_len: int = 256,
                 compute_dtype=jnp.float32, max_prompt: int = 128):
        from functools import partial

        from ..models.llama import KVCache, forward
        from ..parallel.sharding import shard_params

        self.cfg = cfg
        self.mesh = mesh
        self.max_seq_len = max_seq_len
        self.max_prompt = max_prompt
        self.dtype = compute_dtype
        self.params = shard_params(params, mesh)
        self.is_coordinator = jax.process_index() == 0

        fwd = partial(forward, cfg=cfg, dtype=compute_dtype)

        def _prefill(params, tokens, positions, cache, valid_from, last):
            logits, cache = fwd(params, tokens=tokens, positions=positions,
                                cache=cache, cache_pos=0,
                                valid_from=valid_from, logits_idx=last)
            return logits[:, 0, :], cache

        def _decode(params, tok, pos, cache, valid_from):
            logits, cache = fwd(params, tokens=tok[:, None],
                                positions=pos[:, None], cache=cache,
                                cache_pos=pos, valid_from=valid_from)
            return logits[:, -1, :], cache

        self._prefill = jax.jit(_prefill, donate_argnums=(3,))
        self._decode = jax.jit(_decode, donate_argnums=(3,))
        self._cache = None

    def _bcast(self, arr):
        from ..parallel.distributed import broadcast_from_coordinator

        return broadcast_from_coordinator(np.asarray(arr))

    def _g(self, a, spec=None):
        """Host-identical value -> global (replicated or sharded) array."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(a, NamedSharding(self.mesh, spec or P()))

    def _new_cache(self):
        from jax.sharding import PartitionSpec as P

        from ..models.llama import KVCache

        cache = KVCache.create(self.cfg, 1, self.max_seq_len, self.dtype)
        # single-sequence serving: KV heads shard over tp, batch replicated
        spec = P(None, None, "tp", None, None)
        return jax.tree_util.tree_map(
            lambda a: self._g(np.asarray(a), spec), cache)

    # ---- collective API: call from every host with identical flow ----

    def generate(self, prompt, max_new_tokens: int = 16):
        """Collective greedy generate. Only the coordinator's `prompt` is
        used; every host returns the same token list."""
        n = np.zeros(1, np.int32)
        if self.is_coordinator:
            n[0] = len(prompt)
        n = int(self._bcast(n)[0])
        buf = np.zeros(self.max_prompt, np.int32)
        if self.is_coordinator:
            buf[: len(prompt)] = prompt
        toks = self._bcast(buf)[:n]
        return self._run(toks, max_new_tokens)

    def _run(self, prompt: np.ndarray, max_new_tokens: int):
        n0 = len(prompt)
        Tb = 32
        while Tb < n0:
            Tb *= 2
        tokens = np.zeros((1, Tb), np.int32)
        tokens[0, :n0] = prompt
        positions = np.arange(Tb, dtype=np.int32)[None]
        vf = self._g(np.zeros((1,), np.int32))
        with self.mesh:
            cache = self._new_cache()
            logits, cache = self._prefill(
                self.params, self._g(tokens), self._g(positions),
                cache, vf, n0 - 1)
            out = [int(np.asarray(logits)[0].argmax())]
            pos = n0
            while len(out) < max_new_tokens and pos + 1 < self.max_seq_len:
                logits, cache = self._decode(
                    self.params, self._g(np.asarray([out[-1]], np.int32)),
                    self._g(np.asarray([pos], np.int32)), cache, vf)
                out.append(int(np.asarray(logits)[0].argmax()))
                pos += 1
        return out

    # ---- op-loop API: coordinator serves, the others follow ----

    def serve(self, tasks) -> list:
        """Coordinator: run each (prompt, max_new_tokens) task through the
        op loop, then broadcast STOP. Returns the per-task outputs."""
        assert self.is_coordinator
        results = []
        for prompt, mnt in tasks:
            self._bcast(np.asarray([OP_PREFILL, mnt], np.int32))
            results.append(self.generate(prompt, mnt))
        self._bcast(np.asarray([OP_STOP, 0], np.int32))
        return results

    def follow(self) -> int:
        """Non-coordinator hosts: execute broadcast ops until STOP.
        Returns the number of tasks served."""
        assert not self.is_coordinator
        served = 0
        while True:
            msg = self._bcast(np.zeros(2, np.int32))
            op, mnt = int(msg[0]), int(msg[1])
            if op == OP_STOP:
                return served
            if op == OP_PREFILL:
                self.generate(None, mnt)
                served += 1
