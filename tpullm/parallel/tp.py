"""shard_map tensor-parallel engine (Megatron layout over a TPU mesh).

The reference's meta-device TP (ggml-backend-meta.cpp) hand-rolls split-state
propagation and inserts NCCL/butterfly all-reduces at PARTIAL boundaries.
TPU-native: weights are placed with NamedSharding (parallel/sharding.py
rules: qkv/gate-up column-split on lanes, wo/down row-split on K), the
forward runs under shard_map with explicit `psum` after each row-parallel
matmul (models/llama.py tp_axis), and XLA schedules the ICI collectives.

Inside shard_map every shard sees LOCAL arrays, so the fused Pallas kernels
run unchanged per shard (heads and ffn columns are divided; the config is
rewritten with local head counts).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.config import ModelConfig
from ..models.llama import KVCache, forward
from ..ops.qtensor import QTensor
from .sharding import param_pspecs, shard_params


def local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard config: heads and ffn divided by the tp degree."""
    assert cfg.n_head % tp == 0, (cfg.n_head, tp)
    assert cfg.n_head_kv % tp == 0, f"GQA kv heads {cfg.n_head_kv} % tp {tp}"
    return dataclasses.replace(
        cfg, n_head=cfg.n_head // tp, n_head_kv=cfg.n_head_kv // tp,
        n_ff=cfg.n_ff // tp,
    )


def _pspec_tree(params, mesh):
    """PartitionSpecs for the TP engine: embeddings/output replicated
    (take_rows and the lm_head stay shard-local), projections Megatron-split."""
    specs = param_pspecs(params, shard_embeddings=False)
    return specs


class TPEngine:
    """Tensor-parallel decode/prefill over a 1-D tp mesh axis.

    Usage: mesh = Mesh(devices, ("tp",)); eng = TPEngine(cfg, params, mesh).
    Params are placed with NamedSharding at construction; jitted steps run
    the forward in shard_map with local Pallas kernels + psum boundaries.
    """

    def __init__(self, cfg: ModelConfig, params: dict, mesh: Mesh,
                 max_seq_len: int = 1024, dtype=jnp.bfloat16):
        assert "tp" in mesh.axis_names
        layers = params["layers"]
        first = layers.get("__groups__", [layers])[0]
        assert "wqkv" not in first and "ffn_gateup" not in first, (
            "TPEngine needs unfused weights (load_model(..., fuse=False)): "
            "a fused QKV lane-split would interleave parts across shards")
        self.mesh = mesh
        self.tp = mesh.shape["tp"]
        self.cfg = cfg
        self.cfg_local = local_config(cfg, self.tp)
        # column-split weights shard the (lane-padded) n_out axis: splits must
        # land on head/column boundaries with no padding in the way
        for n, gran, what in (
            (cfg.n_head * cfg.head_dim, cfg.head_dim, "q proj"),
            (cfg.n_head_kv * cfg.head_dim, cfg.head_dim, "k proj"),
            (cfg.n_head_kv * cfg.head_dim_v, cfg.head_dim_v, "v proj"),
            (cfg.n_ff, 1, "ffn gate/up"),
        ):
            assert n % 256 == 0 and (n // self.tp) % gran == 0, (
                f"{what} n_out={n} not shardable over tp={self.tp} "
                "(needs n_out%256==0, padding-free lane splits; a "
                "shard-aware repack would lift this)")
        self.dtype = dtype
        self.max_seq_len = max_seq_len
        self.params = shard_params(params, mesh, shard_embeddings=False)
        self.pspecs = _pspec_tree(params, mesh)

        cfgl = self.cfg_local
        kv_spec = P(None, None, "tp", None, None)  # heads sharded

        def step(params, tokens, positions, cache, cache_pos, valid_from):
            logits, cache = forward(
                params, cfgl, tokens, positions, cache,
                cache_pos=cache_pos, valid_from=valid_from, dtype=dtype,
                tp_axis="tp",
            )
            return logits, cache

        rep = P()
        self._step = jax.jit(
            shard_map(
                step, mesh=mesh,
                in_specs=(self._param_specs(), rep, rep, KVCache(kv_spec, kv_spec),
                          rep, rep),
                out_specs=(rep, KVCache(kv_spec, kv_spec)),
                check_rep=False,
            ),
            donate_argnums=(3,),
        )

    def _param_specs(self):
        return self.pspecs

    def new_cache(self, batch: int) -> KVCache:
        cache = KVCache.create(self.cfg, batch, self.max_seq_len, self.dtype)
        spec = NamedSharding(self.mesh, P(None, None, None, "tp", None))
        return KVCache(jax.device_put(cache.k, spec), jax.device_put(cache.v, spec))

    def decode_step(self, tokens, positions, cache, cache_pos, valid_from):
        """tokens (B, T) -> (logits (B, T, vocab), cache). Replicated I/O."""
        return self._step(self.params, tokens, positions, cache,
                          cache_pos, valid_from)
