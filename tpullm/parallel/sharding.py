"""Mesh + GSPMD sharding rules for model params and KV cache.

This is the TPU-native replacement for the reference's meta-device tensor
parallelism (ggml/src/ggml-backend-meta.cpp: per-tensor split-state {axis,
MIRRORED, PARTIAL} + hand-rolled propagation and allreduce insertion,
SURVEY §2.12). Here the split state is a NamedSharding per weight; XLA GSPMD
propagates layouts and inserts the ICI collectives the meta backend hand-codes
(allreduce at PARTIAL boundaries == psum after row-sharded matmuls).

Megatron-style layout: column-parallel QKV/gate/up (shard n_out), row-parallel
wo/down (shard n_in) so each layer needs a single all-reduce per block pair.
KV cache shards over heads; batch over the data axis.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.qtensor import QTensor


def make_mesh(n_devices: int | None = None, tp: int | None = None, dp: int | None = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if tp is None:
        tp = n if dp is None else n // dp
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp {dp} * tp {tp} != {n}"
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


# params-key -> PartitionSpec for the *logical* weight (layer axis first for
# stacked layer tensors). "out" = shard output rows (column-parallel),
# "in" = shard input/reduction dim (row-parallel).
_LAYER_RULES: dict[str, str] = {
    "wq": "out",
    "wk": "out",
    "wv": "out",
    "wqkv": "out",
    "ffn_gateup": "out",
    "wo": "in",
    "bq": "out_vec",
    "bk": "out_vec",
    "bv": "out_vec",
    "bo": "rep",
    "ffn_gate": "out",
    "ffn_up": "out",
    "ffn_down": "in",
    "moe_gate_inp": "rep",
    "moe_gate_exps": "exp_out",
    "moe_up_exps": "exp_out",
    "moe_down_exps": "exp_in",
    "ffn_gate_shexp": "out",
    "ffn_up_shexp": "out",
    "ffn_down_shexp": "in",
}


def _qtensor_pspec(qt: QTensor, kind: str, stacked: bool) -> dict[str, P]:
    """PartitionSpec per quantized leaf.

    kmajor layout (the kernel layout): leaves q/sc/bi are (L?, K', Npad) —
    n_out lives on the last (lane) axis, the reduction dim on axis -2.

    planar layout: quants (L?, n_out, nb, bytes...), scales (L?, n_out, nb);
    n_out = axis 0 (+1 if stacked), n_in = the nb axis.
    """
    specs = {}
    off = 1 if stacked else 0
    kmajor = qt.layout == "kmajor"
    for key, arr in qt.data.items():
        nd = np.asarray(arr).ndim if not hasattr(arr, "ndim") else arr.ndim
        spec = [None] * nd
        if kmajor:
            if kind in ("out", "exp_out"):
                spec[nd - 1] = "tp"
            elif kind in ("in", "exp_in"):
                spec[nd - 2] = "tp"
        elif kind in ("out", "exp_out"):
            spec[off + (1 if kind == "exp_out" else 0)] = "tp"
        elif kind in ("in", "exp_in"):
            # reduction dim = blocks axis: quants (L?, rows..., nb, k) or (L?, rows, nb)
            spec[off + (2 if kind == "exp_in" else 1)] = "tp"
        specs[key] = P(*spec)
    return specs


def param_pspecs(params: dict, shard_embeddings: bool = True) -> dict:
    """Pytree of PartitionSpecs matching the params structure."""

    def qspec(qt: QTensor, kind: str, stacked: bool):
        specs = _qtensor_pspec(qt, kind, stacked)
        keys = tuple(sorted(qt.data))
        return QTensor(qt.qtype, qt.shape, {k: specs[k] for k in keys})

    out: dict = {}
    for name, val in params.items():
        if name == "layers":
            lay = {}
            for k, v in val.items():
                kind = _LAYER_RULES.get(k, "rep")
                if isinstance(v, QTensor):
                    lay[k] = qspec(v, kind, stacked=True)
                elif kind == "out_vec":
                    lay[k] = P(None, "tp")
                else:
                    lay[k] = P(*([None] * v.ndim))
            out[name] = lay
        elif isinstance(val, QTensor):
            kind = "out" if shard_embeddings and name in ("tok_embd", "output") else "rep"
            out[name] = qspec(val, kind, stacked=False)
        else:
            out[name] = P(*([None] * val.ndim))
    return out


def shard_params(params: dict, mesh: Mesh, shard_embeddings: bool = True) -> dict:
    """device_put every leaf with its NamedSharding (weights land sharded)."""
    specs = param_pspecs(params, shard_embeddings)

    def _place(p, s):
        return jax.device_put(p, NamedSharding(mesh, s))

    def _walk(pv, sv):
        if isinstance(pv, QTensor):
            return QTensor(
                pv.qtype, pv.shape,
                {k: _place(pv.data[k], sv.data[k]) for k in pv.data},
            )
        if isinstance(pv, dict):
            return {k: _walk(pv[k], sv[k]) for k in pv}
        return _place(pv, sv)

    return _walk(params, specs)


def kv_cache_pspec() -> P:
    """KV cache (L, B, S, H_kv, D): batch on dp, heads on tp."""
    return P(None, "dp", None, "tp", None)
