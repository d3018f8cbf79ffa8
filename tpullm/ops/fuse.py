"""Weight fusion: concatenate kmajor QTensors along the output (lane) axis.

The reference fuses QKV/gate-up where models ship them fused and its meta-TP
tracks multi-segment split tensors (ggml-backend.h:376-390 fused-QKV
support). Here fusion is a load-time transform: one fused kernel launch
replaces 2-3, cutting per-layer dispatch overhead and letting the MXU see a
wider N tile. Each part keeps its own 256-padded lane range, so output
offsets are deterministic from the logical sizes (no metadata carried).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .qtensor import QTensor


def pad256(n: int) -> int:
    return (n + 255) // 256 * 256


def fused_offsets(sizes: list[int]) -> list[int]:
    offs, o = [], 0
    for s in sizes:
        offs.append(o)
        o += pad256(s)
    return offs


def can_fuse(qts: list[QTensor]) -> bool:
    if not qts or any(q is None for q in qts):
        return False
    t0 = qts[0]
    return all(
        q.layout == "kmajor"
        and q.qtype == t0.qtype
        and q.shape[-1] == t0.shape[-1]
        and q.shape[:-2] == t0.shape[:-2]
        and set(q.data) == set(t0.data)
        for q in qts
    )


def concat_kmajor(qts: list[QTensor]) -> QTensor:
    """Fuse along n_out. Every part is already lane-padded to 256 by
    pack_kmajor, so concatenation preserves per-part tile alignment. The
    fused logical n_out is the padded total (pad rows dequantize to 0)."""
    assert can_fuse(qts)
    t0 = qts[0]
    data = {}
    for k in t0.data:
        arrs = [q.data[k] for q in qts]
        if isinstance(arrs[0], np.ndarray):
            data[k] = np.concatenate(arrs, axis=-1)
        else:
            data[k] = jnp.concatenate(arrs, axis=-1)
    n_total = sum(pad256(q.n_out) for q in qts)
    shape = t0.shape[:-2] + (n_total, t0.shape[-1])
    return QTensor(t0.qtype, shape, data)


def fuse_layer_weights(layers: dict, cfg=None) -> dict:
    """Replace (wq, wk, wv) -> wqkv and (ffn_gate, ffn_up) -> ffn_gateup when
    fuseable. Mutates a copy; unfused originals are dropped (HBM savings)."""
    out = dict(layers)
    qkv = [layers.get(k) for k in ("wq", "wk", "wv")]
    if can_fuse(qkv):
        out["wqkv"] = concat_kmajor(qkv)
        for k in ("wq", "wk", "wv"):
            del out[k]
    gu = [layers.get(k) for k in ("ffn_gate", "ffn_up")]
    # ffn() slices the fused tensor at cfg.n_ff offsets — a dense FFN of a
    # different width (arctic's n_embd-wide parallel MLP) must stay unfused
    if can_fuse(gu) and (cfg is None or gu[0].n_out == cfg.n_ff):
        out["ffn_gateup"] = concat_kmajor(gu)
        for k in ("ffn_gate", "ffn_up"):
            del out[k]
    return out
