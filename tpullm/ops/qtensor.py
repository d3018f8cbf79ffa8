"""QTensor: a quantized weight as a JAX pytree of planar device arrays.

Plays the role of the reference's quantized ggml_tensor + repacked buffer
(ggml/src/ggml-cpu/repack.cpp): logical shape (n_out, n_in) row-major, data
held as the planar arrays from tpullm.quant.layout. Being a pytree, it passes
through jit/shard_map/scan transparently; the qtype and shape are static
(part of the treedef), so compiled kernels specialize per format.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType, GGML_QUANT_SIZES
from ..quant.layout import decode_planar, PLANAR_TYPES
from .dequant import dequant_jax


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Quantized (or plain) 2-D+ weight. shape is numpy order: (..., n_out, n_in)."""

    qtype: GGMLType
    shape: tuple[int, ...]
    data: dict[str, Any]  # planar arrays, or {"w": array} for float types

    def tree_flatten(self):
        keys = tuple(sorted(self.data))
        return tuple(self.data[k] for k in keys), (self.qtype, self.shape, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qtype, shape, keys = aux
        return cls(qtype, shape, dict(zip(keys, children)))

    @property
    def is_quantized(self) -> bool:
        return self.qtype in PLANAR_TYPES

    def dequant(self, dtype=jnp.bfloat16):
        """Full dense materialization (XLA reference path).

        Output shape follows the *leaf* leading dims, so a layer-stacked or
        scan-sliced QTensor dequantizes correctly regardless of the static
        ``shape`` recorded at construction.
        """
        if not self.is_quantized:
            return self.data["w"].astype(dtype)
        return dequant_jax(self.data, self.qtype, dtype)

    def take_rows(self, idx, dtype=jnp.bfloat16):
        """Gather rows by index then dequantize only those (embedding lookup).

        Avoids materializing the dense table (the GET_ROWS-on-quantized
        analogue, ggml/include/ggml.h GGML_OP_GET_ROWS).
        """
        if not self.is_quantized:
            return self.data["w"][idx].astype(dtype)
        sub = {k: v[idx] for k, v in self.data.items()}
        return dequant_jax(sub, self.qtype, dtype)

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize for v in self.data.values())


def qtensor_from_bytes(
    raw: np.ndarray, qtype: GGMLType, shape: tuple[int, ...], device_put: bool = True
) -> QTensor:
    """Raw GGUF payload bytes -> planar QTensor (host decode, optional upload)."""
    qtype = GGMLType(qtype)
    n_in = shape[-1]
    n_rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    if qtype in (GGMLType.F32, GGMLType.F16):
        w = raw.view(np.float32 if qtype == GGMLType.F32 else np.float16).reshape(shape)
        data = {"w": jnp.asarray(w) if device_put else w}
        return QTensor(qtype, tuple(shape), data)
    if qtype == GGMLType.BF16:
        u = raw.view(np.uint16).astype(np.uint32) << 16
        w = u.view(np.float32).reshape(shape).astype(np.float32)
        data = {"w": jnp.asarray(w, jnp.bfloat16) if device_put else w}
        return QTensor(qtype, tuple(shape), data)
    blk, bs = GGML_QUANT_SIZES[qtype]
    row_bytes = n_in // blk * bs
    lead = tuple(shape[:-1]) if len(shape) > 1 else (1,)
    planar = decode_planar(raw.reshape(*lead, row_bytes), qtype)
    if device_put:
        planar = {k: jnp.asarray(np.ascontiguousarray(v)) for k, v in planar.items()}
    return QTensor(qtype, tuple(shape), planar)


def qtensor_from_float(
    w: np.ndarray, qtype: GGMLType, device_put: bool = True
) -> QTensor:
    """Quantize a float array into a QTensor (test/synthetic-model helper)."""
    from ..quant import quantize

    qtype = GGMLType(qtype)
    if qtype in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        dt = {GGMLType.F32: np.float32, GGMLType.F16: np.float16}.get(qtype)
        arr = w.astype(dt) if dt else w
        if qtype == GGMLType.BF16:
            arr = jnp.asarray(w, jnp.bfloat16) if device_put else w.astype(np.float32)
        data = {"w": jnp.asarray(arr) if device_put and qtype != GGMLType.BF16 else arr}
        return QTensor(qtype, tuple(w.shape), data)
    raw = quantize(np.asarray(w, np.float32).reshape(-1, w.shape[-1]), qtype)
    return qtensor_from_bytes(raw.reshape(-1), qtype, tuple(w.shape), device_put)
