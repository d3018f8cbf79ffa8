"""QTensor: a quantized weight as a JAX pytree of device arrays.

Plays the role of the reference's quantized ggml_tensor + repacked buffer
(ggml/src/ggml-cpu/repack.cpp): logical shape (n_out, n_in) row-major.

Two quantized storage layouts:
- "kmajor" (default for supported types): the TPU kernel layout from
  tpullm.quant.kmajor — packed quants transposed (K-major) + combined f32
  group scales; consumed zero-copy by the fused Pallas dequant-matmul
  (tpullm.ops.qmm) and dequantizable in plain XLA as the fallback/oracle.
- "planar": the direct ggml block decomposition (tpullm.quant.layout),
  kept for conversion tools and differential tests.

Being a pytree, QTensor passes through jit/shard_map/scan transparently; the
qtype and logical shape are static (part of the treedef), so compiled kernels
specialize per format.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType, GGML_QUANT_SIZES
from ..quant.layout import decode_planar, PLANAR_TYPES
from ..quant.kmajor import KMAJOR_TYPES, pack_kmajor, dequant_kmajor_jnp
from .dequant import dequant_jax

_FLOAT_TYPES = frozenset({GGMLType.F32, GGMLType.F16, GGMLType.BF16})


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Quantized (or plain) 2-D+ weight. shape is numpy order: (..., n_out, n_in)."""

    qtype: GGMLType
    shape: tuple[int, ...]
    data: dict[str, Any]  # layout-specific arrays; {"w": array} for float types

    def tree_flatten(self):
        keys = tuple(sorted(self.data))
        return tuple(self.data[k] for k in keys), (self.qtype, self.shape, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qtype, shape, keys = aux
        return cls(qtype, shape, dict(zip(keys, children)))

    @property
    def is_quantized(self) -> bool:
        return self.qtype not in _FLOAT_TYPES

    @property
    def layout(self) -> str:
        if not self.is_quantized or "w" in self.data:
            return "dense"  # float weights, or dequanted-at-load codebooks
        return "kmajor" if "q" in self.data and "d" in self.data else "planar"

    @property
    def n_out(self) -> int:
        return self.shape[-2] if len(self.shape) > 1 else 1

    @property
    def n_in(self) -> int:
        return self.shape[-1]

    def dequant(self, dtype=jnp.bfloat16):
        """Full dense materialization (XLA reference path).

        For planar layout the output follows the leaf leading dims (so a
        layer-stacked or scan-sliced QTensor dequantizes correctly); kmajor
        dequant requires unstacked (2-D) leaves.
        """
        if not self.is_quantized or "w" in self.data:
            return self.data["w"].astype(dtype)
        if self.layout == "kmajor":
            q = self.data["q"]
            if q.ndim > 2:  # stacked (L and/or E) leaves: dequant each
                lead = q.shape[:-2]
                flat = {k: v.reshape((-1,) + v.shape[len(lead):])
                        for k, v in self.data.items()}
                n = flat["q"].shape[0]
                ws = [dequant_kmajor_jnp(
                    {k: v[i] for k, v in flat.items()}, self.qtype,
                    dtype)[: self.n_out] for i in range(n)]
                return jnp.stack(ws).reshape(lead + ws[0].shape)
            return dequant_kmajor_jnp(self.data, self.qtype, dtype)[: self.n_out]
        return dequant_jax(self.data, self.qtype, dtype)

    def take_rows(self, idx, dtype=jnp.bfloat16):
        """Gather rows by index then dequantize only those (embedding lookup).

        Avoids materializing the dense table (the GET_ROWS-on-quantized
        analogue, ggml/include/ggml.h GGML_OP_GET_ROWS). kmajor stores rows
        as lanes, so this is a column gather + dequant of the gathered slab.
        """
        if not self.is_quantized or "w" in self.data:
            return self.data["w"][idx].astype(dtype)
        if self.layout == "kmajor":
            idx = jnp.asarray(idx)
            flat = idx.reshape(-1)
            sub = {k: v[:, flat] for k, v in self.data.items()}
            w = dequant_kmajor_jnp(sub, self.qtype, dtype)  # (nidx, K)
            return w.reshape(*idx.shape, self.n_in)
        sub = {k: v[idx] for k, v in self.data.items()}
        return dequant_jax(sub, self.qtype, dtype)

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize for v in self.data.values())


def _choose_layout(qtype: GGMLType, shape: tuple[int, ...], layout: str) -> str:
    if layout != "auto":
        return layout
    from .qmm import qmm_supported

    if (len(shape) in (2, 3) and qtype in KMAJOR_TYPES
            and qmm_supported(qtype, shape[-1])):
        # 3-D = stacked expert weights (E, n_out, n_in): packed per expert
        # so the grouped MoE kernel (ops/moe_gmm.py) can stream them
        return "kmajor"
    return "planar"


def qtensor_from_bytes(
    raw: np.ndarray,
    qtype: GGMLType,
    shape: tuple[int, ...],
    device_put: bool = True,
    layout: str = "auto",
) -> QTensor:
    """Raw GGUF payload bytes -> QTensor (host decode, optional upload)."""
    qtype = GGMLType(qtype)
    n_in = shape[-1]
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
    from ..quant.layout import PLANAR_TYPES

    if qtype not in PLANAR_TYPES:
        # codebook formats (IQ1/IQ2/IQ3): no kernel layout yet — dense
        # dequant at load (the reference's convert.cu full-dequant path)
        from ..quant.numpy_impl import dequantize

        w = dequantize(raw.reshape(*lead, row_bytes), qtype).reshape(shape)
        w = w.astype(np.float32)
        data = {"w": jnp.asarray(w, jnp.bfloat16) if device_put else w}
        return QTensor(qtype, tuple(shape), data)
    planar = decode_planar(raw.reshape(*lead, row_bytes), qtype)
    if _choose_layout(qtype, tuple(shape), layout) == "kmajor":
        if len(lead) == 1:
            data = pack_kmajor(planar, qtype)
        else:  # (E, n_out, n_in) experts: pack each slice, stack on E
            E = lead[0]
            packed = [pack_kmajor({k: v[e] for k, v in planar.items()},
                                  qtype) for e in range(E)]
            data = {k: np.stack([pe[k] for pe in packed])
                    for k in packed[0]}
    else:
        data = planar
    if device_put:
        data = {k: jnp.asarray(np.ascontiguousarray(v)) for k, v in data.items()}
    return QTensor(qtype, tuple(shape), data)


def qtensor_from_float(
    w: np.ndarray, qtype: GGMLType, device_put: bool = True, layout: str = "auto"
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
    return qtensor_from_bytes(raw.reshape(-1), qtype, tuple(w.shape), device_put, layout)
