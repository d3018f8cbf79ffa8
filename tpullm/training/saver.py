"""Model saver: write (modified) params back to a GGUF checkpoint.

The reference's llama_model_saver (src/llama-model-saver.cpp) re-emits a
loaded model — metadata plus (possibly updated) tensors — and is what makes
finetune output loadable. Here: walk the SOURCE file's tensor directory so
names/order/metadata survive byte-for-byte, substitute trained float master
weights (re-quantized to each tensor's original type), and copy everything
untouched verbatim.

Requires params loaded with fuse=False (fused wqkv/gateup cannot be mapped
back to the source tensor names).
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFFile
from ..gguf.writer import GGUFWriter
from ..quant import quantize
from ..runtime.loader import GLOBAL_TENSORS, LAYER_TENSORS

_SKIP_KEYS = {"GGUF.version", "GGUF.tensor_count", "GGUF.kv_count"}


def _unwrap(v):
    """float-wrapped QTensor (float_params) -> dense array."""
    if v is None or isinstance(v, np.ndarray):
        return v
    if hasattr(v, "data") and isinstance(getattr(v, "data"), dict):
        return v.data.get("w")
    return v


def _param_lookup(params: dict, name: str):
    """GGUF tensor name -> trained array (or None if not in the pytree)."""
    if name in GLOBAL_TENSORS:
        return _unwrap(params.get(GLOBAL_TENSORS[name]))
    if name.startswith("blk."):
        _, idx, suffix = name.split(".", 2)
        li = int(idx)
        key = LAYER_TENSORS.get(suffix)
        if key is None:
            return None
        layers = params.get("layers", {})
        groups = layers.get("__groups__") or [layers]
        off = 0
        for gl in groups:
            L = _unwrap(next(iter(gl.values()))).shape[0]
            if key in gl and off <= li < off + L:
                return _unwrap(gl[key])[li - off]
            off += L
        return None
    return None


def save_model_gguf(src: GGUFFile, params: dict, out_path: str,
                    qtype_override: GGMLType | None = None) -> str:
    """Write out_path with src's metadata and params' tensor values.

    Each tensor keeps its source ggml type (or qtype_override for the
    quantized matrices); types our quantizer can't produce fall back to F16.
    """
    from ..quant.numpy_impl import _QUANT

    w = GGUFWriter(out_path, arch=src.architecture)
    for key, val in src.metadata.items():
        if key in _SKIP_KEYS or key == "general.architecture":
            continue
        w.add_kv(key, val)

    for name, ti in src.tensors.items():
        t = GGMLType(ti.ggml_type)
        arr = _param_lookup(params, name)
        if arr is None:
            # untracked tensor: copy raw payload + type verbatim
            w.add_tensor(name, bytes(src.tensor_data(name)), t,
                         tuple(ti.shape))
            continue
        arr = np.asarray(arr, np.float32)
        if t in (GGMLType.F32,):
            payload = arr.astype(np.float32)
        elif t in (GGMLType.F16, GGMLType.BF16):
            payload = arr  # quantize() handles both
        else:
            tt = qtype_override or t
            if tt not in _QUANT:
                tt = GGMLType.F16
            t = tt
            payload = arr
        raw = quantize(payload.reshape(-1, ti.np_shape[-1]), t)
        w.add_tensor(name, raw.tobytes(), t, tuple(ti.shape))
    w.write()
    return out_path
