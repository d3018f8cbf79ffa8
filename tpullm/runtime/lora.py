"""Runtime LoRA adapters (src/llama-adapter.cpp + build_lora_mm analogue).

Adapter GGUFs carry `blk.N.<tensor>.weight.lora_a` / `.lora_b` pairs and
`adapter.lora.alpha`. At runtime every hooked matmul adds
scale * (x @ A^T) @ B^T with scale = alpha/r * user_scale — weights stay
quantized; the low-rank path runs dense bf16 (it is tiny).

Adapter tensors ride the layer scan as plain arrays (keys
`lora_<param>_{a,b}` in the float leaf dict), so no kernel changes.
"""
from __future__ import annotations

import numpy as np

from ..gguf.reader import GGUFFile

# GGUF tensor base name -> params key (mirror of loader.LAYER_TENSORS)
_HOOKS = {
    "attn_q": "wq",
    "attn_k": "wk",
    "attn_v": "wv",
    "attn_output": "wo",
    "ffn_gate": "ffn_gate",
    "ffn_up": "ffn_up",
    "ffn_down": "ffn_down",
}


def load_lora(path: str, n_layer: int, scale: float = 1.0):
    """-> {param_key: {"a": (L, r, n_in) f32, "b": (L, n_out, r) f32}}, meta.

    Layers without the adapter get zero-rank... all layers must be present
    (the common case for PEFT exports); missing layers get zeros.
    """
    g = GGUFFile(path)
    if g.get("general.type") not in (None, "adapter"):
        raise ValueError(f"{path}: not an adapter GGUF")
    alpha = float(g.get("adapter.lora.alpha", 0.0))

    pairs: dict[str, dict[int, tuple]] = {}
    for name, ti in g.tensors.items():
        if not name.startswith("blk."):
            continue
        parts = name.split(".")
        layer = int(parts[1])
        base = parts[2]
        kind = parts[-1]  # lora_a | lora_b
        if base not in _HOOKS or kind not in ("lora_a", "lora_b"):
            continue
        raw = g.tensor_data(name)
        if ti.ggml_type == 0:  # F32
            arr = raw.view(np.float32).reshape(ti.np_shape)
        elif ti.ggml_type == 1:  # F16
            arr = raw.view(np.float16).astype(np.float32).reshape(ti.np_shape)
        else:
            from ..quant.numpy_impl import dequantize

            rows = ti.n_elements // ti.shape[0]
            arr = dequantize(raw.reshape(rows, -1), ti.ggml_type).reshape(ti.np_shape)
        key = _HOOKS[base]
        pairs.setdefault(key, {})[(layer, kind)] = arr

    out = {}
    rank = 0
    for key, items in pairs.items():
        a0 = next(v for (l, k), v in items.items() if k == "lora_a")
        b0 = next(v for (l, k), v in items.items() if k == "lora_b")
        r = a0.shape[0]
        rank = r
        A = np.zeros((n_layer,) + a0.shape, np.float32)
        B = np.zeros((n_layer,) + b0.shape, np.float32)
        for (l, k), v in items.items():
            (A if k == "lora_a" else B)[l] = v
        out[key] = {"a": A, "b": B}
    eff_scale = scale * (alpha / rank if alpha and rank else 1.0)
    return out, {"alpha": alpha, "rank": rank, "scale": eff_scale}


def load_control_vector(path: str, n_layer: int, scale: float = 1.0):
    """Control-vector GGUF (direction.{i} tensors, llama_adapter_cvec,
    src/llama-adapter.cpp): per-layer bias added to the residual stream."""
    g = GGUFFile(path)
    dirs = None
    for name, ti in g.tensors.items():
        if not name.startswith("direction."):
            continue
        layer = int(name.split(".")[1])
        arr = g.tensor_array(name)
        if arr.dtype == np.uint16:  # bf16 view
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        arr = np.asarray(arr, np.float32).reshape(-1)
        if dirs is None:
            dirs = np.zeros((n_layer, arr.shape[0]), np.float32)
        if 0 <= layer - 1 < n_layer:  # direction indices are 1-based
            dirs[layer - 1] = arr
    if dirs is None:
        raise ValueError(f"{path}: no direction.* tensors")
    return dirs * np.float32(scale)


def apply_control_vector(params: dict, dirs, scale: float = 1.0) -> dict:
    """Install per-layer residual biases (key `cvec` in the float leaves)."""
    import jax.numpy as jnp

    dirs = np.asarray(dirs, np.float32) * np.float32(scale)
    layers = params["layers"]
    groups = layers.get("__groups__") or [layers]
    off = 0
    new_groups = []
    for gl in groups:
        L_g = next(iter(gl.values())).shape[0]
        gl = dict(gl)
        gl["cvec"] = jnp.asarray(dirs[off:off + L_g])
        new_groups.append(gl)
        off += L_g
    out = dict(params)
    out["layers"] = (new_groups[0] if len(new_groups) == 1
                     else {"__groups__": new_groups})
    return out


def apply_lora_to_params(params: dict, lora: dict, meta: dict) -> dict:
    """Merge adapter arrays into the layer leaf dicts (keys the model hooks).

    Works with grouped layers by splitting along the depth segments.
    """
    import jax.numpy as jnp

    s = np.float32(meta["scale"])
    layers = params["layers"]
    groups = layers.get("__groups__") or [layers]
    off = 0
    new_groups = []
    for gl in groups:
        any_leaf = next(iter(gl.values()))
        L_g = any_leaf.shape[0]
        gl = dict(gl)
        for key, ab in lora.items():
            gl[f"lora_{key}_a"] = jnp.asarray(ab["a"][off:off + L_g] * s)
            gl[f"lora_{key}_b"] = jnp.asarray(ab["b"][off:off + L_g])
        new_groups.append(gl)
        off += L_g
    out = dict(params)
    out["layers"] = (new_groups[0] if len(new_groups) == 1
                     else {"__groups__": new_groups})
    return out
