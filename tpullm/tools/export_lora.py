"""llama-export-lora analogue: merge LoRA adapter(s) into a base GGUF.

W' = W + scale * B @ A per hooked tensor (tools/export-lora/export-lora.cpp:
merged tensors are dequantized, the delta added in f32, and re-encoded;
untouched tensors copy through verbatim).

Usage:
  python -m tpullm.tools.export_lora -m base.gguf \
         --lora adapter.gguf [--lora-scaled adapter2.gguf 0.5] -o out.gguf
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

from ..gguf.constants import GGMLType, GGML_QUANT_SIZES
from ..gguf.reader import GGUFFile
from ..gguf.writer import GGUFWriter
from ..quant.numpy_impl import dequantize, quantize, quant_supported
from ..runtime.lora import _HOOKS, load_lora


def merge(base_path: str, adapters: list[tuple[str, float]],
          out_path: str) -> str:
    g = GGUFFile(base_path)
    n_layer = int(g.get(f"{g.architecture}.block_count"))

    # accumulate per-tensor f32 deltas from every adapter
    deltas: dict[str, np.ndarray] = {}
    inv_hooks = {v: k for k, v in _HOOKS.items()}
    for path, scale in adapters:
        lora, meta = load_lora(path, n_layer, scale)
        for key, ab in lora.items():
            A, B = ab["a"], ab["b"]  # (L, r, n_in), (L, n_out, r)
            for li in range(n_layer):
                if not A[li].any():
                    continue
                name = f"blk.{li}.{inv_hooks[key]}.weight"
                d = (B[li] @ A[li]) * np.float32(meta["scale"])
                deltas[name] = deltas.get(name, 0) + d.astype(np.float32)

    w = GGUFWriter(out_path, arch=g.architecture)
    for key, val in g.metadata.items():
        if key == "general.architecture":
            continue
        w.add_kv(key, val)
    n_merged = 0
    for name, ti in g.tensors.items():
        t = GGMLType(ti.ggml_type)
        if name not in deltas:
            w.add_tensor(name, bytes(g.tensor_data(name)), t,
                         tuple(ti.shape))
            continue
        n_merged += 1
        base = _dense(g, name, ti)
        merged = base + deltas[name]
        out_t = t if quant_supported_t(t, merged.shape[-1]) else GGMLType.F16
        raw = quantize(merged, out_t)
        w.add_tensor(name, raw.tobytes(), out_t, tuple(ti.shape))
    w.write()
    print(f"wrote {out_path} ({n_merged} tensors merged)", file=sys.stderr)
    return out_path


def quant_supported_t(t: GGMLType, n: int) -> bool:
    if t not in quant_supported():
        return False
    blk, _ = GGML_QUANT_SIZES.get(t, (1, 0))
    return n % max(blk, 1) == 0


def _dense(g: GGUFFile, name: str, ti) -> np.ndarray:
    t = GGMLType(ti.ggml_type)
    raw = g.tensor_data(name)
    if t == GGMLType.F32:
        return np.asarray(raw.view(np.float32).reshape(ti.np_shape),
                          np.float32)
    if t == GGMLType.F16:
        return raw.view(np.float16).astype(np.float32).reshape(ti.np_shape)
    rows = ti.n_elements // ti.shape[0]
    return dequantize(raw.reshape(rows, -1), t).reshape(
        ti.np_shape).astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.export_lora")
    ap.add_argument("-m", "--model", required=True, help="base GGUF")
    ap.add_argument("--lora", action="append", default=[],
                    help="adapter GGUF (scale 1.0); repeatable")
    ap.add_argument("--lora-scaled", nargs=2, action="append", default=[],
                    metavar=("GGUF", "SCALE"), help="adapter with scale")
    ap.add_argument("-o", "--output", required=True)
    args = ap.parse_args(argv)
    adapters = [(p, 1.0) for p in args.lora]
    adapters += [(p, float(s)) for p, s in args.lora_scaled]
    if not adapters:
        ap.error("need at least one --lora / --lora-scaled")
    merge(args.model, adapters, args.output)


if __name__ == "__main__":
    main()
