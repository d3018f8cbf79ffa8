"""llama-quantize analogue: requantize a GGUF checkpoint.

Mirrors the reference pipeline (src/llama-quant.cpp:857
llama_model_quantize_impl): read tensors, dequantize to f32 where needed,
pick a per-tensor target type from the ftype policy (llama_tensor_get_type,
src/llama-quant.cpp:661 — attn_v/ffn_down/output get bumped types), run the
numpy quantizers (bit-exact block layouts, tpullm.quant.numpy_impl), write a
new GGUF. Pure host CPU, row-parallel via threads.
"""
from __future__ import annotations

import argparse
import concurrent.futures as cf
import sys
import time

import numpy as np

from ..gguf.constants import GGMLType, GGML_QUANT_SIZES
from ..gguf.reader import GGUFFile
from ..gguf.writer import GGUFWriter
from ..quant.numpy_impl import dequantize, quantize, quant_supported

# ftype name -> (default type, overrides). Policy distilled from
# llama_tensor_get_type (src/llama-quant.cpp:661): embeddings/output and the
# "sensitive" tensors (attn_v, ffn_down) get a bump at low bit-widths.
FTYPES: dict[str, dict] = {
    "Q4_0": dict(default=GGMLType.Q4_0),
    "Q4_1": dict(default=GGMLType.Q4_1),
    "Q5_0": dict(default=GGMLType.Q5_0),
    "Q5_1": dict(default=GGMLType.Q5_1),
    "Q8_0": dict(default=GGMLType.Q8_0),
    "Q2_K": dict(default=GGMLType.Q2_K, attn_v=GGMLType.Q4_K,
                 ffn_down=GGMLType.Q3_K, output=GGMLType.Q6_K),
    "Q3_K_S": dict(default=GGMLType.Q3_K, output=GGMLType.Q6_K),
    "Q3_K_M": dict(default=GGMLType.Q3_K, attn_v=GGMLType.Q5_K,
                   ffn_down_frac=(0.5, GGMLType.Q5_K), output=GGMLType.Q6_K),
    "Q4_K_S": dict(default=GGMLType.Q4_K, output=GGMLType.Q6_K),
    "Q4_K_M": dict(default=GGMLType.Q4_K, attn_v=GGMLType.Q6_K,
                   ffn_down_frac=(0.5, GGMLType.Q6_K), output=GGMLType.Q6_K),
    "Q5_K_S": dict(default=GGMLType.Q5_K, output=GGMLType.Q6_K),
    "Q5_K_M": dict(default=GGMLType.Q5_K, attn_v=GGMLType.Q6_K,
                   ffn_down_frac=(0.5, GGMLType.Q6_K), output=GGMLType.Q6_K),
    "Q6_K": dict(default=GGMLType.Q6_K, output=GGMLType.Q6_K),
    "IQ4_NL": dict(default=GGMLType.IQ4_NL, output=GGMLType.Q6_K),
    "IQ4_XS": dict(default=GGMLType.IQ4_XS, output=GGMLType.Q6_K),
    # i-quant ftypes (distilled from llama_tensor_get_type: IQ2-class models
    # keep Q5_K output, a bumped token_embd, and a bumped attn_v; the
    # IQ2_S/IQ2_M ftypes actually store IQ2_XS/IQ2_S tensors)
    "IQ2_XXS": dict(default=GGMLType.IQ2_XXS, token_embd=GGMLType.Q2_K,
                    output=GGMLType.Q5_K, attn_v=GGMLType.Q2_K),
    "IQ2_XS": dict(default=GGMLType.IQ2_XS, token_embd=GGMLType.Q2_K,
                   output=GGMLType.Q5_K, attn_v=GGMLType.Q2_K),
    "IQ2_S": dict(default=GGMLType.IQ2_XS, token_embd=GGMLType.IQ3_S,
                  output=GGMLType.Q5_K, attn_v=GGMLType.IQ3_S),
    "IQ2_M": dict(default=GGMLType.IQ2_S, token_embd=GGMLType.IQ3_S,
                  output=GGMLType.Q5_K, attn_v=GGMLType.IQ3_S),
    "IQ3_XXS": dict(default=GGMLType.IQ3_XXS, token_embd=GGMLType.IQ3_S,
                    output=GGMLType.Q5_K, attn_v=GGMLType.Q4_K),
    "IQ3_S": dict(default=GGMLType.IQ3_S, output=GGMLType.Q6_K,
                  attn_v=GGMLType.Q4_K),
    "IQ3_M": dict(default=GGMLType.IQ3_S, output=GGMLType.Q6_K,
                  attn_v=GGMLType.Q4_K,
                  ffn_down_frac=(0.125, GGMLType.Q4_K)),
    # 1-bit / ternary ftypes (llama_tensor_get_type IQ1/TQ branches:
    # token_embd Q2_K, attn_v Q2_K, ffn_down bumped to IQ2_XXS at depth 0)
    "IQ1_S": dict(default=GGMLType.IQ1_S, token_embd=GGMLType.Q2_K,
                  output=GGMLType.Q5_K, attn_v=GGMLType.Q2_K),
    "IQ1_M": dict(default=GGMLType.IQ1_M, token_embd=GGMLType.Q2_K,
                  output=GGMLType.Q5_K, attn_v=GGMLType.Q2_K),
    "TQ1_0": dict(default=GGMLType.TQ1_0, token_embd=GGMLType.Q4_K,
                  output=GGMLType.Q4_K),
    "TQ2_0": dict(default=GGMLType.TQ2_0, token_embd=GGMLType.Q4_K,
                  output=GGMLType.Q4_K),
    "NVFP4": dict(default=GGMLType.NVFP4, output=GGMLType.Q6_K),
    "MXFP4": dict(default=GGMLType.MXFP4, output=GGMLType.Q6_K),
    "F16": dict(default=GGMLType.F16),
    "BF16": dict(default=GGMLType.BF16),
}


def tensor_target_type(name: str, shape, policy: dict, n_layer: int) -> GGMLType:
    """Per-tensor type decision (the llama_tensor_get_type policy shape)."""
    default = policy["default"]
    if name in ("output.weight",) and "output" in policy:
        return policy["output"]
    if name == "token_embd.weight":
        if "token_embd" in policy:
            return policy["token_embd"]
        # embeddings keep the default (reference uses Q4_K-ish for most ftypes)
        return default if default not in (GGMLType.Q2_K,) else GGMLType.Q4_K
    if ".attn_v.weight" in name and "attn_v" in policy:
        return policy["attn_v"]
    if ".ffn_down" in name:
        if "ffn_down" in policy:
            return policy["ffn_down"]
        if "ffn_down_frac" in policy:
            frac, t = policy["ffn_down_frac"]
            try:
                layer = int(name.split(".")[1])
            except (IndexError, ValueError):
                return default
            # bump the first `frac` of layers (reference bumps i < n/2 style)
            if n_layer and layer < int(n_layer * frac):
                return t
        return default
    # 1-D tensors (norms, biases) stay f32
    if len(shape) == 1:
        return GGMLType.F32
    return default


def _requant_one(g: GGUFFile, name: str, target: GGMLType, imat=None):
    ti = g.tensors[name]
    src_t = ti.ggml_type
    raw = g.tensor_data(name)
    if src_t == target:
        return raw.tobytes(), target, raw.nbytes
    n_in = ti.shape[0]
    rows = ti.n_elements // n_in
    f32 = dequantize(raw.reshape(rows, -1), src_t).astype(np.float32)
    if target == GGMLType.F32:
        return f32.tobytes(), target, raw.nbytes
    blk, _ = GGML_QUANT_SIZES.get(target, (1, 0))
    if n_in % max(blk, 1) != 0 or target not in quant_supported():
        # fall back: keep f16 when the row length doesn't fit the block
        return f32.astype(np.float16).tobytes(), GGMLType.F16, raw.nbytes
    if imat is not None and imat.shape != (n_in,):
        imat = None  # shape mismatch: ignore (reference warns + skips)
    out = quantize(f32, target, imatrix=imat)
    return out.tobytes(), target, raw.nbytes


def quantize_gguf(src: str, dst: str, ftype: str, nthread: int = 8,
                  progress=None, imatrix_path: str | None = None) -> dict:
    policy = FTYPES[ftype.upper()]
    imat = {}
    if imatrix_path:
        from .imatrix import read_imatrix

        imat = read_imatrix(imatrix_path)
    g = GGUFFile(src)
    arch = g.architecture
    n_layer = int(g.get(f"{arch}.block_count", 0))
    w = GGUFWriter(dst, arch=arch)
    for key, val in g.metadata.items():
        if key in ("general.architecture", "general.file_type"):
            continue
        w.add_kv(key, val)
    w.add_uint32("general.file_type", _ftype_id(ftype))

    names = list(g.tensors)
    stats = {"tensors": len(names), "in_bytes": 0, "out_bytes": 0}
    t0 = time.time()

    def job(name):
        ti = g.tensors[name]
        tgt = tensor_target_type(name, ti.shape, policy, n_layer)
        if ti.ggml_type in (GGMLType.F32,) and len(ti.shape) == 1:
            tgt = GGMLType.F32
        return (name,) + _requant_one(g, name, tgt, imat.get(name))

    with cf.ThreadPoolExecutor(max_workers=nthread) as ex:
        for name, data, actual, in_bytes in ex.map(job, names):
            ti = g.tensors[name]
            stats["in_bytes"] += in_bytes
            stats["out_bytes"] += len(data)
            w.add_tensor(name, data, actual, tuple(ti.shape))
            if progress:
                progress(name, actual)
    w.write()
    stats["seconds"] = round(time.time() - t0, 2)
    return stats


_FTYPE_IDS = {
    "F16": 1, "Q4_0": 2, "Q4_1": 3, "Q8_0": 7, "Q5_0": 8, "Q5_1": 9,
    "Q2_K": 10, "Q3_K_S": 11, "Q3_K_M": 12, "Q4_K_S": 14, "Q4_K_M": 15,
    "Q5_K_S": 16, "Q5_K_M": 17, "Q6_K": 18, "IQ2_XXS": 19, "IQ2_XS": 20,
    "IQ3_XXS": 23, "IQ4_NL": 25, "IQ3_S": 26, "IQ3_M": 27, "IQ2_S": 28,
    "IQ2_M": 29, "IQ4_XS": 30, "BF16": 32, "IQ1_S": 24, "IQ1_M": 31,
    "TQ1_0": 36, "TQ2_0": 37, "MXFP4": 38, "NVFP4": 39,
}


def _ftype_id(ftype: str) -> int:
    return _FTYPE_IDS.get(ftype.upper(), 1)


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.quantize")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("ftype", help="|".join(FTYPES))
    ap.add_argument("-t", "--threads", type=int, default=8)
    ap.add_argument("--imatrix", default=None, help="imatrix GGUF file")
    args = ap.parse_args(argv)
    stats = quantize_gguf(
        args.src, args.dst, args.ftype, args.threads,
        imatrix_path=args.imatrix,
        progress=lambda n, t: print(f"  {n} -> {t.name}", file=sys.stderr),
    )
    print(stats)


if __name__ == "__main__":
    main()
