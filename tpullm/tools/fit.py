"""Memory auto-fit (common/fit.{h,cpp} analogue): size a deployment without
loading weights.

Reads only GGUF metadata + tensor directory, models the device-side
footprint (kmajor-packed weights, KV cache, activation/compile headroom) and
suggests the largest (n_ctx, n_slots) fitting the HBM budget — the
reference's simulated no_alloc load, in closed form.
"""
from __future__ import annotations

import argparse

from ..gguf.constants import GGMLType, GGML_QUANT_SIZES
from ..gguf.reader import GGUFFile
from ..models.config import config_from_gguf
from ..quant.kmajor import KM_SPECS


def weight_device_bytes(g: GGUFFile) -> int:
    """Device bytes after the kmajor repack (compact scales: f32 superblock
    d + int8 sub-scales; sub-byte i8-path types widen to 8 bpw)."""
    total = 0
    for name, ti in g.tensors.items():
        t = GGMLType(ti.ggml_type)
        n = ti.n_elements
        if t in (GGMLType.F32,):
            total += n * 4
        elif t in (GGMLType.F16, GGMLType.BF16):
            total += n * 2
        elif t in KM_SPECS:
            spec = KM_SPECS[t]
            qbits = 4 if spec.kind == "u4" else 8
            scale_b = 4 / spec.dstore  # f32 d per stored superblock row
            if spec.sb is not None:
                scale_b += 1 / spec.gs  # int8 sub-scales
            if spec.bias == "i8d":
                scale_b += 1 / spec.gs + 4 / spec.dstore
            elif spec.bias == "f32":
                scale_b += 4 / spec.gs
            total += int(n * (qbits / 8 + scale_b))
        else:
            blk, bs = GGML_QUANT_SIZES.get(t, (1, 4))
            total += n * bs // blk
    return total


def kv_bytes_per_token(cfg, kv_dtype: str = "bf16") -> int:
    per = cfg.n_layer * cfg.n_head_kv * (cfg.head_dim + cfg.head_dim_v)
    if kv_dtype in ("q8", "int8"):
        return int(per * 1.03)  # int8 + f32/row scales
    return per * 2


def fit(path: str, hbm_gb: float = 16.0, n_slots: int = 4,
        kv_dtype: str = "bf16", headroom_frac: float = 0.15) -> dict:
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    wb = weight_device_bytes(g)
    budget = int(hbm_gb * 1e9 * (1 - headroom_frac))
    kv_tok = kv_bytes_per_token(cfg, kv_dtype)
    free = budget - wb
    if free <= 0:
        return {"fits": False, "weight_gb": wb / 1e9, "budget_gb": budget / 1e9}
    max_total_tokens = free // kv_tok
    n_ctx = int(max_total_tokens // max(n_slots, 1))
    n_ctx = min(n_ctx, cfg.n_ctx_train)
    n_ctx = (n_ctx // 256) * 256
    return {
        "fits": n_ctx >= 256,
        "weight_gb": round(wb / 1e9, 3),
        "kv_bytes_per_token": kv_tok,
        "suggested_n_ctx": n_ctx,
        "n_slots": n_slots,
        "kv_gb_at_suggestion": round(n_ctx * n_slots * kv_tok / 1e9, 3),
        "budget_gb": round(budget / 1e9, 3),
    }


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.fit")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--hbm-gb", type=float, default=16.0)
    ap.add_argument("-np", "--parallel", type=int, default=4)
    ap.add_argument("--kv", default="bf16", choices=("bf16", "q8"))
    args = ap.parse_args(argv)
    print(fit(args.model, args.hbm_gb, args.parallel, args.kv))


if __name__ == "__main__":
    main()
