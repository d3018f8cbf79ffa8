"""GGUF endianness converter (gguf-py gguf_convert_endian analogue —
the s390x fork's big-endian support path, docs/build-s390x.md:120-148).

Tensor payloads are block-structured: only the multi-byte scale/metadata
fields inside each block get byte-swapped (quant bytes are endian-neutral);
float tensors swap whole elements. KV metadata is rewritten by the writer in
the target byte order.
"""
from __future__ import annotations

import argparse

import numpy as np

from ..gguf.constants import GGMLType, GGML_QUANT_SIZES
from ..gguf.reader import GGUFFile
from ..gguf.writer import GGUFWriter

from ..gguf.endian import swap_block_fields


def convert(src: str, dst: str, target: str = "big") -> int:
    g = GGUFFile(src)
    bo = ">" if target in ("big", "be", ">") else "<"
    host = "<" if np.little_endian else ">"
    w = GGUFWriter(dst, arch=g.architecture, byteorder=bo)
    for key, val in g.metadata.items():
        if key != "general.architecture":
            w.add_kv(key, val)
    n = 0
    for name, ti in g.tensors.items():
        raw = g.tensor_data(name)  # host byte order
        payload = raw.tobytes() if bo == host else \
            swap_block_fields(raw, ti.ggml_type).tobytes()
        w.add_tensor(name, payload, ti.ggml_type, tuple(ti.shape))
        n += 1
    w.write()
    return n


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.gguf_convert_endian")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("order", choices=("big", "little"), nargs="?", default="big")
    args = ap.parse_args(argv)
    n = convert(args.src, args.dst, args.order)
    print(f"converted {n} tensors to {args.order}-endian: {args.dst}")


if __name__ == "__main__":
    main()
