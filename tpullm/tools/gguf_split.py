"""gguf-split analogue: split a GGUF into shards / merge shards back.

Reference: tools/gguf-split/gguf-split.cpp (589 LoC) + the sharded-file
convention `<name>-%05d-of-%05d.gguf` (include/llama.h:475). Split shards
carry the split KVs (split.no / split.count / split.tensors.count); only the
first shard keeps the full metadata (matching the reference's layout, which
our reader — and the reference loader — already consume).

Usage:
  python -m tpullm.tools.gguf_split --split   -m model.gguf --max-tensors 128
  python -m tpullm.tools.gguf_split --split   -m model.gguf --max-size 4G
  python -m tpullm.tools.gguf_split --merge   -m model-00001-of-000NN.gguf -o out.gguf
"""
from __future__ import annotations

import argparse
import os
import re
import sys

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFFile
from ..gguf.writer import GGUFWriter

_SKIP = {"split.no", "split.count", "split.tensors.count"}


def _parse_size(s: str) -> int:
    m = re.fullmatch(r"(\d+)([KMG]?)", s.upper())
    if not m:
        raise ValueError(f"bad size {s!r} (e.g. 500M, 4G)")
    return int(m.group(1)) * {"": 1, "K": 1 << 10, "M": 1 << 20,
                              "G": 1 << 30}[m.group(2)]


def split_gguf(path: str, out_prefix: str | None = None,
               max_tensors: int = 0, max_size: int = 0) -> list[str]:
    g = GGUFFile(path)
    names = list(g.tensors)
    # partition tensor list into shards
    shards: list[list[str]] = [[]]
    size = 0
    for name in names:
        ti = g.tensors[name]
        full = ((max_tensors and len(shards[-1]) >= max_tensors)
                or (max_size and size + ti.n_bytes > max_size and shards[-1]))
        if full:
            shards.append([])
            size = 0
        shards[-1].append(name)
        size += ti.n_bytes
    n = len(shards)
    if n < 2:
        raise SystemExit("nothing to split (fits in one shard)")
    prefix = out_prefix or path[:-5] if path.endswith(".gguf") else path
    outs = []
    for i, shard in enumerate(shards):
        out = f"{prefix}-{i + 1:05d}-of-{n:05d}.gguf"
        w = GGUFWriter(out, arch=g.architecture)
        if i == 0:  # full metadata on the first shard only
            for key, val in g.metadata.items():
                if key in _SKIP or key == "general.architecture":
                    continue
                w.add_kv(key, val)
        w.add_kv("split.no", i)
        w.add_kv("split.count", n)
        w.add_kv("split.tensors.count", len(names))
        for name in shard:
            ti = g.tensors[name]
            w.add_tensor(name, bytes(g.tensor_data(name)),
                         GGMLType(ti.ggml_type), tuple(ti.shape))
        w.write()
        outs.append(out)
        print(f"wrote {out} ({len(shard)} tensors)", file=sys.stderr)
    return outs


def merge_gguf(first_shard: str, out_path: str) -> str:
    g = GGUFFile(first_shard)  # the reader follows -of- siblings
    w = GGUFWriter(out_path, arch=g.architecture)
    for key, val in g.metadata.items():
        if key in _SKIP or key == "general.architecture":
            continue
        w.add_kv(key, val)
    for name, ti in g.tensors.items():
        w.add_tensor(name, bytes(g.tensor_data(name)),
                     GGMLType(ti.ggml_type), tuple(ti.shape))
    w.write()
    print(f"wrote {out_path} ({len(g.tensors)} tensors)", file=sys.stderr)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.gguf_split")
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--split", action="store_true")
    mode.add_argument("--merge", action="store_true")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-o", "--out", help="output path (merge) / prefix (split)")
    ap.add_argument("--max-tensors", type=int, default=0)
    ap.add_argument("--max-size", default=None, help="e.g. 500M, 4G")
    args = ap.parse_args(argv)
    if args.split:
        if not args.max_tensors and not args.max_size:
            args.max_tensors = 128
        split_gguf(args.model, args.out,
                   max_tensors=args.max_tensors,
                   max_size=_parse_size(args.max_size) if args.max_size else 0)
    else:
        out = args.out or re.sub(r"-\d{5}-of-\d{5}", "-merged", args.model)
        merge_gguf(args.model, out)


if __name__ == "__main__":
    main()
