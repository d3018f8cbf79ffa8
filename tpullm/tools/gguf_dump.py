"""GGUF inspector (gguf-py gguf_dump analogue): metadata + tensor table."""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.gguf_dump")
    ap.add_argument("model")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--no-tensors", action="store_true")
    args = ap.parse_args(argv)

    from ..gguf.reader import GGUFFile

    g = GGUFFile(args.model)
    if args.json:
        out = {
            "metadata": {k: (v if not isinstance(v, (list, tuple)) or len(v) <= 8
                             else f"<array[{len(v)}]>")
                         for k, v in g.metadata.items()},
            "tensors": None if args.no_tensors else [
                {"name": t.name, "shape": list(t.shape), "type": t.ggml_type.name}
                for t in g.tensors.values()],
        }
        print(json.dumps(out, indent=2, default=str))
        return
    print(f"arch: {g.architecture}  files: {len(g.paths)}")
    for k, v in g.metadata.items():
        if isinstance(v, (list, tuple)) and len(v) > 8:
            v = f"<array[{len(v)}] {type(v[0]).__name__}>"
        print(f"  {k} = {v}")
    if not args.no_tensors:
        print(f"{len(g.tensors)} tensors:")
        for t in g.tensors.values():
            print(f"  {t.name:<48} {t.ggml_type.name:<8} {list(t.shape)}")


if __name__ == "__main__":
    main()
