"""llama-tokenize analogue: show token ids/pieces for a prompt."""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.tokenize")
    ap.add_argument("-m", "--model", required=True, help="GGUF (weights or vocab-only)")
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("-f", "--file", default=None)
    ap.add_argument("--ids", action="store_true", help="print bare id list")
    ap.add_argument("--no-bos", action="store_true")
    ap.add_argument("--parse-special", action="store_true")
    args = ap.parse_args(argv)

    from ..tokenizer import Tokenizer

    tok = Tokenizer.from_gguf(args.model)
    text = args.prompt if args.prompt is not None else open(args.file, encoding="utf-8").read()
    ids = tok.encode(text, add_special=not args.no_bos, parse_special=args.parse_special)
    if args.ids:
        print(ids)
        return
    v = tok.vocab
    for i in ids:
        piece = v.tokens[i] if 0 <= i < len(v.tokens) else "?"
        print(f"{i:>8} -> '{piece}'")
    print(f"total: {len(ids)} tokens", file=sys.stderr)


if __name__ == "__main__":
    main()
