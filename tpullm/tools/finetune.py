"""llama-finetune analogue: train a GGUF checkpoint on a text corpus.

Reference flow (examples/training/finetune.cpp): load model -> llama_opt_init
(AdamW) -> llama_opt_epoch over the tokenized corpus with a train/eval split
-> save the updated model. Here the whole step is one jitted
forward+backward+update; the output GGUF reloads in any tpullm tool (and in
llama.cpp — same format).

Usage:
  python -m tpullm.tools.finetune -m model.gguf -f corpus.txt -o out.gguf
         [--epochs 2] [--lr 1e-4] [--optimizer adamw|sgd] [--seq-len 128]
         [--batch 2] [--weight-decay 0.0] [--eval-frac 0.1]
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.finetune")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="training text corpus")
    ap.add_argument("-o", "--out", required=True, help="output GGUF path")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--optimizer", choices=("adamw", "sgd"), default="adamw")
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--eval-frac", type=float, default=0.0)
    args = ap.parse_args(argv)

    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer
    from ..training import TrainConfig, float_params, save_model_gguf, train

    print(f"loading {args.model} ...", file=sys.stderr)
    # fuse=False: the saver maps params back to source tensor names
    cfg, params, g = load_model(args.model, fuse=False)
    tok = Tokenizer.from_gguf(g)
    text = open(args.file, encoding="utf-8").read()
    ids = tok.encode(text, add_special=True)
    print(f"corpus: {len(ids)} tokens", file=sys.stderr)

    fparams = float_params(params)
    tcfg = TrainConfig(seq_len=args.seq_len, batch=args.batch, lr=args.lr,
                       optimizer=args.optimizer, epochs=args.epochs,
                       weight_decay=args.weight_decay,
                       eval_frac=args.eval_frac)
    fparams, history = train(
        cfg, fparams, ids, tcfg,
        log=lambda r: print(f"epoch {r['epoch']}: train_loss="
                            f"{r['train_loss']:.4f} eval_loss={r['eval_loss']}",
                            file=sys.stderr))
    print(f"saving {args.out} ...", file=sys.stderr)
    save_model_gguf(g, fparams, args.out)
    print(f"done; final train_loss={history[-1]['train_loss']:.4f}")


if __name__ == "__main__":
    main()
