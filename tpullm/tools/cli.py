"""llama-cli analogue: one-shot or interactive generation.

Like the reference (tools/cli/cli.cpp:8-10), this runs on an in-process
server context so chat templating / sampling / slot logic is shared with
the HTTP server.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.cli")
    ap.add_argument("-m", "--model", default=None)
    ap.add_argument("-hf", "--hf-repo", default=None, metavar="REPO[:TAG]")
    ap.add_argument("--hf-file", default=None)
    ap.add_argument("-mu", "--model-url", default=None)
    ap.add_argument("--offline", action="store_true")
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("-n", "--n-predict", type=int, default=128)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--min-p", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=-1)
    ap.add_argument("-i", "--interactive", action="store_true", help="chat loop")
    args = ap.parse_args(argv)

    from ..runtime.loader import load_model
    from ..server.chat import apply_chat_template
    from ..server.context import GenParams, ServerContext, Task
    from ..tokenizer import Tokenizer

    from ..utils.download import resolve_model_arg

    args.model = resolve_model_arg(
        args.model, args.hf_repo, args.hf_file, args.model_url,
        offline=True if args.offline else None).model_path

    print(f"loading {args.model} ...", file=sys.stderr)
    cfg, params, g = load_model(args.model)
    tok = Tokenizer.from_gguf(g)
    ctx = ServerContext(cfg, params, tok, n_slots=1, max_seq_len=args.ctx_size)
    ctx.start()
    gp = GenParams(max_tokens=args.n_predict, temperature=args.temp,
                   top_k=args.top_k, top_p=args.top_p, min_p=args.min_p,
                   seed=args.seed, stream=True)

    def run(prompt_text: str):
        ids = tok.encode(prompt_text, add_special=True, parse_special=True)
        task = Task(tokens=ids, params=gp)
        ctx.submit(task)
        for kind, payload in task.events():
            if kind == "delta":
                sys.stdout.write(payload["text"])
                sys.stdout.flush()
            elif kind == "done":
                print(f"\n[{payload['reason']}; {payload['stats']}]", file=sys.stderr)
            elif kind == "error":
                print(f"error: {payload}", file=sys.stderr)

    try:
        if args.interactive:
            messages = []
            while True:
                try:
                    user = input("\n> ")
                except EOFError:
                    break
                messages.append({"role": "user", "content": user})
                prompt = apply_chat_template(ctx, messages)
                run(prompt)
        else:
            run(args.prompt or "")
    finally:
        ctx.stop()


if __name__ == "__main__":
    main()
