"""`python -m tpullm.server -m model.gguf [--host H] [--port P] ...`

The llama-server entry point (tools/server/server.cpp) equivalent.
"""
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.server")
    ap.add_argument("-m", "--model", required=True, help="GGUF checkpoint path")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-np", "--parallel", type=int, default=4, help="slots")
    ap.add_argument("--decode-chunk", type=int, default=8)
    ap.add_argument("--prefill-chunk", type=int, default=512)
    ap.add_argument("--alias", default=None, help="model name in the API")
    ap.add_argument("--lora", default=None, help="LoRA adapter GGUF")
    ap.add_argument("--lora-scale", type=float, default=1.0)
    ap.add_argument("--kv-type", default="bf16", choices=("bf16", "f32", "q8"),
                    help="KV cache storage type")
    ap.add_argument("--override-kv", action="append", default=[],
                    metavar="KEY=TYPE:VALUE",
                    help="metadata override, e.g. llama.rope.freq_base=float:1e6")
    ap.add_argument("--slot-save-path", default=None,
                    help="directory for /slots save/restore files "
                         "(endpoints disabled when unset)")
    args = ap.parse_args(argv)

    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer
    from .context import ServerContext
    from .http import serve

    overrides = {}
    for spec in args.override_kv:
        key, _, tv = spec.partition("=")
        typ, _, val = tv.partition(":")
        cast = {"int": int, "float": float, "bool": lambda s: s.lower() == "true",
                "str": str}.get(typ, str)
        overrides[key] = cast(val if val else typ)

    print(f"loading {args.model} ...", file=sys.stderr)
    cfg, params, g = load_model(args.model, override_kv=overrides or None)
    if args.lora:
        from ..runtime.lora import apply_lora_to_params, load_lora

        lora, meta = load_lora(args.lora, cfg.n_layer, args.lora_scale)
        params = apply_lora_to_params(params, lora, meta)
        print(f"applied LoRA {args.lora} (rank {meta['rank']})", file=sys.stderr)
    tok = Tokenizer.from_gguf(g)
    import jax.numpy as jnp

    kv_dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32, "q8": "q8"}[args.kv_type]
    ctx = ServerContext(
        cfg, params, tok, n_slots=args.parallel, max_seq_len=args.ctx_size,
        decode_chunk=args.decode_chunk, prefill_chunk=args.prefill_chunk,
        model_name=args.alias or args.model.rsplit("/", 1)[-1],
        kv_dtype=kv_dtype,
        slot_save_path=args.slot_save_path,
    )
    print(f"serving {cfg.arch} on http://{args.host}:{args.port} "
          f"({args.parallel} slots, ctx {args.ctx_size})", file=sys.stderr)
    serve(ctx, args.host, args.port)


if __name__ == "__main__":
    main()
