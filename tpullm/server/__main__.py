"""`python -m tpullm.server -m model.gguf [--host H] [--port P] ...`

The llama-server entry point (tools/server/server.cpp) equivalent. Every
flag has an env fallback (TPULLM_<DEST>) and can come from a --preset JSON
profile (tpullm.utils.args — the common/arg.cpp + preset.cpp layer).
"""
import sys

from ..utils.args import ArgLayer


def build_args():
    ap = ArgLayer("tpullm.server")
    ap.add("-m", "--model", default=None,
           help="GGUF checkpoint path (or org/repo[:TAG] shorthand for -hf)")
    ap.add("-hf", "--hf-repo", default=None, metavar="REPO[:TAG]",
           help="download from a HuggingFace repo (cached; common/download.cpp)")
    ap.add("--hf-file", default=None, help="exact file inside --hf-repo")
    ap.add("-mu", "--model-url", default=None,
           help="download the model from a raw URL (ETag-cached)")
    ap.add("--offline", action="store_true",
           help="never touch the network; resolve -hf from the local cache")
    ap.add("--host", default="127.0.0.1")
    ap.add("--port", type=int, default=8080)
    ap.add("-c", "--ctx-size", type=int, default=2048)
    ap.add("-np", "--parallel", type=int, default=4, help="slots")
    ap.add("--decode-chunk", type=int, default=8)
    ap.add("--prefill-chunk", type=int, default=512)
    ap.add("--alias", default=None, help="model name in the API")
    ap.add("--lora", action="append", default=[],
           help="LoRA adapter GGUF (repeatable; hot-swappable scales via "
                "/lora-adapters)")
    ap.add("--lora-scale", type=float, default=1.0)
    ap.add("--kv-type", default="bf16", choices=("bf16", "f32", "q8"),
           help="KV cache storage type")
    ap.add("--spec", default=None, choices=("ngram", "draft"),
           help="speculative decoding mode inside continuous batching "
                "(ngram: self-drafting map; draft: --model-draft proposes; "
                "greedy slots only)")
    ap.add("-md", "--model-draft", default=None,
           help="draft model GGUF for --spec draft (same vocab; "
                "common/speculative.cpp draft type)")
    ap.add("--spec-k", type=int, default=8,
           help="max draft tokens per verify forward")
    ap.add("--swa-full", action="store_true",
           help="allocate full-context KV for SWA layers instead of the "
                "window-sized iSWA ring (reference --swa-full)")
    ap.add("--override-kv", action="append", default=[],
           metavar="KEY=TYPE:VALUE",
           help="metadata override, e.g. llama.rope.freq_base=float:1e6")
    ap.add("--slot-save-path", default=None,
           help="directory for /slots save/restore files "
                "(endpoints disabled when unset)")
    ap.add("--log-level", default=None,
           help="debug|info|warn|error|none (TPULLM_LOG_LEVEL)")
    ap.add("--mmproj", default=None,
           help="vision mmproj GGUF; enables image content parts")
    return ap


def main(argv=None):
    import os

    if os.environ.get("JAX_PLATFORMS"):
        # honor an explicit platform choice even when a sitecustomize
        # plugin overrides jax_platforms at interpreter startup (makes
        # spawned child servers — router mode, tests — hermetic)
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    args = build_args().parse(argv)

    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer
    from ..utils.log import get_logger, setup
    from .context import ServerContext
    from .http import serve

    if args.log_level:
        setup(level=args.log_level)
    log = get_logger("server")

    overrides = {}
    for spec in args.override_kv or []:
        key, _, tv = spec.partition("=")
        typ, _, val = tv.partition(":")
        cast = {"int": int, "float": float, "bool": lambda s: s.lower() == "true",
                "str": str}.get(typ, str)
        overrides[key] = cast(val if val else typ)

    from ..utils.download import resolve_model_arg

    res = resolve_model_arg(args.model, args.hf_repo, args.hf_file,
                            args.model_url,
                            offline=True if args.offline else None,
                            want_mmproj=args.mmproj is None)
    args.model = res.model_path
    if args.mmproj is None and res.mmproj_path:
        args.mmproj = res.mmproj_path

    log.info("loading %s ...", args.model)
    cfg, params, g = load_model(args.model, override_kv=overrides or None)
    draft = None
    if args.model_draft:
        log.info("loading draft model %s ...", args.model_draft)
        dcfg, dparams, _ = load_model(args.model_draft)
        draft = (dcfg, dparams)
        if args.spec is None:
            args.spec = "draft"

    tok = Tokenizer.from_gguf(g)
    import jax.numpy as jnp

    kv_dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32, "q8": "q8"}[args.kv_type]
    ctx = ServerContext(
        cfg, params, tok, n_slots=args.parallel, max_seq_len=args.ctx_size,
        decode_chunk=args.decode_chunk, prefill_chunk=args.prefill_chunk,
        model_name=args.alias or args.model.rsplit("/", 1)[-1],
        kv_dtype=kv_dtype,
        slot_save_path=args.slot_save_path,
        lora=[(p, args.lora_scale) for p in (args.lora or [])],
        mmproj_path=args.mmproj,
        iswa=not args.swa_full,
        spec=args.spec, spec_k=args.spec_k, draft=draft,
    )
    log.info("serving %s on http://%s:%s (%d slots, ctx %d)",
             cfg.arch, args.host, args.port, args.parallel, args.ctx_size)
    serve(ctx, args.host, args.port)


if __name__ == "__main__":
    main()
