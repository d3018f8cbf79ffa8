"""Diffusion-LM CLI (LLaDA/Dream): iterative denoising generation.

The llama-diffusion-cli analogue (examples/diffusion/diffusion-cli.cpp):
loads a diffusion-arch GGUF, pads the prompt with MASK tokens to
--max-length, and denoises for --steps full-sequence forwards.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.diffusion_cli")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--diffusion-algorithm", type=int, default=4,
                    help="0=origin 1=entropy 2=margin 3=random 4=confidence")
    ap.add_argument("--diffusion-block-length", type=int, default=0,
                    help=">0 selects the LLaDA block schedule")
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--diffusion-alg-temp", type=float, default=0.0)
    ap.add_argument("--diffusion-eps", type=float, default=1e-3)
    ap.add_argument("--diffusion-cfg-scale", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--diffusion-visual", action="store_true",
                    help="print the sequence at every step")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.family import model_family
    from ..models.llama import forward, KVCache
    from ..runtime.diffusion import DiffusionParams, diffusion_generate
    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer

    cfg, params, g = load_model(args.model)
    if not cfg.diffusion:
        print(f"error: {cfg.arch} is not a diffusion architecture",
              file=sys.stderr)
        return 1
    tok = Tokenizer.from_gguf(g)
    mask_id = g.metadata.get("tokenizer.ggml.mask_token_id")
    if mask_id is None:
        print("error: no tokenizer.ggml.mask_token_id in the GGUF",
              file=sys.stderr)
        return 1
    shift = g.metadata.get("diffusion.shift_logits", True)

    L = args.max_length

    @jax.jit
    def fwd(tokens):
        cache = KVCache.create(cfg, 1, L, jnp.bfloat16)
        logits, _ = forward(
            params, cfg=cfg, tokens=tokens,
            positions=jnp.arange(L, dtype=jnp.int32)[None],
            cache=cache, cache_pos=0,
            valid_from=jnp.zeros(1, jnp.int32), dtype=jnp.bfloat16)
        return logits.astype(jnp.float32)

    ids = tok.encode(args.prompt, add_special=True)
    alg = ["origin", "entropy", "margin", "random",
           "confidence"][args.diffusion_algorithm]
    p = DiffusionParams(
        steps=args.steps, max_length=L, mask_token_id=int(mask_id),
        algorithm=alg,
        schedule="block" if args.diffusion_block_length else "timestep",
        block_length=args.diffusion_block_length or 32,
        temperature=args.temp, top_k=args.top_k, top_p=args.top_p,
        alg_temp=args.diffusion_alg_temp, eps=args.diffusion_eps,
        cfg_scale=args.diffusion_cfg_scale,
        shift_logits=bool(shift), seed=args.seed)

    def cb(step, total, x):
        if args.diffusion_visual:
            txt = tok.decode([t for t in x.tolist() if t != int(mask_id)])
            print(f"[{step + 1}/{total}] {txt}", file=sys.stderr)

    out = diffusion_generate(fwd, ids, p, step_callback=cb)
    print(tok.decode(out[len(ids):].tolist()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
