"""Multimodal CLI — the reference's llama-mtmd-cli analogue
(tools/mtmd/mtmd-cli.cpp): text LM + mmproj vision tower, prompt with
``<__media__>`` markers, one --image per marker.

Usage:
  python -m tpullm.tools.mtmd_cli -m model.gguf --mmproj mmproj.gguf \
      --image cat.png -p "describe this: <__media__>" -n 64
"""
from __future__ import annotations

import sys

import jax.numpy as jnp

from ..multimodal import DEFAULT_MARKER, MtmdContext
from ..runtime.engine import InferenceEngine
from ..runtime.loader import load_model
from ..ops.sampling import SamplerConfig
from ..tokenizer import Tokenizer
from ..utils.args import ArgLayer


def main(argv=None):
    ap = ArgLayer("tpullm.tools.mtmd_cli")
    ap.add("-m", "--model", required=True)
    ap.add("--mmproj", required=True)
    ap.add("--image", action="append", default=[], help="one per marker")
    ap.add("-p", "--prompt", default=f"describe: {DEFAULT_MARKER}")
    ap.add("-n", "--n-predict", type=int, default=64)
    ap.add("-c", "--ctx-size", type=int, default=1024)
    ap.add("--temp", type=float, default=0.0)
    ap.add("--seed", type=int, default=0)
    args = ap.parse(argv)

    cfg, params, g = load_model(args.model)
    tok = Tokenizer.from_gguf(g)
    ctx = MtmdContext(args.mmproj)
    print(f"vision: {ctx.cfg.proj_type} proj, {ctx.n_tokens_per_image} "
          f"tokens/image", file=sys.stderr)

    chunks = ctx.tokenize(tok, args.prompt, n_images=len(args.image))
    embeds, ids = ctx.embed_prompt(params, chunks, args.image)

    eng = InferenceEngine(cfg, params, max_seq_len=args.ctx_size,
                          compute_dtype=jnp.bfloat16)
    sampler = SamplerConfig(temperature=args.temp)
    r = eng.generate([ids], max_new_tokens=args.n_predict, sampler=sampler,
                     seed=args.seed, eos_id=tok.vocab.eos_id,
                     embeds=[embeds])
    try:
        print(tok.decode(r.tokens[0]))
    except IndexError:  # synthetic models: vocab table shorter than n_vocab
        print(r.tokens[0])


if __name__ == "__main__":
    main()
