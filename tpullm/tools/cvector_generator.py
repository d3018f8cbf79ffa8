"""llama-cvector-generator analogue: build a control-vector GGUF from
positive/negative prompt pairs.

For each prompt pair, collect every layer's residual output at the last
token; per layer, the control direction is the top principal component of
the (n_pairs, n_embd) positive-negative difference matrix (power
iteration, tools/cvector-generator/pca.hpp) or the plain mean
(--method mean), sign-aligned with the mean difference. Directions write
as direction.{i} tensors (1-based, src/llama-adapter.cpp cvec loader) so
the output loads in both engines.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def collect_hiddens(cfg, params, tok, prompts: list[str]) -> np.ndarray:
    """-> (n_prompts, n_layer, n_embd): last-token residual per layer."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import KVCache, forward

    out = []
    for text in prompts:
        ids = tok.encode(text, add_special=True)
        T = len(ids)
        cache = KVCache.create(cfg, 1, max(T, 16), jnp.float32)
        _, _, hs = forward(
            params, cfg=cfg, tokens=jnp.asarray([ids], jnp.int32),
            positions=jnp.arange(T, dtype=jnp.int32)[None],
            cache=cache, cache_pos=0, valid_from=jnp.zeros(1, jnp.int32),
            dtype=jnp.float32, collect_hidden=True)
        out.append(np.asarray(hs[:, 0, -1, :], np.float32))  # (L, D)
    return np.stack(out)


def pca_direction(diff: np.ndarray, iters: int = 100) -> np.ndarray:
    """Top principal component of (n, D) rows via power iteration."""
    x = diff - diff.mean(0, keepdims=True) * 0.0  # reference: no centering
    cov = x.T @ x
    rng = np.random.default_rng(0)
    v = rng.standard_normal(x.shape[1]).astype(np.float32)
    v /= np.linalg.norm(v) + 1e-12
    for _ in range(iters):
        v = cov @ v
        v /= np.linalg.norm(v) + 1e-12
    return v


def build_cvector(cfg, params, tok, positives: list[str],
                  negatives: list[str], method: str = "pca") -> np.ndarray:
    assert len(positives) == len(negatives)
    hp = collect_hiddens(cfg, params, tok, positives)  # (n, L, D)
    hn = collect_hiddens(cfg, params, tok, negatives)
    diff = hp - hn  # (n, L, D)
    L = diff.shape[1]
    dirs = np.zeros((L, diff.shape[2]), np.float32)
    # the reference skips the final layer (calc_diff NOTE)
    for li in range(L - 1):
        d = diff[:, li, :]
        if not np.abs(d).sum():
            continue
        if method == "mean":
            v = d.mean(0)
        else:
            v = pca_direction(d)
            # sign-align with the mean difference (pca.hpp behavior via
            # the generator's post-hoc check)
            if float(v @ d.mean(0)) < 0:
                v = -v
        dirs[li] = v
    return dirs


def write_cvector_gguf(path: str, dirs: np.ndarray, arch: str = "controlvector"):
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(path, arch=arch)
    w.add_string("general.type", "controlvector")
    w.add_uint32("controlvector.layer_count", int(dirs.shape[0]))
    for i in range(dirs.shape[0]):
        if not np.abs(dirs[i]).sum():
            continue
        w.add_tensor(f"direction.{i + 1}", dirs[i].astype(np.float32))
    w.write()
    return path


def main(argv=None):
    ap = argparse.ArgumentParser("tpullm.tools.cvector_generator")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--positive-file", required=True,
                    help="one positive prompt per line")
    ap.add_argument("--negative-file", required=True)
    ap.add_argument("--method", default="pca", choices=("pca", "mean"))
    ap.add_argument("-o", "--output", default="control_vector.gguf")
    args = ap.parse_args(argv)

    from ..runtime.loader import load_model
    from ..tokenizer import Tokenizer

    cfg, params, g = load_model(args.model, fuse=False)
    tok = Tokenizer.from_gguf(g)
    with open(args.positive_file) as f:
        pos = [ln.rstrip("\n") for ln in f if ln.strip()]
    with open(args.negative_file) as f:
        neg = [ln.rstrip("\n") for ln in f if ln.strip()]
    n = min(len(pos), len(neg))
    dirs = build_cvector(cfg, params, tok, pos[:n], neg[:n],
                         method=args.method)
    write_cvector_gguf(args.output, dirs)
    print(f"wrote {args.output} ({dirs.shape[0]} layers)", file=sys.stderr)


if __name__ == "__main__":
    main()
