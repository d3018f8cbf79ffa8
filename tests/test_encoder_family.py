"""Encoder (BERT-family) variants: every registry row is a VERIFIED claim.

Mirrors the decoder snapshot harness (tests/test_arch_snapshots.py) for the
bidirectional encoders: fabricate each arch's exact tensor set
(utils/synth.build_encoder_gguf <- src/models/<arch>.cpp load_arch_tensors),
embed a fixed token batch, and regression-lock the pooled vectors against a
committed golden. Regenerate with TPULLM_UPDATE_SNAPSHOTS=1.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpullm.models.bert import embed_texts
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_encoder_gguf

SNAP_DIR = os.path.join(os.path.dirname(__file__), "snapshots")
UPDATE = os.environ.get("TPULLM_UPDATE_SNAPSHOTS") == "1"

ARCHS = ["nomic-bert", "nomic-bert-moe", "jina-bert-v2", "jina-bert-v3",
         "modern-bert", "neo-bert", "eurobert", "gemma-embedding"]


@pytest.mark.parametrize("arch", ARCHS)
def test_encoder_snapshot(arch, tmp_path):
    path = str(tmp_path / f"{arch}.gguf")
    kw = dict(seed=13)
    if arch in ("modern-bert", "jina-bert-v2"):
        kw["n_head_kv"] = 4  # MHA archs
    else:
        kw["n_head_kv"] = 2  # exercise GQA where the reference allows it
    build_encoder_gguf(path, arch, **kw)
    cfg, params, _ = load_model(path)
    assert cfg.arch == arch
    assert not cfg.causal

    tokens = np.array([[3, 9, 4, 17, 6, 11, 2, 0],
                       [5, 7, 12, 0, 0, 0, 0, 0]], np.int32)
    n_real = np.array([7, 3], np.int32)
    out = np.asarray(embed_texts(params, cfg, jnp.asarray(tokens),
                                 jnp.asarray(n_real), "mean", jnp.float32))
    assert np.isfinite(out).all()
    # mean-pooled + L2-normalized
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-4)

    snap_path = os.path.join(SNAP_DIR, f"enc_{arch}.npz")
    if UPDATE or not os.path.exists(snap_path):
        os.makedirs(SNAP_DIR, exist_ok=True)
        np.savez_compressed(snap_path, out=out)
        if not UPDATE:
            pytest.skip(f"snapshot created for {arch}; commit it")
        return
    snap = np.load(snap_path)
    np.testing.assert_allclose(out, snap["out"], rtol=2e-4, atol=2e-5)


def test_padding_invariance():
    """Extra right-padding must not change the embedding (mask correctness
    incl. the symmetric-SWA and ALiBi paths)."""
    for arch in ("modern-bert", "jina-bert-v2"):
        path = f"/tmp/encpad_{arch}.gguf"
        build_encoder_gguf(path, arch, seed=3)
        cfg, params, _ = load_model(path)
        toks = [4, 9, 2, 15, 8]
        a = np.zeros((1, 8), np.int32); a[0, :5] = toks
        b = np.zeros((1, 16), np.int32); b[0, :5] = toks
        n = np.array([5], np.int32)
        va = np.asarray(embed_texts(params, cfg, jnp.asarray(a),
                                    jnp.asarray(n), "mean", jnp.float32))
        vb = np.asarray(embed_texts(params, cfg, jnp.asarray(b),
                                    jnp.asarray(n), "mean", jnp.float32))
        np.testing.assert_allclose(va, vb, rtol=1e-4, atol=1e-5)
