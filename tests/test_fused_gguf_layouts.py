"""GGUF-fused tensor layouts: attn_qkv.weight and combined [gate;up].

Splitting quantized rows is exact (blocks are per-row), so a model written
fused must produce near-identical logits to the same rows written split."""
import numpy as np
import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.gguf.reader import GGUFFile
from tpullm.gguf.writer import GGUFWriter
from tpullm.models.llama import KVCache, forward
from tpullm.runtime.loader import load_model
from tpullm.utils.synth import build_llama_gguf


def _run(path):
    cfg, params, _ = load_model(path)
    tokens = jnp.asarray([[1, 5, 9]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)
    cache = KVCache.create(cfg, 1, 8)
    logits, _ = forward(params, cfg, tokens, pos, cache, 0,
                        jnp.zeros((1,), jnp.int32))
    return np.asarray(logits)


def _write_split_equivalent(fused_path: str, split_path: str, nq: int, nk: int):
    """Re-slice the fused model's quantized rows into split tensors."""
    src = GGUFFile(fused_path)
    wtr = GGUFWriter(split_path, arch=src.architecture)
    for key, val in src.metadata.items():
        if key != "general.architecture":
            wtr.add_kv(key, val)
    for name, ti in src.tensors.items():
        raw = src.tensor_data(name)
        if name.endswith("attn_qkv.weight"):
            rows = raw.reshape(ti.shape[1], -1)  # quantized rows
            pre = name[: -len("attn_qkv.weight")]
            wtr.add_tensor(pre + "attn_q.weight", rows[:nq].tobytes(),
                           ti.ggml_type, (ti.shape[0], nq))
            wtr.add_tensor(pre + "attn_k.weight", rows[nq:nq + nk].tobytes(),
                           ti.ggml_type, (ti.shape[0], nk))
            wtr.add_tensor(pre + "attn_v.weight", rows[nq + nk:].tobytes(),
                           ti.ggml_type, (ti.shape[0], nk))
        elif name.endswith("ffn_up.weight"):
            rows = raw.reshape(ti.shape[1], -1)
            half = ti.shape[1] // 2
            pre = name[: -len("ffn_up.weight")]
            wtr.add_tensor(pre + "ffn_gate.weight", rows[:half].tobytes(),
                           ti.ggml_type, (ti.shape[0], half))
            wtr.add_tensor(pre + "ffn_up.weight", rows[half:].tobytes(),
                           ti.ggml_type, (ti.shape[0], half))
        elif ti.ggml_type == GGMLType.F32:
            wtr.add_tensor(name, np.ascontiguousarray(
                raw.view(np.float32).reshape(ti.np_shape)))
        else:
            wtr.add_tensor(name, raw.tobytes(), ti.ggml_type, tuple(ti.shape))
    wtr.write()


def test_fused_qkv_and_combined_gateup(tmp_path):
    shape = dict(vocab_size=128, n_embd=256, n_layer=2, n_head=4,
                 n_head_kv=2, n_ff=256, qtype=GGMLType.Q8_0, seed=9)
    fused = str(tmp_path / "fused.gguf")
    build_llama_gguf(fused, fused_qkv=True, combined_gateup=True, **shape)

    cfgF, paramsF, _ = load_model(fused)
    assert "wqkv_cat" in paramsF["layers"], list(paramsF["layers"])

    split = str(tmp_path / "split.gguf")
    _write_split_equivalent(fused, split, nq=4 * 64, nk=2 * 64)
    cfgS, paramsS, _ = load_model(split)
    assert "wq" in paramsS["layers"] or "wqkv" in paramsS["layers"]

    out_fused = _run(fused)
    out_split = _run(split)
    np.testing.assert_allclose(out_fused, out_split, rtol=2e-2, atol=2e-2)
    assert np.abs(out_fused - out_split).mean() < 2e-3
