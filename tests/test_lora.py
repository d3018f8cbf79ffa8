"""Runtime LoRA: adapter GGUF load + apply == dense weight folding."""
import numpy as np
import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.gguf.writer import GGUFWriter
from tpullm.models.llama import KVCache, forward
from tpullm.ops.qtensor import QTensor
from tpullm.runtime.loader import load_model
from tpullm.runtime.lora import apply_lora_to_params, load_lora
from tpullm.utils.synth import build_llama_gguf


def _write_adapter(path, n_layer, n_embd, n_head_q, r, rng, alpha=16.0):
    w = GGUFWriter(path, arch="llama")
    w.add_string("general.type", "adapter")
    w.add_string("adapter.type", "lora")
    w.add_float32("adapter.lora.alpha", alpha)
    tensors = {}
    for l in range(n_layer):
        a = (rng.standard_normal((r, n_embd)) * 0.05).astype(np.float32)
        b = (rng.standard_normal((n_head_q, r)) * 0.05).astype(np.float32)
        w.add_tensor(f"blk.{l}.attn_q.weight.lora_a", a)
        w.add_tensor(f"blk.{l}.attn_q.weight.lora_b", b)
        tensors[l] = (a, b)
    w.write()
    return tensors


def test_lora_apply_equals_folding(tmp_path):
    rng = np.random.default_rng(0)
    base = str(tmp_path / "base.gguf")
    n_embd, n_layer = 256, 2
    build_llama_gguf(base, vocab_size=128, n_embd=n_embd, n_layer=n_layer,
                     n_head=4, n_head_kv=2, n_ff=256, qtype=GGMLType.Q8_0)
    cfg, params, _ = load_model(base, fuse=False)

    r, alpha, scale = 4, 16.0, 1.0
    ad = str(tmp_path / "adapter.gguf")
    tensors = _write_adapter(ad, n_layer, n_embd, n_embd, r, rng, alpha)

    lora, meta = load_lora(ad, n_layer, scale)
    assert meta["rank"] == r and meta["alpha"] == alpha
    lp = apply_lora_to_params(params, lora, meta)

    tokens = jnp.asarray([[3, 9, 27]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)

    def run(p):
        cache = KVCache.create(cfg, 1, 8)
        logits, _ = forward(p, cfg, tokens, pos, cache, 0, vf)
        return np.asarray(logits)

    with_lora = run(lp)
    base_out = run(params)
    assert not np.allclose(with_lora, base_out, atol=1e-3)  # adapter bites

    # fold: W'q = Wq + (alpha/r)*B@A as dense f32 weights
    folded = dict(params)
    layers = dict(params["layers"])
    wq = layers["wq"]
    dense = []
    for l in range(n_layer):
        sub = QTensor(wq.qtype, wq.shape[1:], {k: v[l] for k, v in wq.data.items()})
        a, b = tensors[l]
        dense.append(np.asarray(sub.dequant(jnp.float32)) + (alpha / r) * (b @ a))
    layers["wq"] = QTensor(GGMLType.F32, (n_layer,) + wq.shape[1:],
                           {"w": jnp.asarray(np.stack(dense))})
    folded["layers"] = layers
    folded_out = run(folded)
    np.testing.assert_allclose(with_lora, folded_out, rtol=0.1, atol=0.15)
    err = np.abs(with_lora - folded_out).mean()
    assert err < 0.02, err


def test_control_vector(tmp_path):
    import numpy as np
    import jax.numpy as jnp

    from tpullm.gguf.writer import GGUFWriter
    from tpullm.runtime.lora import apply_control_vector, load_control_vector
    from tpullm.utils.synth import build_llama_gguf

    base = str(tmp_path / "b.gguf")
    build_llama_gguf(base, vocab_size=128, n_embd=128, n_layer=2, n_head=4,
                     n_head_kv=2, n_ff=128, qtype=GGMLType.Q8_0)
    cfg, params, _ = load_model(base)

    cv = str(tmp_path / "cv.gguf")
    w = GGUFWriter(cv, arch="controlvector")
    rng = np.random.default_rng(0)
    dirs_ref = rng.standard_normal((2, 128)).astype(np.float32) * 0.2
    for l in range(2):
        w.add_tensor(f"direction.{l + 1}", dirs_ref[l])
    w.write()

    dirs = load_control_vector(cv, cfg.n_layer)
    np.testing.assert_allclose(dirs, dirs_ref, rtol=1e-6)
    cp = apply_control_vector(params, dirs)

    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)
    vf = jnp.zeros((1,), jnp.int32)

    def run(p):
        cache = KVCache.create(cfg, 1, 8)
        logits, _ = forward(p, cfg, tokens, pos, cache, 0, vf)
        return np.asarray(logits)

    out_cv = run(cp)
    out_base = run(params)
    assert not np.allclose(out_cv, out_base, atol=1e-3)
    # zero vector is a no-op
    zero = apply_control_vector(params, np.zeros_like(dirs_ref))
    np.testing.assert_allclose(run(zero), out_base, rtol=1e-4, atol=1e-4)
