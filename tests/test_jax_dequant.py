"""XLA dequant path must match the numpy reference bit-exactly (f32)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpullm.gguf import GGMLType
from tpullm.ops import dequant_jax, QTensor
from tpullm.ops.qtensor import qtensor_from_bytes, qtensor_from_float
from tpullm.quant import dequantize, quantize
from tpullm.quant.layout import decode_planar, PLANAR_TYPES


def synth(n_rows, n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 0.05, size=(n_rows, n)).astype(np.float32)
    x[0, :5] = 0.0
    return x


QTYPES = sorted(PLANAR_TYPES - {GGMLType.Q8_K}, key=int) + [GGMLType.Q8_K]


def _payload(qtype, n_rows, n, seed):
    """Quantize real data, or craft valid random bytes for decode-only types."""
    from tpullm.gguf.constants import GGML_QUANT_SIZES
    from tpullm.quant import quant_supported

    if qtype in quant_supported():
        return quantize(synth(n_rows, n, seed), qtype)
    rng = np.random.default_rng(seed)
    blk, bs = GGML_QUANT_SIZES[qtype]
    raw = rng.integers(0, 256, size=(n_rows, n // blk, bs), dtype=np.uint8)
    f16 = np.float16(rng.uniform(0.01, 0.1, size=(n_rows, n // blk))).view(np.uint16)
    raw[..., 0] = (f16 & 0xFF).astype(np.uint8)
    raw[..., 1] = (f16 >> 8).astype(np.uint8)
    return raw.reshape(n_rows, -1)


@pytest.mark.parametrize("qtype", QTYPES)
def test_jax_dequant_bitexact(qtype):
    raw = _payload(qtype, 3, 512, seed=int(qtype))
    want = dequantize(raw, qtype)
    planar = decode_planar(raw, qtype)
    planar = {k: jnp.asarray(np.ascontiguousarray(v)) for k, v in planar.items()}
    got = np.asarray(jax.jit(lambda p: dequant_jax(p, qtype))(planar))
    np.testing.assert_array_equal(got, want, err_msg=qtype.name)


def test_qtensor_pytree_and_matmul():
    w = synth(64, 256, seed=1)
    qt = qtensor_from_float(w, GGMLType.Q4_K)
    assert qt.is_quantized and qt.shape == (64, 256)
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qt2.qtype == GGMLType.Q4_K

    @jax.jit
    def mm(x, qt):
        return jnp.dot(x, qt.dequant(jnp.float32).T, precision=jax.lax.Precision.HIGHEST)

    x = np.ones((2, 256), np.float32)
    y = np.asarray(mm(x, qt))
    want = x @ dequantize(quantize(w, GGMLType.Q4_K), GGMLType.Q4_K).T
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


def test_qtensor_from_bytes_float_types():
    w = synth(4, 128, seed=2)
    for t in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        raw = quantize(w, t).reshape(-1)
        qt = qtensor_from_bytes(raw, t, (4, 128))
        got = np.asarray(qt.dequant(jnp.float32))
        want = dequantize(raw.reshape(4, -1), t)
        np.testing.assert_array_equal(got, want, err_msg=t.name)
