"""Fused dequant-matmul kernel vs XLA-dequant oracle (test-backend-ops analogue).

The reference keeps 15 backends honest by comparing every op against the CPU
backend under an NMSE threshold (tests/test-backend-ops.cpp). Here the Pallas
kernel (interpret mode on CPU) is compared against the planar-dequant XLA
path, which itself is bit-exact vs ggml dequantize_row_* (test_jax_dequant).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.ops.qtensor import QTensor, qtensor_from_float
from tpullm.ops.qmm import qmm, qmm_kmajor, qmm_supported
from tpullm.quant.kmajor import KMAJOR_TYPES, pack_kmajor, dequant_kmajor_jnp

KM_TYPES = sorted(KMAJOR_TYPES, key=lambda t: t.name)


def _mk(qtype, N, K, seed=0):
    from tpullm.quant.numpy_impl import quant_supported
    from tpullm.ops.qtensor import qtensor_from_bytes
    from tpullm.utils.synth import random_payload

    rng = np.random.default_rng(seed)
    if qtype in quant_supported():
        w = (rng.standard_normal((N, K)) * 0.02).astype(np.float32)
        qt_planar = qtensor_from_float(w, qtype, device_put=False, layout="planar")
        qt_km = qtensor_from_float(w, qtype, device_put=False, layout="kmajor")
    else:  # no encoder (IQ types): random structurally-valid payload
        raw = random_payload(qtype, N, K, rng)
        qt_planar = qtensor_from_bytes(raw.reshape(-1), qtype, (N, K), False, "planar")
        qt_km = qtensor_from_bytes(raw.reshape(-1), qtype, (N, K), False, "kmajor")
        w = None
    return w, qt_planar, qt_km


def _nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(((a - b) ** 2).mean() / max((b**2).mean(), 1e-30))


@pytest.mark.parametrize("qtype", KM_TYPES)
def test_kmajor_dequant_matches_planar(qtype):
    """kmajor XLA dequant == planar XLA dequant (exact same f32 math)."""
    N, K = 64, 512
    _, qt_p, qt_k = _mk(qtype, N, K)
    w_p = np.asarray(qt_p.dequant(jnp.float32))
    w_k = np.asarray(qt_k.dequant(jnp.float32))
    np.testing.assert_allclose(w_k, w_p, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("qtype", KM_TYPES)
@pytest.mark.parametrize("M", [1, 7, 64])
def test_qmm_kernel_vs_oracle(qtype, M):
    N, K = 384, 512
    if not qmm_supported(qtype, K):
        K = 8 * 256
    _, qt_p, qt_k = _mk(qtype, N, K, seed=int(qtype))
    rng = np.random.default_rng(1 + M)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    y = np.asarray(
        qmm_kmajor(x, {k: jnp.asarray(v) for k, v in qt_k.data.items()},
                   qtype, N, jnp.float32, interpret=True)
    )
    w = np.asarray(qt_p.dequant(jnp.float32))
    y_ref = np.asarray(x, np.float32) @ w.T
    assert y.shape == (M, N)
    assert _nmse(y, y_ref) < 5e-5, f"{qtype.name}: nmse {_nmse(y, y_ref)}"


def test_qmm_batched_leading_dims():
    qtype = GGMLType.Q4_K
    N, K = 256, 512
    _, qt_p, qt_k = _mk(qtype, N, K)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3, K)), jnp.bfloat16)
    y = np.asarray(qmm(x, qt_k, jnp.float32, interpret=True))
    w = np.asarray(qt_p.dequant(jnp.float32))
    y_ref = np.asarray(x, np.float32).reshape(6, K) @ w.T
    assert y.shape == (2, 3, N)
    assert _nmse(y.reshape(6, N), y_ref) < 5e-5


def test_qmm_fallback_matches_kernel():
    """Off-TPU dispatcher falls back to dequant+dot; same result (to bf16)."""
    qtype = GGMLType.Q8_0
    N, K = 256, 512
    _, qt_p, qt_k = _mk(qtype, N, K)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((5, K)), jnp.bfloat16)
    y_fb = np.asarray(qmm(x, qt_k, jnp.float32), np.float32)  # fallback on CPU
    y_kn = np.asarray(qmm(x, qt_k, jnp.float32, interpret=True), np.float32)
    assert _nmse(y_kn, y_fb) < 5e-5


def test_take_rows_kmajor():
    qtype = GGMLType.Q4_K
    N, K = 300, 512  # N gets padded to 512 internally
    w, qt_p, qt_k = _mk(qtype, N, K)
    idx = jnp.asarray([[0, 5], [299, 17]])
    got = np.asarray(qt_k.take_rows(idx, jnp.float32))
    ref = np.asarray(qt_p.dequant(jnp.float32))[np.asarray(idx)]
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_qmm_stacked_layer_index():
    """Layer-stacked weights + in-kernel scalar-prefetch layer indexing."""
    qtype = GGMLType.Q4_K
    L, N, K = 3, 256, 512
    qts = [_mk(qtype, N, K, seed=s)[2] for s in range(L)]
    stacked = {k: jnp.asarray(np.stack([np.asarray(t.data[k]) for t in qts]))
               for k in qts[0].data}
    st_qt = QTensor(qtype, (L, N, K), stacked)
    planars = [_mk(qtype, N, K, seed=s)[1] for s in range(L)]
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.bfloat16)
    for l in range(L):
        y = np.asarray(qmm(x, st_qt, jnp.float32, layer=jnp.int32(l), interpret=True))
        w = np.asarray(planars[l].dequant(jnp.float32))
        y_ref = np.asarray(x, np.float32) @ w.T
        assert _nmse(y, y_ref) < 5e-5, f"layer {l}"
    # fallback path (no interpret, CPU): dynamic slice + dequant
    y_fb = np.asarray(qmm(x, st_qt, jnp.float32, layer=jnp.int32(1)))
    w = np.asarray(planars[1].dequant(jnp.float32))
    assert _nmse(y_fb, np.asarray(x, np.float32) @ w.T) < 5e-5


def test_npad_masked_out():
    """Padded output columns never leak: n_logical slicing."""
    qtype = GGMLType.Q4_0
    N, K = 200, 512
    _, qt_p, qt_k = _mk(qtype, N, K)
    assert qt_k.data["q"].shape[1] == 256  # padded
    x = jnp.ones((1, K), jnp.bfloat16)
    y = qmm_kmajor(x, {k: jnp.asarray(v) for k, v in qt_k.data.items()},
                   qtype, N, jnp.float32, interpret=True)
    assert y.shape == (1, N)
