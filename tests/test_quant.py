"""Quant format tests.

Dequantization must be bit-exact vs the reference python mirror (gguf-py,
used as oracle only). Quantization is validated three ways: bit-exact vs
gguf-py for the types it implements, oracle-dequant of our bytes matches our
dequant, and round-trip RMSE within the reference's own error budget
(tests/test-quantize-fns.cpp thresholds).
"""
import numpy as np
import pytest

from conftest import ref_gguf
from tpullm.gguf import GGMLType
from tpullm.gguf.constants import GGML_QUANT_SIZES
from tpullm.quant import dequantize, quantize

refgguf = ref_gguf()
RQ = refgguf.quants
RT = refgguf.GGMLQuantizationType


def synth(n_rows=4, n=512, seed=0):
    """Synthetic weights resembling LLM weight distributions."""
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 0.05, size=(n_rows, n)).astype(np.float32)
    # add outliers and exact zeros like real layers
    x[0, :7] = 0.0
    if n_rows > 1:
        x[1, 3] = 2.5
    if n_rows > 2:
        x[2, 10] = -1.7
    return x


DEQ_TYPES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
    GGMLType.MXFP4,
    GGMLType.TQ2_0,
    GGMLType.BF16,
    GGMLType.F16,
]


def _random_blocks(qtype, n_rows, n, seed=0):
    """Random (structurally valid) quantized payload bytes."""
    rng = np.random.default_rng(seed)
    blk, bs = GGML_QUANT_SIZES[qtype]
    raw = rng.integers(0, 256, size=(n_rows, n // blk, bs), dtype=np.uint8)
    # keep fp16 scale fields finite: clear exponent high bits of every 2-byte
    # field we know holds fp16 (conservative: clamp all bytes < 0x7c where the
    # fp16 high byte lives). Instead, easier: quantize real data.
    return raw


@pytest.mark.parametrize("qtype", DEQ_TYPES)
def test_dequant_bitexact_vs_oracle(qtype):
    """Quantize real data with the ORACLE, dequantize with both — bit-exact."""
    n = 512
    x = synth(4, n, seed=int(qtype))
    rt = RT[qtype.name]
    try:
        qbytes = RQ.quantize(x, rt)
    except NotImplementedError:
        pytest.skip(f"oracle cannot quantize {qtype.name}")
    ours = dequantize(qbytes.reshape(4, -1).view(np.uint8), qtype)
    theirs = RQ.dequantize(qbytes, rt).reshape(4, n)
    np.testing.assert_array_equal(ours, theirs, err_msg=f"{qtype.name} dequant mismatch")


K_TYPES_NO_ORACLE_QUANT = [
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
]


@pytest.mark.parametrize("qtype", K_TYPES_NO_ORACLE_QUANT)
def test_kquant_quantize_oracle_decodes_same(qtype):
    """Quantize with OURS, dequantize with oracle and ours — must agree."""
    x = synth(4, 512, seed=100 + int(qtype))
    qb = quantize(x, qtype)
    ours = dequantize(qb, qtype)
    theirs = RQ.dequantize(qb.reshape(-1).view(np.uint8), RT[qtype.name]).reshape(ours.shape)
    np.testing.assert_array_equal(ours, theirs, err_msg=f"{qtype.name}")


LEGACY_BITEXACT = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.MXFP4,
]


@pytest.mark.parametrize("qtype", LEGACY_BITEXACT)
def test_quantize_bitexact_vs_oracle(qtype):
    x = synth(4, 512, seed=7)
    ours = quantize(x, qtype).reshape(-1)
    theirs = RQ.quantize(x, RT[qtype.name]).reshape(-1).view(np.uint8)
    np.testing.assert_array_equal(ours, theirs, err_msg=f"{qtype.name} quantize mismatch")


# relative RMSE regression bounds (4-bit uniform quant has ~6% RMSE by
# construction; these guard against algorithmic regressions, not absolutes)
RMSE_BOUND = {
    GGMLType.Q4_0: 0.080,
    GGMLType.Q4_1: 0.080,
    GGMLType.Q5_0: 0.040,
    GGMLType.Q5_1: 0.040,
    GGMLType.Q8_0: 0.005,
    GGMLType.Q2_K: 0.350,
    GGMLType.Q3_K: 0.150,
    GGMLType.Q4_K: 0.080,
    GGMLType.Q5_K: 0.040,
    GGMLType.Q6_K: 0.015,
    GGMLType.Q8_K: 0.005,
    GGMLType.MXFP4: 0.300,
}


@pytest.mark.parametrize("qtype", sorted(RMSE_BOUND, key=int))
def test_roundtrip_rmse(qtype):
    rng = np.random.default_rng(3)
    # the reference test uses cosine-ish smooth data; amplitude ~1
    n = 4096
    x = (np.cos(np.arange(n) * 0.1) + 0.5 * np.sin(np.arange(n) * 0.33)).astype(np.float32)[None]
    qb = quantize(x, qtype)
    y = dequantize(qb, qtype)
    rmse = float(np.sqrt(np.mean((x - y) ** 2))) / float(np.sqrt(np.mean(x**2)))
    assert rmse < RMSE_BOUND[qtype], f"{qtype.name}: rmse {rmse}"


def _crafted_payload(qtype, n_rows, n, seed):
    """Structurally valid random payload: random quants, finite fp16 scales."""
    rng = np.random.default_rng(seed)
    blk, bs = GGML_QUANT_SIZES[qtype]
    raw = rng.integers(0, 256, size=(n_rows, n // blk, bs), dtype=np.uint8)
    # overwrite every fp16 scale field with a small finite value
    f16 = np.float16(rng.uniform(0.01, 0.1, size=(n_rows, n // blk))).view(np.uint16)
    offs = {
        GGMLType.IQ4_NL: [0],
        GGMLType.IQ4_XS: [0],
        GGMLType.Q4_K: [0, 2],
        GGMLType.Q6_K: [208],
        GGMLType.TQ2_0: [64],
    }[qtype]
    for off in offs:
        raw[..., off] = (f16 & 0xFF).astype(np.uint8)
        raw[..., off + 1] = (f16 >> 8).astype(np.uint8)
    return raw.reshape(n_rows, -1)


@pytest.mark.parametrize(
    "qtype",
    [GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.TQ2_0],
)
def test_dequant_random_payload_vs_oracle(qtype):
    raw = _crafted_payload(qtype, 3, 512, seed=int(qtype))
    ours = dequantize(raw, qtype)
    theirs = RQ.dequantize(raw.reshape(-1), RT[qtype.name]).reshape(ours.shape)
    np.testing.assert_array_equal(ours, theirs, err_msg=f"{qtype.name}")


def test_q8_k_bsums():
    x = synth(2, 512, seed=9)
    qb = quantize(x, GGMLType.Q8_K).reshape(2, 2, 292)
    qs = qb[..., 4:260].view(np.int8).astype(np.int32).reshape(2, 2, 16, 16)
    bsums = qb[..., 260:292].copy().view(np.int16).reshape(2, 2, 16)
    np.testing.assert_array_equal(qs.sum(-1), bsums.astype(np.int32))


def test_zero_blocks():
    for qtype in RMSE_BOUND:
        blk, _ = GGML_QUANT_SIZES[qtype]
        x = np.zeros((1, max(blk, 256)), np.float32)
        y = dequantize(quantize(x, qtype), qtype)
        np.testing.assert_array_equal(y, x, err_msg=qtype.name)


IQ_TYPES = [
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
]


@pytest.mark.parametrize("qtype", IQ_TYPES)
def test_iq_dequant_bitexact_vs_oracle(qtype):
    """Codebook i-quants: random payload bytes, bit-exact vs gguf-py."""
    from tpullm.gguf.constants import GGML_QUANT_SIZES

    rng = np.random.default_rng(int(qtype))
    _, bs = GGML_QUANT_SIZES[qtype]
    raw = rng.integers(0, 256, size=(3, 4 * bs), dtype=np.uint8)
    ours = dequantize(raw, qtype)
    theirs = RQ.dequantize(raw.reshape(-1), RT[qtype.name]).reshape(ours.shape)
    ok = np.nan_to_num(ours, nan=0, posinf=1e30, neginf=-1e30)
    ref = np.nan_to_num(theirs, nan=0, posinf=1e30, neginf=-1e30)
    np.testing.assert_array_equal(ok, ref, err_msg=qtype.name)


def test_iq_qtensor_runs_dense(tmp_path):
    """IQ weights load as dense-dequanted QTensors and matmul correctly."""
    import jax.numpy as jnp

    from tpullm.gguf.constants import GGML_QUANT_SIZES
    from tpullm.ops.qmm import qmm
    from tpullm.ops.qtensor import qtensor_from_bytes

    qtype = GGMLType.IQ2_XXS
    rng = np.random.default_rng(0)
    _, bs = GGML_QUANT_SIZES[qtype]
    N, K = 8, 512
    raw = rng.integers(0, 256, size=(N, K // 256 * bs), dtype=np.uint8)
    # sane embedded f16 super-scales (offset 0)
    d = np.full((N, K // 256), 0.02, np.float16).view(np.uint16)
    raw2 = raw.reshape(N, K // 256, bs).copy()
    raw2[..., 0] = (d & 0xFF).astype(np.uint8)
    raw2[..., 1] = (d >> 8).astype(np.uint8)
    raw = raw2.reshape(N, -1)

    qt = qtensor_from_bytes(raw.reshape(-1), qtype, (N, K))
    assert qt.layout == "dense"
    w = np.asarray(qt.dequant(jnp.float32))
    want = dequantize(raw, qtype)
    np.testing.assert_allclose(w, want, rtol=2e-2, atol=1e-4)  # bf16 store
    x = jnp.asarray(rng.standard_normal((2, K)), jnp.float32)
    y = np.asarray(qmm(x, qt, jnp.float32))
    np.testing.assert_allclose(y, np.asarray(x) @ w.T, rtol=2e-2, atol=2e-2)
    r = qt.take_rows(jnp.asarray([1, 3]), jnp.float32)
    np.testing.assert_allclose(np.asarray(r), w[[1, 3]], rtol=1e-6)


def test_tq1_0_nvfp4_decode_vs_reference_oracle():
    """TQ1_0 (powers-of-3 ternary) and NVFP4 (UE4M3-scaled e2m1) decode
    bit-exactly against the reference gguf-py dequantizers on random
    payloads (NaN f16 scales excluded — both engines propagate them)."""
    import sys

    sys.path.insert(0, "/root/reference/gguf-py")
    try:
        import gguf as refgguf
        from gguf.quants import dequantize as ref_dequant
    except Exception:
        pytest.skip("reference gguf-py unavailable")
    from tpullm.gguf.constants import GGML_QUANT_SIZES

    rng = np.random.default_rng(3)
    for tname in ("TQ1_0", "NVFP4"):
        t = GGMLType[tname]
        blk, bs = GGML_QUANT_SIZES[t]
        raw = rng.integers(0, 256, (4, 1024 // blk * bs), np.uint8)
        ours = dequantize(raw, t)
        theirs = ref_dequant(
            raw, getattr(refgguf.GGMLQuantizationType, tname)).reshape(ours.shape)
        ok = np.isfinite(theirs)
        assert (ours[ok] == theirs[ok]).all(), tname
        assert np.isnan(ours[~ok]).all() == np.isnan(theirs[~ok]).all(), tname


def test_iq4_quantize_layout_and_quality():
    """IQ4_NL/IQ4_XS quantizers: byte layout validated against the
    reference's own gguf-py dequantizer; quality beats Q4_0."""
    import sys

    sys.path.insert(0, "/root/reference/gguf-py")
    import gguf
    import gguf.quants as gq

    rng = np.random.default_rng(0)
    for t, n in ((GGMLType.IQ4_NL, 256), (GGMLType.IQ4_XS, 512)):
        x = rng.normal(0, 1.0, (8, n)).astype(np.float32)
        raw = quantize(x, t)
        ours = dequantize(raw, t).reshape(x.shape)
        ref = gq.dequantize(raw.reshape(8, -1),
                            getattr(gguf.GGMLQuantizationType, t.name))
        np.testing.assert_array_equal(ours, ref.reshape(x.shape))
        assert np.sqrt(((ours - x) ** 2).mean()) < 0.085
    x = rng.normal(0, 1.0, (8, 256)).astype(np.float32)
    e_nl = ((dequantize(quantize(x, GGMLType.IQ4_NL), GGMLType.IQ4_NL)
             .reshape(x.shape) - x) ** 2).mean()
    e_40 = ((dequantize(quantize(x, GGMLType.Q4_0), GGMLType.Q4_0)
             .reshape(x.shape) - x) ** 2).mean()
    assert e_nl < e_40


def test_iq4_imatrix_improves_weighted_error():
    rng = np.random.default_rng(3)
    for t, n in ((GGMLType.IQ4_NL, 256), (GGMLType.IQ4_XS, 512)):
        x = rng.normal(0, 1.0, (16, n)).astype(np.float32)
        im = np.linspace(0.1, 4.0, n).astype(np.float32)
        r0 = dequantize(quantize(x, t), t).reshape(x.shape)
        r1 = dequantize(quantize(x, t, imatrix=im), t).reshape(x.shape)
        e0 = (im * (r0 - x) ** 2).sum()
        e1 = (im * (r1 - x) ** 2).sum()
        assert e1 <= e0, (t.name, e0, e1)
