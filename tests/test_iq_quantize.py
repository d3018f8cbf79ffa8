"""i-quant encoders (IQ2_XXS/XS/S, IQ3_XXS/S): layout round-trip through the
bit-exact decoders + weighted-error parity vs the reference quantizer
(ggml_quantize_chunk via ctypes on the CPU reference build, when present)."""
import ctypes
import os

import numpy as np
import pytest

from tpullm.gguf.constants import GGMLType, GGML_QUANT_SIZES
from tpullm.quant import iq_quantize as iqq
from tpullm.quant.numpy_impl import dequantize, quantize

REF_LIB = "/tmp/refbuild/bin/libggml-base.so"

TYPES = [
    (GGMLType.IQ2_XXS, iqq.q_iq2_xxs),
    (GGMLType.IQ2_XS, iqq.q_iq2_xs),
    (GGMLType.IQ2_S, iqq.q_iq2_s),
    (GGMLType.IQ3_XXS, iqq.q_iq3_xxs),
    (GGMLType.IQ3_S, iqq.q_iq3_s),
    (GGMLType.IQ1_S, iqq.q_iq1_s),
    (GGMLType.IQ1_M, iqq.q_iq1_m),
]

# expected worst-case relative RMSE on N(0,1) data (these are 2-3 bpw codes;
# the reference itself sits at these levels on random gaussians)
MAX_RMSE = {
    GGMLType.IQ2_XXS: 0.42, GGMLType.IQ2_XS: 0.38, GGMLType.IQ2_S: 0.33,
    GGMLType.IQ3_XXS: 0.24, GGMLType.IQ3_S: 0.18,
    GGMLType.IQ1_S: 0.62, GGMLType.IQ1_M: 0.58,
}


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((4, 1024)) * 0.2).astype(np.float32)
    qw = (rng.random(256) + 0.1).astype(np.float32)
    return x, qw


@pytest.mark.parametrize("qtype,fn", TYPES, ids=lambda v: getattr(v, "name", ""))
def test_roundtrip_layout(qtype, fn, data):
    """Encoded blocks decode through the bit-exact layout decoders with
    sane error, and the byte count matches the format."""
    x, qw = data
    blocks = fn(x.reshape(-1, 256), qw=qw)
    blk, bs = GGML_QUANT_SIZES[qtype]
    assert blocks.shape == (x.size // 256, bs)
    y = dequantize(blocks.reshape(x.shape[0], -1), qtype)
    rel = np.sqrt(((y - x) ** 2).mean() / (x ** 2).mean())
    assert rel < MAX_RMSE[qtype], rel


@pytest.mark.parametrize("qtype", [t for t, _ in TYPES],
                         ids=lambda t: t.name)
def test_quantize_dispatch(qtype, data):
    """quantize() routes i-quants (with imatrix slicing) to the encoders."""
    x, qw = data
    im = np.tile(qw, 4).astype(np.float32)
    out = quantize(x, qtype, imatrix=im)
    y = dequantize(out, qtype)
    rel = np.sqrt(((y - x) ** 2).mean() / (x ** 2).mean())
    assert rel < MAX_RMSE[qtype]
    # no-imatrix path also works (reference refuses for XXS/XS; we degrade)
    out2 = quantize(x, qtype)
    assert out2.shape == out.shape


@pytest.mark.skipif(not os.path.exists(REF_LIB),
                    reason="reference CPU build not present")
@pytest.mark.parametrize("qtype,fn", TYPES, ids=lambda v: getattr(v, "name", ""))
def test_reference_weighted_error_parity(qtype, fn, data):
    """Weighted quantization error within 2% of ggml_quantize_chunk's
    (the VERDICT #6 'done' bar); XS/S/3S match the reference exactly."""
    x, qw = data
    rows, n = x.shape
    lib = ctypes.CDLL(REF_LIB)
    lib.ggml_quantize_chunk.restype = ctypes.c_size_t
    lib.ggml_quantize_chunk.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.ggml_quantize_init.argtypes = [ctypes.c_int]
    lib.ggml_quantize_init(int(qtype))
    blk, bs = GGML_QUANT_SIZES[qtype]
    qwn = np.tile(qw, n // 256).astype(np.float32)
    out = np.zeros(rows * (n // blk) * bs, np.uint8)
    lib.ggml_quantize_chunk(
        int(qtype), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.c_void_p), 0, rows, n,
        qwn.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    yref = dequantize(out.reshape(rows, -1), qtype)
    yo = dequantize(quantize(x, qtype, imatrix=qwn), qtype)
    w = np.broadcast_to(qwn, x.shape)
    eref = float((w * (yref - x) ** 2).sum())
    eo = float((w * (yo - x) ** 2).sum())
    assert eo <= eref * 1.02, (eo, eref)


def test_zero_blocks_encode_to_zero():
    x = np.zeros((1, 256), np.float32)
    for qtype, fn in TYPES:
        blocks = fn(x, qw=None)
        y = dequantize(blocks.reshape(1, -1), qtype)
        assert np.all(y == 0), qtype


# ---------------------------------------------------------------------------
# round-4 encoders: IQ1_S / IQ1_M (split-search + grid snap), TQ1_0, NVFP4


def _roundtrip(qtype, n=256, rows=16, scale=0.1, imatrix=True, seed=3):
    from tpullm.quant.numpy_impl import dequantize, quantize
    from tpullm.gguf.constants import GGML_QUANT_SIZES

    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((rows, n)) * scale).astype(np.float32)
    im = (rng.random(n).astype(np.float32) + 0.1) if imatrix else None
    blob = quantize(x, qtype, imatrix=im)
    blk, bs = GGML_QUANT_SIZES[qtype]
    y = np.asarray(dequantize(blob.reshape(rows, -1, bs), qtype)).reshape(
        x.shape)
    return x, blob, y


@pytest.mark.parametrize("qtype,max_rel", [
    (GGMLType.IQ1_S, 0.62), (GGMLType.IQ1_M, 0.58),
    (GGMLType.TQ1_0, 0.85), (GGMLType.NVFP4, 0.12),
])
def test_new_encoder_roundtrip(qtype, max_rel):
    n = 64 if qtype == GGMLType.NVFP4 else 256
    x, blob, y = _roundtrip(qtype, n=n)
    assert np.isfinite(y).all()
    rel = float(np.sqrt(((y - x) ** 2).mean() / (x ** 2).mean()))
    assert rel < max_rel, rel


@pytest.mark.parametrize("qtype", [GGMLType.IQ1_S, GGMLType.IQ1_M,
                                   GGMLType.TQ1_0, GGMLType.NVFP4])
def test_new_encoder_ggufpy_decode(qtype):
    """Byte-layout compatibility: gguf-py (the reference's own Python
    decoders) must decode our packed bytes to exactly our dequant values."""
    gguf = pytest.importorskip("gguf")
    from tpullm.gguf.constants import GGML_QUANT_SIZES

    n = 64 if qtype == GGMLType.NVFP4 else 256
    x, blob, y = _roundtrip(qtype, n=n)
    blk, bs = GGML_QUANT_SIZES[qtype]
    theirs = gguf.quants.dequantize(blob.reshape(-1, bs),
                                    qtype.value).reshape(x.shape)
    np.testing.assert_allclose(theirs, y, rtol=1e-5, atol=1e-7)


def test_iq1_no_imatrix_fallback():
    """The reference REFUSES IQ1_S without an imatrix; we degrade to
    uniform importance (documented deviation) — must stay decodable."""
    x, blob, y = _roundtrip(GGMLType.IQ1_S, imatrix=False)
    assert np.isfinite(y).all()
