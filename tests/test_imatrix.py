"""imatrix collection + weighted quantization end-to-end."""
import numpy as np

from tpullm.gguf.constants import GGMLType
from tpullm.utils.synth import build_llama_gguf


def test_imatrix_collect_write_read(tmp_path):
    from tpullm.tools.imatrix import collect_imatrix, read_imatrix, write_imatrix

    p = str(tmp_path / "m.gguf")
    build_llama_gguf(p, vocab_size=256, n_embd=256, n_layer=2, n_head=4,
                     n_head_kv=2, n_ff=256, qtype=GGMLType.F16, with_vocab=True)
    text = " ".join(f"tok{i % 30}" for i in range(600))
    data = collect_imatrix(p, text, n_ctx=64, max_chunks=3, progress=False)
    assert data["n_tokens"] > 0
    assert "blk.0.attn_q.weight" in data["sums"]
    assert data["sums"]["blk.0.ffn_down.weight"].shape == (256,)
    assert (data["sums"]["blk.0.attn_q.weight"] > 0).any()

    out = str(tmp_path / "im.gguf")
    write_imatrix(out, data)
    back = read_imatrix(out)
    assert "blk.0.attn_q.weight" in back
    np.testing.assert_allclose(
        back["blk.1.ffn_up.weight"] * data["n_tokens"],
        data["sums"]["blk.1.ffn_up.weight"], rtol=1e-5)


def test_weighted_quantize_improves_weighted_error(tmp_path):
    """K-quant scale search with imatrix should reduce weighted RMSE."""
    from tpullm.quant.numpy_impl import dequantize, quantize

    rng = np.random.default_rng(0)
    n = 512
    w = rng.standard_normal((64, n)).astype(np.float32) * 0.05
    # importance concentrated on the first half of the columns
    imat = np.ones(n, np.float32)
    imat[: n // 2] = 50.0
    raw_plain = quantize(w, GGMLType.Q4_K)
    raw_im = quantize(w, GGMLType.Q4_K, imatrix=imat)
    d_plain = dequantize(raw_plain, GGMLType.Q4_K)
    d_im = dequantize(raw_im, GGMLType.Q4_K)

    def werr(d):
        return float((imat[None, :] * (d - w) ** 2).sum())

    assert werr(d_im) <= werr(d_plain) * 1.02  # no worse; usually better


def test_quantize_tool_with_imatrix(tmp_path):
    from tpullm.tools.imatrix import collect_imatrix, write_imatrix
    from tpullm.tools.quantize import quantize_gguf
    from tpullm.gguf.reader import GGUFFile

    p = str(tmp_path / "m.gguf")
    build_llama_gguf(p, vocab_size=256, n_embd=256, n_layer=2, n_head=4,
                     n_head_kv=2, n_ff=256, qtype=GGMLType.F16, with_vocab=True)
    text = " ".join(f"tok{i % 30}" for i in range(400))
    data = collect_imatrix(p, text, n_ctx=64, max_chunks=2, progress=False)
    im = str(tmp_path / "im.gguf")
    write_imatrix(im, data)
    dst = str(tmp_path / "q.gguf")
    stats = quantize_gguf(p, dst, "Q4_K_M", nthread=2, imatrix_path=im)
    assert stats["tensors"] > 0
    g = GGUFFile(dst)
    assert g.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q4_K
