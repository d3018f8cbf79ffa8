"""Regenerate the quant-format support table in docs/ops.md FROM the code.

The table between the GEN-FORMATS markers is derived from:
  - tpullm.quant.numpy_impl.dequant_supported() / quant_supported()
  - tpullm.quant.kmajor.KM_SPECS (fused Pallas matmul path + storage kind)
  - tpullm.gguf.constants.GGML_QUANT_SIZES (reference bpw)
  - tpullm.tools.quantize imatrix-aware encoders

Run: python scripts/gen_ops_md.py [--check]
--check exits 1 if docs/ops.md disagrees with the code (CI-style guard;
tests/test_docs.py runs it so docs rot fails the suite).
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpullm.gguf.constants import GGML_QUANT_SIZES, GGMLType
from tpullm.quant.kmajor import KM_SPECS
from tpullm.quant.numpy_impl import dequant_supported, quant_supported

BEGIN = "<!-- GEN-FORMATS (scripts/gen_ops_md.py) -->"
END = "<!-- /GEN-FORMATS -->"

# row order mirrors the reference's ggml.h type enum grouping
ORDER = [
    "Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0", "Q8_1",
    "Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K", "Q8_K",
    "IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ3_XXS", "IQ3_S", "IQ1_S", "IQ1_M",
    "IQ4_NL", "IQ4_XS", "TQ1_0", "TQ2_0", "MXFP4", "NVFP4",
    "F16", "BF16", "F32",
]

# imatrix-weighted search support (tools/quantize.py --imatrix consumers)
IMATRIX = {"Q4_K", "Q5_K", "Q6_K", "IQ4_NL", "IQ4_XS", "IQ2_XXS", "IQ2_XS",
           "IQ2_S", "IQ3_XXS", "IQ3_S", "IQ1_S", "IQ1_M", "NVFP4"}
ACTIVATION = {"Q8_1", "Q8_K"}  # activation-side types, never a weight format


def _bpw(t: GGMLType) -> float:
    blk, nbytes = GGML_QUANT_SIZES[t]
    return nbytes * 8.0 / blk


def table() -> str:
    dec, enc = dequant_supported(), quant_supported()
    lines = [
        "| Format | bpw | Decode (bit-exact) | Encode | Fused Pallas matmul "
        "| imatrix-weighted encode |",
        "|---|---|---|---|---|---|",
    ]
    for name in ORDER:
        t = GGMLType[name]
        spec = KM_SPECS.get(t)
        if name in ACTIVATION:
            fused = "(activation type)"
        elif spec is not None:
            kind = {"u4": "sub-byte u4", "i8": "i8 path"}[spec.kind]
            fused = f"✅ ({kind}{', LUT' if spec.lut else ''})"
        elif t in (GGMLType.F16, GGMLType.BF16, GGMLType.F32):
            fused = "dense XLA"
        else:
            fused = "dense-at-load"
        lines.append(
            f"| {name} | {_bpw(t):.2f} | {'✅' if t in dec else '🚫'} "
            f"| {'✅' if t in enc else '🚫'} | {fused} "
            f"| {'✅' if name in IMATRIX else '—'} |")
    return "\n".join(lines)


def main() -> int:
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "ops.md")
    with open(path) as f:
        text = f.read()
    block = f"{BEGIN}\n{table()}\n{END}"
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(text):
        print(f"markers not found in {path}", file=sys.stderr)
        return 2
    new = pat.sub(lambda _: block, text)
    if "--check" in sys.argv:
        if new != text:
            print("docs/ops.md is stale vs the code — run "
                  "scripts/gen_ops_md.py", file=sys.stderr)
            return 1
        return 0
    with open(path, "w") as f:
        f.write(new)
    print(f"regenerated {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
