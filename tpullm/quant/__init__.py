from .numpy_impl import (
    dequantize,
    quantize,
    dequant_supported,
    quant_supported,
)

__all__ = ["dequantize", "quantize", "dequant_supported", "quant_supported"]
