from .dequant import dequant_jax
from .qtensor import QTensor, qtensor_from_bytes

__all__ = ["dequant_jax", "QTensor", "qtensor_from_bytes"]
