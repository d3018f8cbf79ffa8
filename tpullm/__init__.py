"""tpullm — a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of llama.cpp
(reference surveyed in SURVEY.md): direct GGUF loading, ggml block-quant
formats executed through fused dequant+matmul kernels on the MXU, paged
quantized KV-cache, on-device sampling, continuous-batching serving, and
mesh-sharded multi-chip execution via GSPMD.
"""

__version__ = "0.1.0"
