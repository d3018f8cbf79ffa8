"""tpullm — a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of llama.cpp
(reference surveyed in SURVEY.md): direct GGUF loading, ggml block-quant
formats executed through fused dequant+matmul kernels on the MXU, paged
quantized KV-cache, on-device sampling, continuous-batching serving, and
mesh-sharded multi-chip execution via GSPMD.
"""

__version__ = "0.1.0"

import os as _os

# The fused decode layer kernel wants ~32 MB of VMEM windows (large tiles
# halve the sequential-grid stall overhead: 18.2 -> 13.9 ms/step on 8B);
# the default scoped-vmem budget is 16 MB. Must be set before the first
# backend init, hence here at package import.
_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"
_cur = _os.environ.get("LIBTPU_INIT_ARGS", "")
if "xla_tpu_scoped_vmem_limit_kib" not in _cur:
    _os.environ["LIBTPU_INIT_ARGS"] = (_cur + " " + _FLAG).strip()

# Persistent compilation cache: a serving restart otherwise recompiles the
# whole engine (~3.5 min for the 8B decode program). jax.config must be set
# before the first compile; TPULLM_NO_COMPILE_CACHE=1 opts out.
if _os.environ.get("TPULLM_NO_COMPILE_CACHE") != "1":
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        _os.path.expanduser("~/.cache/tpullm/xla")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    del _jax
del _os, _cur, _FLAG
