"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective code paths are
exercised without TPU hardware (the driver separately dry-runs multi-chip).
Must set env before jax is imported anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may carry an empty/TPU value
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# the axon sitecustomize overrides jax_platforms to "axon,cpu" at interpreter
# start; force it back to cpu before any backend initialization
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# Reference python mirror (gguf-py) used ONLY as a differential-test oracle.
REFERENCE_GGUF_PY = "/root/reference/gguf-py"


def ref_gguf():
    """Import the reference gguf-py package as an oracle (tests only)."""
    if REFERENCE_GGUF_PY not in sys.path:
        sys.path.insert(0, REFERENCE_GGUF_PY)
    import gguf as refgguf  # noqa

    return refgguf
