"""OpenAI-compatible serving layer with continuous batching.

The reference server (tools/server/, SURVEY §2.11) in TPU-native form:
slots = fixed cache batch rows (static shapes, zero recompiles), a typed
task queue feeding a single inference loop thread, chunked prefill with
prefix-cache reuse, multi-step on-device decode with per-row (per-slot)
sampler parameters, SSE streaming, Prometheus metrics.
"""
from .context import GenParams, ServerContext, Task
from .http import serve

__all__ = ["GenParams", "ServerContext", "Task", "serve"]
