#!/usr/bin/env bash
# Build the reference llama.cpp CPU binaries for differential testing.
#
# Builds into the repo (.refbuild/, gitignored) so the artifacts survive
# /tmp wipes between rounds, and symlinks /tmp/refbuild -> .refbuild for
# the historical path the tests also probe.
#
# Targets used by the test suite:
#   tests/test_reference_parity.py  (greedy decode + perplexity diffs)
#   tests/test_iq_quantize.py       (ggml_quantize_chunk via libggml-base)
#   tests/test_rwkv.py, test_ugm.py (llama-tokenize differentials)
set -euo pipefail
REF=${REF:-/root/reference}
OUT=${OUT:-$(cd "$(dirname "$0")/.." && pwd)/.refbuild}
cmake -S "$REF" -B "$OUT" -G Ninja \
  -DGGML_NATIVE=OFF -DLLAMA_CURL=OFF -DGGML_OPENMP=OFF \
  -DCMAKE_BUILD_TYPE=Release -DLLAMA_BUILD_TESTS=OFF
ninja -C "$OUT" llama-completion llama-perplexity llama-tokenize \
  llama-quantize
ln -sfn "$OUT" /tmp/refbuild 2>/dev/null || true
echo "reference build ready: $OUT"
