"""Offline tools (the reference's tools/ layer, SURVEY §2.9):

  python -m tpullm.tools.quantize    - llama-quantize (ftype policy requant)
  python -m tpullm.tools.perplexity  - llama-perplexity (WikiText-2 PPL)
  python -m tpullm.tools.tokenize    - llama-tokenize
  python -m tpullm.tools.gguf_dump   - GGUF metadata/tensor inspector
  python -m tpullm.tools.cli         - llama-cli one-shot/interactive chat
  python -m tpullm.tools.bench       - llama-bench perf matrix
"""
