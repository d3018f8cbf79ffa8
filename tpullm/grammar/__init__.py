"""GBNF grammar-constrained generation.

Components (reference: src/llama-grammar.*, common/grammar-parser,
common/json-schema-to-grammar.cpp):
- parser.py: GBNF text -> flat element rules
- engine.py: ctypes binding to the native C++ pushdown automaton
  (native/grammar.cpp)
- constraint.py: vocab-level token filtering for the sampler
- json_schema.py: JSON schema -> GBNF converter
"""
from .parser import parse_gbnf
from .engine import Grammar
from .constraint import GrammarConstraint
from .json_schema import json_schema_to_gbnf

__all__ = ["parse_gbnf", "Grammar", "GrammarConstraint", "json_schema_to_gbnf"]
