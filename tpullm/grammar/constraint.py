"""Grammar-constrained sampling: vocab-level token filtering.

The reference integrates the grammar as a sampler that masks candidate
tokens whose pieces the automaton cannot consume (llama_sampler_grammar,
src/llama-sampler.cpp). Same here, host-side: the candidate set is the
top-K surviving logits fetched from the device (grammar-constrained slots
run the decode chunk=1 slow path).
"""
from __future__ import annotations

import numpy as np

from .engine import Grammar


class GrammarConstraint:
    def __init__(self, gbnf: str, vocab):
        self.g = Grammar(gbnf)
        self.vocab = vocab
        self._piece_cache: dict[int, str] = {}

    def piece(self, tok: int) -> str:
        s = self._piece_cache.get(tok)
        if s is None:
            from ..tokenizer.tokenizer import Tokenizer

            # decode a single token id to its text piece
            s = self._decode_one(tok)
            self._piece_cache[tok] = s
        return s

    def _decode_one(self, tok: int) -> str:
        v = self.vocab
        t = v.tokens[tok]
        from ..tokenizer.vocab import TokenAttr

        a = v.attrs[tok]
        if a & TokenAttr.CONTROL:
            return ""
        if v.model == "llama":  # SPM: ▁ -> space, byte tokens
            if a & TokenAttr.BYTE:
                try:
                    return bytes([int(t[3:5], 16)]).decode("utf-8", errors="ignore")
                except ValueError:
                    return ""
            return t.replace("▁", " ")
        return t  # BPE pieces are byte-level printable already

    def filter_candidates(self, token_ids: np.ndarray) -> np.ndarray:
        """0/1 mask over candidate token ids (EOG allowed iff grammar done)."""
        pieces = []
        special = []
        for t in token_ids:
            t = int(t)
            if self.vocab.is_eog(t):
                special.append(1 if self.g.done else 0)
                pieces.append("")
            else:
                special.append(None)
                pieces.append(self.piece(t))
        mask = self.g.filter_pieces(pieces)
        out = np.zeros(len(token_ids), np.uint8)
        for i, sp in enumerate(special):
            if sp is not None:
                out[i] = sp
            else:
                out[i] = mask[i] if pieces[i] else 0
        return out

    def accept_token(self, tok: int) -> None:
        if self.vocab.is_eog(int(tok)):
            return
        piece = self.piece(int(tok))
        n = self.g.accept(piece)
        if n != len(piece):
            raise ValueError(
                f"grammar rejected accepted token {tok} ({piece!r}) at cp {n}")
