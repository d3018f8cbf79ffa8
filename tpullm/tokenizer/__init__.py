from .vocab import Vocab, TokenAttr
from .tokenizer import Tokenizer

__all__ = ["Vocab", "TokenAttr", "Tokenizer"]
