from .constants import GGMLType, GGUFValueType, QK_K, type_block_size, type_size_bytes
from .reader import GGUFFile, GGUFTensorInfo, read_gguf
from .writer import GGUFWriter

__all__ = [
    "GGMLType",
    "GGUFValueType",
    "QK_K",
    "type_block_size",
    "type_size_bytes",
    "GGUFFile",
    "GGUFTensorInfo",
    "read_gguf",
    "GGUFWriter",
]
