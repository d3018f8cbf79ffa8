from .config import ModelConfig
from .registry import ARCH_REGISTRY, get_arch

__all__ = ["ModelConfig", "ARCH_REGISTRY", "get_arch"]
