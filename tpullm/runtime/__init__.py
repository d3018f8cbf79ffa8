from .loader import load_model
from .engine import InferenceEngine

__all__ = ["load_model", "InferenceEngine"]
