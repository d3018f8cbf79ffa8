"""Multimodal (vision) subsystem — the reference's libmtmd analogue."""
from .clip import ClipConfig, encode_image, load_mmproj  # noqa: F401
from .mtmd import DEFAULT_MARKER, Chunk, MtmdContext  # noqa: F401
