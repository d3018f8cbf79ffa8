"""Image loading + preprocessing for the vision encoder.

Analogue of the reference's mtmd-image.cpp (u8 decode, bicubic resize,
mean/std normalize: img_u8_to_f32 at tools/mtmd/mtmd-image.cpp:11 and the
resize_* family at :200-310). PIL handles codec decode + resampling when
present (it is in the baked image); a pure-numpy bilinear fallback keeps
the path alive without it (tests use raw arrays, never codecs).
"""
from __future__ import annotations

import io

import numpy as np


def load_image(src) -> np.ndarray:
    """bytes | path | ndarray -> (H, W, 3) uint8 RGB."""
    if isinstance(src, np.ndarray):
        a = src
        if a.ndim == 2:
            a = np.stack([a] * 3, axis=-1)
        return np.ascontiguousarray(a[..., :3], np.uint8)
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PIL unavailable: pass a numpy array") from e
    img = (Image.open(io.BytesIO(src)) if isinstance(src, (bytes, bytearray))
           else Image.open(src))
    return np.asarray(img.convert("RGB"), np.uint8)


def _resize_numpy(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Bilinear fallback (mtmd-image.cpp:200 resize_bilinear semantics)."""
    H, W = img.shape[:2]
    ys = (np.arange(h) + 0.5) * H / h - 0.5
    xs = (np.arange(w) + 0.5) * W / w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None, None]
    fx = np.clip(xs - x0, 0, 1)[None, :, None]
    f = img.astype(np.float32)
    top = f[y0][:, x0] * (1 - fx) + f[y0][:, x1] * fx
    bot = f[y1][:, x0] * (1 - fx) + f[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """(H, W, 3) uint8 -> (h, w, 3) float32 in [0, 255], bicubic."""
    if img.shape[0] == h and img.shape[1] == w:
        return img.astype(np.float32)
    try:
        from PIL import Image
    except ImportError:
        return _resize_numpy(img, w, h)
    out = Image.fromarray(img).resize((w, h), Image.BICUBIC)
    return np.asarray(out, np.float32)


def preprocess(img, image_size: int, mean, std) -> np.ndarray:
    """Any image source -> (image_size, image_size, 3) f32, normalized
    ((v/255 - mean) / std, mtmd-image.cpp:11 img_u8_to_f32). Square
    stretch-resize — the reference's default single-tile path."""
    u8 = load_image(img)
    f = resize(u8, image_size, image_size) / 255.0
    return ((f - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32)).astype(np.float32)
