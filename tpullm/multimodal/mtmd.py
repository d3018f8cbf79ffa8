"""mtmd API: text+media chunking and prompt-embedding assembly.

Analogue of the reference's libmtmd C API (tools/mtmd/mtmd.h): the prompt
text carries ``<__media__>`` markers (mtmd.cpp:109 mtmd_default_marker);
tokenization splits it into text chunks and image chunks
(mtmd.cpp:972 mtmd_tokenize), each image chunk expands to
``n_output_tokens`` positions whose embeddings come from the vision
encoder instead of the LM's token-embedding table.

tpullm shape: ``MtmdContext`` owns the loaded mmproj; ``tokenize``
returns chunks; ``embed_prompt`` produces the final (T, n_embd) f32
matrix the engine prefills with (text rows gathered from the LM's
tok_embd on host, image rows from the jitted CLIP encoder).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .clip import ClipConfig, encode_image, load_mmproj
from .image import preprocess

DEFAULT_MARKER = "<__media__>"


@dataclass
class Chunk:
    kind: str  # "text" | "image"
    tokens: list = field(default_factory=list)  # text chunks
    image_idx: int = -1  # image chunks


class MtmdContext:
    def __init__(self, mmproj_path: str, marker: str = DEFAULT_MARKER):
        self.cfg, self.params = load_mmproj(mmproj_path)
        self.marker = marker

    @property
    def n_tokens_per_image(self) -> int:
        return self.cfg.n_output_tokens

    def tokenize(self, tokenizer, text: str, n_images: int,
                 add_special: bool = True,
                 parse_special: bool = False) -> list[Chunk]:
        """Split on markers; text parts tokenize normally (mtmd.cpp:972)."""
        parts = text.split(self.marker)
        if len(parts) - 1 != n_images:
            raise ValueError(
                f"prompt has {len(parts) - 1} {self.marker!r} markers "
                f"but {n_images} images were supplied")
        chunks: list[Chunk] = []
        for i, part in enumerate(parts):
            if part:
                ids = tokenizer.encode(part, add_special=add_special and i == 0,
                                       parse_special=parse_special)
                if ids:
                    chunks.append(Chunk("text", tokens=list(ids)))
            elif i == 0 and add_special and tokenizer.vocab.add_bos:
                chunks.append(Chunk("text", tokens=[tokenizer.vocab.bos_id]))
            if i < len(parts) - 1:
                chunks.append(Chunk("image", image_idx=i))
        return chunks

    def encode(self, image) -> np.ndarray:
        """One image -> (n_output_tokens, n_embd_lm) f32 embeddings."""
        px = preprocess(image, self.cfg.image_size,
                        self.cfg.image_mean, self.cfg.image_std)
        return encode_image(self.cfg, self.params, px)

    def embed_prompt(self, lm_params: dict, chunks: list[Chunk],
                     images: list) -> tuple[np.ndarray, list[int]]:
        """Assemble the prompt-embedding matrix.

        Returns (embeds (T, n_embd) f32, token_ids (T,) with image
        positions filled with 0 — the ids are only used for shape/cache
        bookkeeping, the embedding path bypasses the lookup).
        """
        import jax.numpy as jnp

        rows: list[np.ndarray] = []
        ids: list[int] = []
        tok_embd = lm_params["tok_embd"]
        for ch in chunks:
            if ch.kind == "text":
                t = np.asarray(ch.tokens, np.int32)
                rows.append(np.asarray(
                    tok_embd.take_rows(jnp.asarray(t), jnp.float32),
                    np.float32))
                ids.extend(ch.tokens)
            else:
                emb = self.encode(images[ch.image_idx])
                rows.append(emb.astype(np.float32))
                ids.extend([0] * emb.shape[0])
        return np.concatenate(rows, axis=0), ids
