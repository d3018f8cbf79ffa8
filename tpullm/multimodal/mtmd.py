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
        from ..gguf.reader import read_gguf

        g = read_gguf(mmproj_path)
        self.has_vision = bool(g.get("clip.has_vision_encoder",
                                     "clip.vision.block_count" in g.metadata
                                     or any(n.startswith("v.")
                                            for n in g.tensor_names())))
        self.has_audio = bool(g.get("clip.has_audio_encoder", False))
        self.cfg = self.params = None
        if self.has_vision:
            self.cfg, self.params = load_mmproj(mmproj_path)
        self.audio_cfg = self.audio_params = self._audio_fn = None
        if self.has_audio:
            from .audio import load_audio_mmproj, whisper_encode_fn

            self.audio_cfg, self.audio_params = load_audio_mmproj(mmproj_path)
            import jax

            self._audio_fn = jax.jit(
                whisper_encode_fn(self.audio_cfg, self.audio_params))
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

    def encode(self, media) -> np.ndarray:
        """One media item -> (n_output_tokens, n_embd_lm) f32 embeddings.

        media: a PIL image (vision), or ("audio", samples f32 @16kHz) /
        ("audio_wav", bytes) for the whisper encoder — each 30 s chunk
        encodes separately and the token rows concatenate
        (mtmd.cpp audio chunking)."""
        if isinstance(media, tuple) and media[0] in ("audio", "audio_wav"):
            from .audio import log_mel_whisper, read_wav, resample_linear

            assert self.has_audio, "mmproj has no audio encoder"
            if media[0] == "audio_wav":
                samples, sr = read_wav(media[1])
                samples = resample_linear(samples, sr, 16000)
            else:
                samples = np.asarray(media[1], np.float32)
            outs = [np.asarray(self._audio_fn(c), np.float32)
                    for c in log_mel_whisper(samples, self.audio_cfg.n_mel)]
            return np.concatenate(outs, axis=0)
        px = preprocess(media, self.cfg.image_size,
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
