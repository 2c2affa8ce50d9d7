"""mtmd: mixed text+media tokenization into chunks (reference tools/mtmd/mtmd.h,
mtmd.cpp): text between media markers becomes token chunks; each image
becomes an embedding chunk produced by the CLIP encoder and fed into decode
as input embeddings (llama_batch.embd path)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .clip import ClipVisionModel

DEFAULT_MARKER = "<__media__>"  # mtmd.h default media marker


@dataclass
class MtmdChunk:
    kind: str  # "text" | "image"
    tokens: list[int] = field(default_factory=list)  # text chunks
    embd: np.ndarray | None = None  # image chunks: [n_tokens, n_embd]
    grid: tuple[int, int] | None = None  # merged (gh, gw) for M-RoPE models

    @property
    def n_tokens(self) -> int:
        return len(self.tokens) if self.kind == "text" else self.embd.shape[0]


class MtmdContext:
    def __init__(self, vision: ClipVisionModel, tokenizer, marker: str = DEFAULT_MARKER):
        self.vision = vision
        self.tokenizer = tokenizer
        self.marker = marker

    def tokenize(self, text: str, images: list[np.ndarray]) -> list[MtmdChunk]:
        """Split `text` on the media marker; encode each image where its
        marker sits (mtmd_tokenize, tools/mtmd/mtmd.cpp)."""
        parts = text.split(self.marker)
        if len(parts) - 1 != len(images):
            raise ValueError(
                f"{len(parts) - 1} media markers but {len(images)} images"
            )
        chunks: list[MtmdChunk] = []
        for i, part in enumerate(parts):
            if part:
                ids = self.tokenizer.tokenize(
                    part, add_special=(i == 0), parse_special=True
                )
                if ids:
                    chunks.append(MtmdChunk("text", tokens=ids))
            if i < len(images):
                pixels = self.vision.preprocess(images[i])
                embd = self.vision.encode(pixels)
                grid = None
                if hasattr(self.vision, "last_grid"):  # qwen2vl tower
                    grid = self.vision.last_grid
                chunks.append(MtmdChunk("image", embd=np.asarray(embd), grid=grid))
        return chunks

    def eval_chunks(self, engine, chunks: list[MtmdChunk], row: int = 0) -> np.ndarray:
        """Feed chunks into an Engine row; returns logits of the last token
        (the mtmd helper eval loop, tools/mtmd/mtmd-helper.cpp)."""
        logits = None
        for chunk in chunks:
            if chunk.kind == "text":
                logits = engine.prefill(chunk.tokens, row=row)
            else:
                logits = engine.prefill_embd(chunk.embd, row=row, grid=chunk.grid)
        return logits
