"""Input adapters: text embedding helpers."""

from .text import embed_texts, simple_text_embed  # noqa: F401
