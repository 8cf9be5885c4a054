"""Embedding models: CLIP ViT (flax) + interfaces and test stubs."""

from .embeddings import XEmbedding, HashEmbedding  # noqa: F401
