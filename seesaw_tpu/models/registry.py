"""Model registry: resolve a model name/path from info.json to an XEmbedding.

Replaces the reference's detached Ray model actors (`seesaw/services.py:
47-78`) with in-process, process-wide cached instances: serving is
single-host and the text tower is cheap; image embedding batches go through
the same instance's jitted apply.
"""
from __future__ import annotations

import threading

_cache: dict = {}
_lock = threading.Lock()


def load_embedding(name: str):
    with _lock:
        if name in _cache:
            return _cache[name]
        emb = _construct(name)
        _cache[name] = emb
        return emb


def _construct(name: str):
    if name.startswith("hash-"):
        from .embeddings import HashEmbedding

        return HashEmbedding(d=int(name.split("-", 1)[1]))
    if name.startswith("clip-"):
        import pathlib

        from .clip import ClipEmbedding

        # "clip-<variant>" or "clip-<variant>:<checkpoint_path>"; the path may
        # be a converted artifact dir (params.npz + info.json + vocab), a
        # params .npz, or a torch state-dict file
        spec = name.split("-", 1)[1]
        variant, _, ckpt = spec.partition(":")
        if ckpt and pathlib.Path(ckpt).is_dir() and (pathlib.Path(ckpt) / "info.json").exists():
            return ClipEmbedding.from_artifact(ckpt)
        return ClipEmbedding(variant=variant, checkpoint=ckpt or None)
    raise ValueError(f"unknown model spec {name!r}")
