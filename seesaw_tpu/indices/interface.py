"""AccessMethod: the index contract between retrieval and the session layer.

Mirrors the reference interface (`/root/reference/seesaw/indices/interface.py:
10-45`): text embedding, stateless top-k query with exclusion, query-state
factory, subsetting, and `info.json`-dispatched loading.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..basic_types import get_constructor


class AccessMethod:
    def string2vec(self, string: str) -> np.ndarray:
        raise NotImplementedError("abstract")

    def query(self, *, vector: np.ndarray, topk: int, exclude=None, **kwargs) -> dict:
        """Returns {'dbidxs': int array, 'activations': per-image activation
        tables (or None)} for the top-k non-excluded images."""
        raise NotImplementedError("abstract")

    def new_query(self):
        raise NotImplementedError("abstract")

    def vectors_for_rows(self, rows: np.ndarray) -> np.ndarray:
        """f32 vectors for row indices. Default: slice the host mirror;
        indexes without one (MultiscaleIndex.from_device_arrays) gather the
        rows from the device matrix instead."""
        return self.vectors[np.asarray(rows, dtype=np.int64)]

    def sum_vectors_for_rows(self, groups) -> np.ndarray:
        """(k, D) f32 sums of row groups (empty group -> zeros). Default
        reduces the host mirror; device-only indexes override to reduce on
        device and ship k vectors instead of the full labeled matrix."""
        d = self.vectors.shape[1]
        return np.stack([
            self.vectors[np.asarray(g, dtype=np.int64)].sum(axis=0)
            if len(g) else np.zeros(d, dtype=np.float32)
            for g in groups
        ]).astype(np.float32)

    def subset(self, indices) -> "AccessMethod":
        raise NotImplementedError("abstract")

    def __len__(self) -> int:
        raise NotImplementedError("abstract")

    @staticmethod
    def load(index_path: str, *, options: dict | None = None) -> "AccessMethod":
        """Dispatch through `<index_path>/info.json`'s ``constructor`` field
        (dotted path), like the reference's dynamic loader.

        Loads are memoized process-wide per (path, options): concurrent
        sessions SHARE one index object — one device-resident matrix copy
        instead of one per session, and cross-session request coalescing
        (index_options={"coalesce_ms": ...}) actually engages. This is the
        role the reference's cluster cache actor played
        (`services.py:25-30` get_parquet via `memory_cache.py:67-94`);
        MultiscaleIndex's exclusion state is safe to share (the
        generation-checked commit protocol)."""
        from ..runtime.cache import index_cache

        index_path = str(Path(index_path))

        def canon(v):
            # canonical, type-aware normalization: bool before int (bool is
            # an int subclass), ints stay ints, floats normalize 3.0 vs 3
            # only when equal-valued as floats; everything else keys on
            # (type, repr) so distinct values whose str() collide can't
            # alias one cache entry (ADVICE r3)
            if isinstance(v, bool) or v is None or isinstance(v, str):
                return v
            if isinstance(v, (int, float)):
                return float(v)
            if isinstance(v, (list, tuple)):
                return [canon(x) for x in v]
            if isinstance(v, dict):
                # keys get the same type-aware treatment as values ({1: v}
                # must not alias {"1": v}): a type-tagged string key
                return {
                    k if isinstance(k, str)
                    else f"{type(k).__qualname__}:{k!r}": canon(x)
                    for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))
                }
            return f"{type(v).__module__}.{type(v).__qualname__}:{v!r}"

        key = json.dumps(
            [index_path, canon(options or {})], sort_keys=True
        )

        def init():
            info = json.loads((Path(index_path) / "info.json").read_text())
            cons = get_constructor(info["constructor"])
            return cons.from_path(index_path, **(options or {}))

        return index_cache.get_or_initialize(key, init)

    def get_knng_path(self, name: str = "") -> str:
        raise NotImplementedError("abstract")
