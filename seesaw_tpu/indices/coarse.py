"""CoarseIndex: one whole-image vector per image.

Derived from the multiscale index by averaging each image's most zoomed-out
tiles (reference `/root/reference/seesaw/indices/coarse/coarse_index.py:
16-134`). Reuses the multiscale device machinery with a single tile per
frame (augmentation degenerates to identity); labels are taken at image
granularity (binary accept), not box IoU.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

from ..query_interface import InteractiveQuery
from ..runtime.bitmap import BitMap
from .meta import VectorMeta
from .multiscale import MultiscaleIndex


def _coarse_meta(dbidx: np.ndarray) -> VectorMeta:
    n = dbidx.shape[0]
    boxes = np.tile(np.array([[0.0, 0.0, 1.0, 1.0]], dtype=np.float32), (n, 1))
    meta, order = VectorMeta.from_arrays(dbidx, np.ones(n, dtype=np.int32), boxes)
    return meta, order


class CoarseIndex(MultiscaleIndex):
    def __init__(self, *, embedding=None, vectors, dbidx, path=None, excluded=None):
        meta, order = _coarse_meta(np.asarray(dbidx, dtype=np.int32))
        super().__init__(
            embedding=embedding, vectors=np.asarray(vectors)[order], meta=meta,
            path=path, excluded=excluded,
        )

    def query(self, **kwargs):
        kwargs.setdefault("agg_method", "plain_score")
        return super().query(**kwargs)

    def new_query(self) -> "CoarseQuery":
        return CoarseQuery(self)

    def subset(self, indices: BitMap) -> "CoarseIndex":
        keep = np.asarray(indices.to_array(), dtype=np.int64)
        mask = self.meta.subset_mask(keep)
        if mask.all():
            return self
        return CoarseIndex(
            embedding=self.embedding,
            vectors=self.vectors[mask],
            dbidx=self.meta.dbidx[mask],
        )

    def save(self, index_path: str, model_name: str = ""):
        from ..runtime.cache import index_cache

        index_cache.invalidate_prefix(str(Path(index_path)))
        p = Path(index_path)
        p.mkdir(parents=True, exist_ok=True)
        np.savez(p / "vectors.npz", vectors=self.vectors, dbidx=self.meta.dbidx)
        info = {
            "constructor": "seesaw_tpu.indices.coarse.CoarseIndex",
            "model": model_name,
        }
        (p / "info.json").write_text(json.dumps(info))

    @staticmethod
    def from_path(index_path: str, *, embedding=None, **options) -> "CoarseIndex":
        p = Path(index_path)
        info = json.loads((p / "info.json").read_text())
        with np.load(p / "vectors.npz") as z:
            vectors = z["vectors"]
            dbidx = z["dbidx"]
        if embedding is None and info.get("model"):
            from ..models.registry import load_embedding

            embedding = load_embedding(info["model"])
        return CoarseIndex(embedding=embedding, vectors=vectors, dbidx=dbidx, path=str(p))


class CoarseQuery(InteractiveQuery):
    index: CoarseIndex

    def query_random(self, batch_size: int) -> dict:
        remaining = BitMap(self.index.meta.frame_dbidx).difference(self.returned)
        idxs = np.random.permutation(remaining.to_array())[:batch_size]
        self.returned.update(idxs)
        return {"dbidxs": idxs.astype(np.int64), "activations": None}

    def getXy(self, get_positions: bool = False, target_description: Optional[str] = None):
        """Image-level binary labels (reference `coarse_index.py:115-134`)."""
        meta = self.index.meta
        seen = self.label_db.get_seen()
        seen_mask = seen.contains_many(meta.dbidx.astype(np.uint32))
        rows = np.where(seen_mask)[0]
        ys = np.array(
            [float(self.label_db.get(int(meta.dbidx[r]), format="binary") or 0)
             for r in rows],
            dtype=np.float32,
        )
        if get_positions:
            return rows[ys > 0], rows[ys == 0]
        return {
            "rows": rows,
            "dbidx": meta.dbidx[rows],
            "ys": ys,
            "max_iou": ys.copy(),
        }
