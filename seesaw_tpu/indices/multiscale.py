"""MultiscaleIndex: the main two-stage patch-embedding index, device-resident.

TPU-first re-design of the reference's `MultiscaleIndex`
(`/root/reference/seesaw/indices/multiscale/multiscale_index.py:201-442`).
The embedding matrix, tile boxes/zoom levels and frame segmentation live on
device; every query is one jitted XLA program (`ops.frame_scoring.
query_program`) that fuses scoring, exclusion, distinct-image shortlisting
and frame augmentation. There is no ANN index: at 512-d the exact scan is a
single MXU matvec and is sharded across chips at scale (parallel/), which
supersedes annoy's approximate search while keeping the same query contract.

Host-side state kept per index: numpy metadata (for label joins and
subsetting) + device arrays. Exclusion arrives as a dbidx BitMap and is
translated to a frame mask via the native bitmap's vectorized membership.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..box_utils import max_iou_per_left
from ..labeldb import LabelDB
from ..query_interface import InteractiveQuery
from ..runtime.bitmap import BitMap, FrozenBitMap
from ..ops import frame_scoring
from .interface import AccessMethod
from .meta import VectorMeta


def _next_pow2(x: int) -> int:
    p = 8
    while p < x:
        p *= 2
    return p


def match_labels_to_vectors(
    label_db: LabelDB, meta: VectorMeta, target_description: Optional[str] = None
):
    """For every vector of every *seen* image, the max IoU between its tile
    box and any matching labeled box; ys = (max_iou > 0).

    Returns (row_indices, dbidx, ys, max_iou) — columnar, replacing the
    reference's dataframe join (`multiscale_index.py:65-83`)."""
    seen = label_db.get_seen()
    seen_mask = seen.contains_many(meta.dbidx.astype(np.uint32))
    rows = np.where(seen_mask)[0]

    if target_description is not None:
        table = label_db.get_box_table(target_description=target_description)
    else:
        table = label_db.get_box_table(accepted_only=True)

    max_iou = np.zeros(rows.shape[0], dtype=np.float32)
    if len(table):
        for dbidx in np.unique(meta.dbidx[rows]):
            lab = table.boxes[table.dbidx == dbidx]
            if lab.shape[0] == 0:
                continue
            sel = np.where(meta.dbidx[rows] == dbidx)[0]
            max_iou[sel] = max_iou_per_left(meta.boxes[rows[sel]], lab)

    ys = (max_iou > 0).astype(np.float32)
    return rows, meta.dbidx[rows], ys, max_iou


class MultiscaleIndex(AccessMethod):
    def __init__(
        self,
        *,
        embedding=None,
        vectors: np.ndarray,
        meta: VectorMeta,
        path: Optional[str] = None,
        excluded: Optional[BitMap] = None,
        device_dtype: str = "float32",
        mesh=None,
    ):
        """device_dtype: 'float32' (exact), 'bfloat16' (HBM-halving, default
        for big indices — fastest measured scan), or 'int8' (per-row
        symmetric scales; HALF of bf16's HBM capacity, i.e. ~20M 512-d
        vectors on one v5e. Shortlist recall vs f32 measured 1.0 at 1M rows;
        note the current TPU toolchain reads int8 at ~1/4 HBM rate, so int8
        trades a slower scan for 2x capacity rather than speed).

        mesh: a multi-device jax.sharding.Mesh row-shards the embedding
        matrix across chips (parallel.ShardedFrameIndex); query() then runs
        the per-shard program + ICI top-k merge while the lighter programs
        (rank_by_scores, getXy) stay single-device/host."""
        self.embedding = embedding
        self.path = path
        self.meta = meta
        self.vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        assert self.vectors.shape[0] == meta.n_vectors

        self.excluded = excluded if excluded is not None else BitMap()
        self.all_indices = FrozenBitMap(
            BitMap(meta.frame_dbidx).difference(self.excluded).to_array()
        )

        # device-resident arrays, frame-major padded (see ops.frame_scoring)
        self._tile_bound = _next_pow2(max(meta.max_tiles_per_frame, 1))
        rows, valid = meta.padded_rows(self._tile_bound)
        flat_rows = rows.reshape(-1)
        flat_valid = valid.reshape(-1)
        V_pad = self.vectors[flat_rows]
        V_pad[~flat_valid] = 0.0
        self.device_dtype = device_dtype
        self._sharded = None
        if mesh is not None and mesh.devices.size > 1:
            from ..parallel.sharded_index import ShardedFrameIndex

            self._sharded = ShardedFrameIndex.build(self.vectors, meta, mesh)
        if self._sharded is not None:
            # the big matrix lives sharded across the mesh; skip the
            # single-device copy (the metadata arrays below stay local for
            # the ranking-tail programs)
            self._V = None
            self._row_scale = None
        elif device_dtype == "int8":
            # per-row symmetric scales (the standard near-free accuracy win
            # over one global scale): row r stores round(V_r / s_r), s_r =
            # max|V_r|/127, dequantized inside the scoring matvec
            row_max = np.abs(V_pad).max(axis=1)
            scales = np.where(row_max > 0, row_max / 127.0, 1.0).astype(np.float32)
            self._V = jnp.asarray(
                np.clip(np.round(V_pad / scales[:, None]), -127, 127).astype(np.int8)
            )
            self._row_scale = jnp.asarray(scales)
        elif device_dtype == "bfloat16":
            self._V = jnp.asarray(V_pad, dtype=jnp.bfloat16)
            self._row_scale = None
        else:
            self._V = jnp.asarray(V_pad)
            self._row_scale = None
        self._pad_rows = jnp.asarray(flat_rows.astype(np.int32))
        self._pad_valid_flat = jnp.asarray(flat_valid)
        self._valid = jnp.asarray(valid)
        self._boxes = jnp.asarray(meta.boxes[flat_rows])
        self._zoom = jnp.asarray(meta.zoom_level[flat_rows])
        self._max_zoom = max(meta.max_zoom_level, 1)
        # static frame mask for the construction-time exclusion list
        self._base_excluded_mask = (
            self.excluded.contains_many(meta.frame_dbidx.astype(np.uint32))
            if len(self.excluded)
            else np.zeros(meta.n_frames, dtype=bool)
        )

    # -- basic ops ---------------------------------------------------------
    def string2vec(self, string: str) -> np.ndarray:
        vec = self.embedding.from_string(string=string)
        vec = np.asarray(vec, dtype=np.float32).reshape(-1)
        return vec / np.linalg.norm(vec)

    def score(self, vec: np.ndarray) -> np.ndarray:
        """Per-vector scores in the exact (unpadded) layout."""
        return self.vectors @ np.asarray(vec, np.float32).reshape(-1)

    def score_frames(self, vec: np.ndarray) -> np.ndarray:
        """Max tile score per frame, on device."""
        q = np.asarray(vec, np.float32).reshape(-1)
        if self._sharded is not None:  # host segment-max; V lives on the mesh
            s = self.vectors @ q
            fmax = np.maximum.reduceat(s, self.meta.frame_starts[:-1])
            # reduceat on an empty segment returns the NEXT segment's first
            # element; every frame has >=1 tile by construction, but guard so
            # a degenerate meta can't silently surface a neighbor's score
            return np.where(np.diff(self.meta.frame_starts) > 0, fmax, -np.inf)
        return np.asarray(
            frame_scoring.score_frames_max(
                self._V, self._valid, jnp.asarray(q), self._row_scale
            )
        )

    def __len__(self) -> int:
        return len(self.all_indices)

    @property
    def n_frames(self) -> int:
        return self.meta.n_frames

    # -- query -------------------------------------------------------------
    def _frame_exclusion_mask(self, exclude: Optional[BitMap]) -> np.ndarray:
        mask = self._base_excluded_mask.copy()
        if exclude is not None and len(exclude):
            mask |= exclude.contains_many(self.meta.frame_dbidx.astype(np.uint32))
        return mask

    def query(
        self,
        *,
        vector: np.ndarray,
        vector2: Optional[np.ndarray] = None,
        topk: int,
        shortlist_size: Optional[int] = None,
        exclude: Optional[BitMap] = None,
        agg_method: str = "avg_score",
        aug_larger: str = "all",
        aug_weight: str = "level_max",
        force_exact: bool = False,  # exact is the only path; kept for API parity
        rescore_method=None,  # unused: scores are fused on device
        **kwargs,
    ) -> dict:
        if shortlist_size is None or shortlist_size < topk:
            shortlist_size = max(topk * 5, shortlist_size or 0)
        shortlist_size = min(shortlist_size, self.n_frames)
        topk_eff = min(topk, self.n_frames)

        excluded_mask = self._frame_exclusion_mask(exclude)

        if self._sharded is not None:
            from ..parallel.sharded_index import sharded_query_topk

            dbidxs, scores, act_boxes, act_scores = sharded_query_topk(
                self._sharded,
                np.asarray(vector, np.float32).reshape(-1),
                excluded_mask,
                topk=topk_eff,
                shortlist_size=min(shortlist_size, self._sharded.n_frames_local),
                aug_larger=aug_larger,
                aug_weight=aug_weight,
                agg_method=agg_method,
                qvec2=vector2,
            )
            activations = [
                {
                    "x1": float(b[0]), "y1": float(b[1]),
                    "x2": float(b[2]), "y2": float(b[3]),
                    "dbidx": int(dbx), "score": float(s),
                }
                for b, s, dbx in zip(act_boxes, act_scores, dbidxs)
            ]
            return {"dbidxs": dbidxs.astype(np.int64), "activations": activations}

        res = frame_scoring.query_program(
            self._V,
            self._valid,
            self._boxes,
            self._zoom,
            jnp.asarray(np.asarray(vector, np.float32).reshape(-1)),
            (jnp.asarray(np.asarray(vector2, np.float32).reshape(-1))
             if vector2 is not None else None),
            jnp.asarray(excluded_mask),
            self._row_scale,
            shortlist_size=shortlist_size,
            topk=topk_eff,
            aug_larger=aug_larger,
            aug_weight=aug_weight,
            agg_method=agg_method,
            max_zoom=self._max_zoom,
        )
        return self._format_result(res)

    def rank_by_scores(
        self,
        scores: np.ndarray,  # (N,) per-vector scores in exact layout
        *,
        topk: int,
        shortlist_size: Optional[int] = None,
        exclude: Optional[BitMap] = None,
        agg_method: str = "avg_score",
        aug_larger: str = "all",
        aug_weight: str = "level_max",
    ) -> dict:
        """Rank frames by externally produced per-vector scores (e.g. label
        propagation) with the same shortlist + augmentation tail as query()."""
        if shortlist_size is None or shortlist_size < topk:
            shortlist_size = max(topk * 5, shortlist_size or 0)
        shortlist_size = min(shortlist_size, self.n_frames)
        topk_eff = min(topk, self.n_frames)
        excluded_mask = self._frame_exclusion_mask(exclude)

        s = jnp.asarray(np.asarray(scores, np.float32))
        s_pad = jnp.where(self._pad_valid_flat, s[self._pad_rows], -jnp.inf)
        res = frame_scoring.rank_frames_from_scores(
            s_pad, self._valid, self._boxes, self._zoom,
            jnp.asarray(excluded_mask),
            shortlist_size=shortlist_size, topk=topk_eff,
            aug_larger=aug_larger, aug_weight=aug_weight,
            agg_method=agg_method, max_zoom=self._max_zoom,
        )
        return self._format_result(res)

    def _format_result(self, res) -> dict:
        n = int(res.n_valid)
        fids = np.asarray(res.frame_ids)[:n]
        act_boxes = np.asarray(res.act_boxes)[:n]
        act_scores = np.asarray(res.act_scores)[:n]
        dbidxs = self.meta.frame_dbidx[fids]
        activations = [
            {
                "x1": float(b[0]), "y1": float(b[1]),
                "x2": float(b[2]), "y2": float(b[3]),
                "dbidx": int(dbidx), "score": float(s),
            }
            for b, s, dbidx in zip(act_boxes, act_scores, dbidxs)
        ]
        return {"dbidxs": dbidxs.astype(np.int64), "activations": activations}

    def new_query(self) -> "BoxFeedbackQuery":
        return BoxFeedbackQuery(self)

    # -- data access -------------------------------------------------------
    def get_data(self, dbidx: int):
        """Tile metadata + vectors for one image."""
        f = int(np.searchsorted(self.meta.frame_dbidx, dbidx))
        assert self.meta.frame_dbidx[f] == dbidx, f"dbidx {dbidx} not in index"
        lo, hi = self.meta.frame_starts[f], self.meta.frame_starts[f + 1]
        return {
            "boxes": self.meta.boxes[lo:hi],
            "zoom_level": self.meta.zoom_level[lo:hi],
            "vectors": self.vectors[lo:hi],
            "rows": np.arange(lo, hi),
        }

    def subset(self, indices: BitMap) -> "MultiscaleIndex":
        keep = np.asarray(indices.to_array(), dtype=np.int64)
        mask = self.meta.subset_mask(keep)
        if mask.all():
            return self
        return MultiscaleIndex(
            embedding=self.embedding,
            vectors=self.vectors[mask],
            meta=self.meta.select_rows(mask),
        )

    # -- persistence -------------------------------------------------------
    def save(self, index_path: str, model_name: str = ""):
        p = Path(index_path)
        p.mkdir(parents=True, exist_ok=True)
        np.savez(
            p / "vectors.npz",
            vectors=self.vectors,
            dbidx=self.meta.dbidx,
            zoom_level=self.meta.zoom_level,
            boxes=self.meta.boxes,
        )
        info = {
            "constructor": "seesaw_tpu.indices.multiscale.MultiscaleIndex",
            "model": model_name,
            "excluded": self.excluded.to_array().tolist() if len(self.excluded) else [],
        }
        (p / "info.json").write_text(json.dumps(info))

    @staticmethod
    def from_path(index_path: str, *, embedding=None, **options) -> "MultiscaleIndex":
        p = Path(index_path)
        info = json.loads((p / "info.json").read_text())
        with np.load(p / "vectors.npz") as z:
            vectors = z["vectors"]
            meta, order = VectorMeta.from_arrays(z["dbidx"], z["zoom_level"], z["boxes"])
            vectors = vectors[order]
        if embedding is None and info.get("model"):
            from ..models.registry import load_embedding

            embedding = load_embedding(info["model"])
        excluded = BitMap(info.get("excluded") or [])
        mesh = options.get("mesh")
        if mesh is None and options.get("sharded"):
            import jax

            from ..parallel.mesh import make_mesh

            mesh = make_mesh(len(jax.devices()))
        device_dtype = options.get("device_dtype")
        if device_dtype is None:
            # auto: big matrices go to HBM as bf16 (f32 at 10M x 512 is 20GB,
            # over a v5e's 16GB); small ones stay exact
            device_dtype = (
                "bfloat16" if vectors.size * 4 > 4 * 1024**3 else "float32"
            )
        return MultiscaleIndex(
            embedding=embedding, vectors=vectors, meta=meta,
            path=str(p), excluded=excluded,
            device_dtype=device_dtype,
            mesh=mesh,
        )

    def get_knng_path(self, name: str = "") -> str:
        assert self.path is not None
        return str(Path(self.path) / "knn_graph" / name)


class BoxFeedbackQuery(InteractiveQuery):
    """Query state + label->vector matching for box feedback."""

    index: MultiscaleIndex

    def __init__(self, index: MultiscaleIndex, _y: np.ndarray = None):
        super().__init__(index, _y=_y)

    def query_random(self, batch_size: int) -> dict:
        remaining = BitMap(self.index.meta.frame_dbidx).difference(self.returned)
        arr = remaining.to_array()
        idxs = np.random.permutation(arr)[:batch_size]
        # keep the no-repeat contract: random batches count as returned too
        # (latent bug in the reference: query_random never updated `returned`)
        self.returned.update(idxs)
        return {"dbidxs": idxs.astype(np.int64), "activations": None}

    def getXy(self, get_positions: bool = False, target_description: Optional[str] = None):
        rows, dbidx, ys, max_iou = match_labels_to_vectors(
            self.label_db, self.index.meta, target_description=target_description
        )
        if get_positions:
            pos = rows[ys > 0]
            neg = rows[ys == 0]
            return pos, neg
        return {"rows": rows, "dbidx": dbidx, "ys": ys, "max_iou": max_iou}
