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

import functools
import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..box_utils import max_iou_per_left
from ..labeldb import LabelDB
from ..query_interface import InteractiveQuery
from ..runtime.bitmap import BitMap, FrozenBitMap
from ..ops import frame_scoring
from .interface import AccessMethod
from .meta import VectorMeta, next_pow2 as _next_pow2


class _ExclEntry:
    """Per-session device-persistent exclusion state: `dev` is exactly
    `prev`'s exclusions in `layout` ('flat' | 'sharded'); `obj` keeps the
    session's BitMap alive so its id() cannot be reused while cached."""

    __slots__ = ("obj", "prev", "dev", "gen", "layout")

    def __init__(self, obj, prev, dev, layout):
        self.obj = obj
        self.prev = prev
        self.dev = dev
        self.gen = 0
        self.layout = layout


@jax.jit
def _group_sums(V, prows, valid, row_scale):
    """(k, B) padded row gather -> (k, D) masked f32 sums (int8 dequant)."""
    X = V[prows]  # (k, B, D)
    if X.dtype == jnp.int8:
        scale = (
            row_scale[prows][..., None]
            if row_scale is not None
            else jnp.float32(1.0)
        )
        X = X.astype(jnp.float32) * scale
    return (X.astype(jnp.float32) * valid[..., None]).sum(axis=1)


def _pallas_interpret() -> bool:
    """Mosaic kernels only compile for real TPU backends; anywhere else
    (CPU tests / virtual meshes) run the kernel in interpret mode."""
    import jax

    return jax.default_backend() == "cpu"


def match_labels_to_vectors(
    label_db: LabelDB, meta: VectorMeta, target_description: Optional[str] = None
):
    """For every vector of every *seen* image, the max IoU between its tile
    box and any matching labeled box; ys = (max_iou > 0).

    Returns (row_indices, dbidx, ys, max_iou) — columnar, replacing the
    reference's dataframe join (`multiscale_index.py:65-83`)."""
    seen = label_db.get_seen()
    # enumerate rows per SEEN image via the frame segmentation — O(seen
    # images), not O(N) over a 10M-row dbidx array per click
    seen_ids = np.asarray(seen.to_array(), dtype=np.int64)
    fpos = np.searchsorted(meta.frame_dbidx, seen_ids)
    safe = np.minimum(fpos, meta.n_frames - 1)
    fpos = fpos[(fpos < meta.n_frames) & (meta.frame_dbidx[safe] == seen_ids)]
    rows = (
        np.concatenate(
            [
                np.arange(meta.frame_starts[f], meta.frame_starts[f + 1])
                for f in fpos
            ]
        )
        if fpos.size
        else np.zeros(0, dtype=np.int64)
    )

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


@functools.partial(
    jax.jit,
    static_argnames=(
        "use_pallas", "tile_bound", "shortlist_size", "topk",
        "aug_larger", "aug_weight", "agg_method", "max_zoom", "interpret",
    ),
)
def _rocchio_query_incr(
    V, valid, boxes, zoom, row_scale,
    q0, pos_rows, neg_rows,  # padded-layout row ids, -1 padded
    mask, new_ids, alpha, beta, gamma,
    *,
    use_pallas: bool,
    tile_bound: int,
    shortlist_size: int,
    topk: int,
    aug_larger: str,
    aug_weight: str,
    agg_method: str,
    max_zoom: int,
    interpret: bool,
):
    """Class-mean gather + Rocchio update + full incremental query in ONE
    program. Returns (QueryResult, new exclusion mask, resolved qvec)."""

    def class_mean(rows):
        ok = rows >= 0
        safe = jnp.clip(rows, 0, None)
        vecs = V[safe].astype(jnp.float32)
        if row_scale is not None:  # int8: dequantize before summing
            vecs = vecs * row_scale[safe][:, None]
        vecs = vecs * ok[:, None]
        return vecs.sum(axis=0) / jnp.maximum(ok.sum(), 1)

    q = alpha * q0 + beta * class_mean(pos_rows) - gamma * class_mean(neg_rows)
    res, new_mask = _query_incr_dispatch(
        V, valid, boxes, zoom, row_scale, q, mask, new_ids,
        use_pallas=use_pallas, tile_bound=tile_bound,
        shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
        interpret=interpret,
    )
    return res, new_mask, q


def _query_incr_dispatch(
    V, valid, boxes, zoom, row_scale, q, mask, new_ids, *,
    use_pallas, tile_bound, shortlist_size, topk,
    aug_larger, aug_weight, agg_method, max_zoom, interpret,
):
    """Incremental query tail shared by the deferred-vector programs."""
    if use_pallas:
        from ..ops.pallas_scoring import query_program_fused_incr

        return query_program_fused_incr(
            V, valid, boxes, zoom, q, mask, new_ids, row_scale,
            shortlist_size=shortlist_size, topk=topk, tile_bound=tile_bound,
            aug_larger=aug_larger, aug_weight=aug_weight,
            agg_method=agg_method, max_zoom=max_zoom, interpret=interpret,
        )
    return frame_scoring.query_program_incr(
        V, valid, boxes, zoom, q, None, mask, new_ids, row_scale,
        shortlist_size=shortlist_size, topk=topk,
        aug_larger=aug_larger, aug_weight=aug_weight,
        agg_method=agg_method, max_zoom=max_zoom,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "fit_intercept", "max_iter", "has_anchor", "center",
        "use_pallas", "tile_bound", "shortlist_size", "topk",
        "aug_larger", "aug_weight", "agg_method", "max_zoom", "interpret",
    ),
)
def _logistic_query_incr(
    V, valid, boxes, zoom, row_scale,
    prows, lvalid, y, sw, n_real, pos_weight, reg_weight, anchor, params0,
    mask, new_ids,
    *,
    fit_intercept: bool,
    max_iter: int,
    has_anchor: bool,
    center: bool,
    use_pallas: bool,
    tile_bound: int,
    shortlist_size: int,
    topk: int,
    aug_larger: str,
    aug_weight: str,
    agg_method: str,
    max_zoom: int,
    interpret: bool,
):
    """Labeled-row gather + centering + LBFGS logistic fit + the full
    incremental query over the fitted coefficient, in ONE device program
    (LogReg2's feedback round = one dispatch)."""
    from ..learners.logistic_regression import _fit_ce_rows

    params, f, diverged, mu = _fit_ce_rows(
        V, row_scale, prows, lvalid, y, sw, n_real, pos_weight, reg_weight,
        anchor, params0,
        fit_intercept=fit_intercept, max_iter=max_iter,
        has_anchor=has_anchor, center=center,
    )
    q = params[:-1]
    res, new_mask = _query_incr_dispatch(
        V, valid, boxes, zoom, row_scale, q, mask, new_ids,
        use_pallas=use_pallas, tile_bound=tile_bound,
        shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
        interpret=interpret,
    )
    return res, new_mask, params, mu, f, diverged


@functools.partial(
    jax.jit,
    static_argnames=(
        "label_loss_type", "pos_weight_balanced", "max_iter",
        "use_pallas", "tile_bound", "shortlist_size", "topk",
        "aug_larger", "aug_weight", "agg_method", "max_zoom", "interpret",
    ),
)
def _multireg_query_incr(
    V, valid, boxes, zoom, row_scale,
    prows, lvalid, y, sw, qvec_hat, xlx,
    rank_loss_margin, pos_weight_value,
    reg_data_lambda, reg_norm_lambda, reg_query_lambda,
    mask, new_ids,
    *,
    label_loss_type: str,
    pos_weight_balanced: bool,
    max_iter: int,
    use_pallas: bool,
    tile_bound: int,
    shortlist_size: int,
    topk: int,
    aug_larger: str,
    aug_weight: str,
    agg_method: str,
    max_zoom: int,
    interpret: bool,
):
    """Labeled-row gather + centering + the 4-term 'seesaw' LBFGS fit + the
    incremental query over the fitted coefficient, in ONE device program."""
    from ..learners.multi_reg import _fit_reg

    ok = lvalid
    safe = jnp.clip(prows, 0, None)
    X = V[safe].astype(jnp.float32)
    if row_scale is not None:
        X = X * row_scale[safe][:, None]
    n_real = jnp.maximum(ok.sum(), 1)
    mu = (X * ok[:, None]).sum(axis=0) / n_real
    X = jnp.where(ok[:, None], X - mu[None, :], 0.0)

    coeff, f, diverged = _fit_reg(
        X, y, sw, ok, qvec_hat, xlx, qvec_hat,
        rank_loss_margin, pos_weight_value,
        reg_data_lambda, reg_norm_lambda, reg_query_lambda,
        label_loss_type=label_loss_type,
        pos_weight_balanced=pos_weight_balanced,
        max_iter=max_iter,
    )
    res, new_mask = _query_incr_dispatch(
        V, valid, boxes, zoom, row_scale, coeff, mask, new_ids,
        use_pallas=use_pallas, tile_bound=tile_bound,
        shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
        interpret=interpret,
    )
    return res, new_mask, coeff, f, diverged


class MultiscaleIndex(AccessMethod):
    # how many newly-excluded frames per click ride into the fused query
    # dispatch; bigger deltas fall back to a full host mask rebuild
    _EXCL_DELTA = 8

    # shape key of the device program the LAST query dispatched. The labeled
    # set grows every feedback round, so deferred-refine programs are padded
    # to pow2 row buckets (bounded recompiles) — a NEW key means that round
    # paid a one-time jit compile. Benchmarks use this to separate
    # steady-state latency from warm-up rounds (bench.bench_session_rounds).
    last_program_shape: "tuple | None" = None

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
        use_pallas: bool = False,
        int8_scale: str = "row",
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
        (rank_by_scores, getXy) stay single-device/host.

        use_pallas: serve queries through the fused Pallas shortlist kernel
        (ops.pallas_scoring) — frames are padded to the kernel's 1024-frame
        block granularity at build. The production setting on TPU for big
        indices; default off (tests run the XLA program on CPU)."""
        self.embedding = embedding
        self.path = path
        self.meta = meta
        self.vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        assert self.vectors.shape[0] == meta.n_vectors
        # mutually exclusive serving configs: the Pallas kernel pads the
        # frame axis to its 1024-block granularity, but the sharded path's
        # exclusion plumbing expects exactly n_frames-length masks — mixing
        # them would misalign frames (ADVICE r3)
        if use_pallas and mesh is not None and mesh.devices.size > 1:
            raise ValueError(
                "use_pallas and mesh are mutually exclusive: the sharded "
                "path runs its own per-shard program (parallel."
                "sharded_index); drop use_pallas for mesh-sharded indexes"
            )

        self.excluded = excluded if excluded is not None else BitMap()
        self.all_indices = FrozenBitMap(
            BitMap(meta.frame_dbidx).difference(self.excluded).to_array()
        )

        # device-resident arrays, frame-major padded (see ops.frame_scoring)
        self._tile_bound = _next_pow2(max(meta.max_tiles_per_frame, 1))
        self._use_pallas = use_pallas
        rows, valid = meta.padded_rows(self._tile_bound)
        if use_pallas:
            # pad the frame axis to the Pallas block granularity (the padded
            # frames are invalid + excluded; ops.pallas_scoring requires the
            # vector rows pre-padded to Fp * T)
            F = valid.shape[0]
            Fp = -(-F // 1024) * 1024
            if Fp != F:
                rows = np.concatenate(
                    [rows, np.zeros((Fp - F, self._tile_bound), rows.dtype)]
                )
                valid = np.concatenate(
                    [valid, np.zeros((Fp - F, self._tile_bound), bool)]
                )
        flat_rows = rows.reshape(-1)
        flat_valid = valid.reshape(-1)
        V_pad = self.vectors[flat_rows]
        V_pad[~flat_valid] = 0.0
        self.device_dtype = device_dtype
        self._sharded = None
        self._frame_scale = None
        if mesh is not None and mesh.devices.size > 1:
            from ..parallel.sharded_index import ShardedFrameIndex

            # same storage options as single-chip; int8 always uses per-ROW
            # scales on the mesh (the frame-scale int32-max trick is a
            # single-chip batch-epilogue fusion, ops.frame_scoring)
            self._sharded = ShardedFrameIndex.build(
                self.vectors, meta, mesh, dtype=device_dtype
            )
        if self._sharded is not None:
            # the big matrix lives sharded across the mesh; skip the
            # single-device copy (the metadata arrays below stay local for
            # the ranking-tail programs)
            self._V = None
            self._row_scale = None
        elif device_dtype == "int8":
            # per-row symmetric scales (the standard near-free accuracy win
            # over one global scale): row r stores round(V_r / s_r), s_r =
            # max|V_r|/127, dequantized inside the scoring matvec.
            # int8_scale='frame' shares one scale across a frame's tiles:
            # slightly coarser quantization, but the multi-query batch path
            # can then run its tile max in int32 BEFORE dequantization,
            # which keeps XLA's matmul->max fusion intact — the fastest
            # measured batch scan (14.2 ms vs bf16's 19.1 at 10M Q=16,
            # ops.frame_scoring.query_program_batch_framescale).
            row_max = np.abs(V_pad).max(axis=1)
            if int8_scale == "frame":
                Fq_ = valid.shape[0]
                frame_max = row_max.reshape(Fq_, self._tile_bound).max(axis=1)
                fscales = np.where(
                    frame_max > 0, frame_max / 127.0, 1.0
                ).astype(np.float32)
                scales = np.repeat(fscales, self._tile_bound)
                self._frame_scale = jnp.asarray(fscales)
            else:
                assert int8_scale == "row", f"unknown int8_scale {int8_scale!r}"
                scales = np.where(
                    row_max > 0, row_max / 127.0, 1.0
                ).astype(np.float32)
                self._frame_scale = None
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
        # static frame mask for the construction-time exclusion list; padded
        # frames (pallas block granularity) are permanently excluded
        base = (
            self.excluded.contains_many(meta.frame_dbidx.astype(np.uint32))
            if len(self.excluded)
            else np.zeros(meta.n_frames, dtype=bool)
        )
        Fq = valid.shape[0]
        if Fq != meta.n_frames:
            base = np.concatenate([base, np.ones(Fq - meta.n_frames, dtype=bool)])
        self._base_excluded_mask = base
        self._init_exclusion_state()

    @staticmethod
    def from_device_arrays(
        *,
        embedding,
        V: "jnp.ndarray",  # (Fp*T, D) frame-major padded, device-resident
        valid: "jnp.ndarray",  # (Fq, T) bool (Fq = real frame count, or padded)
        boxes: "jnp.ndarray",  # (Fq*T, 4) device
        zoom: "jnp.ndarray",  # (Fq*T,) device
        meta: VectorMeta,
        row_scale: Optional["jnp.ndarray"] = None,
        frame_scale: Optional["jnp.ndarray"] = None,  # (Fq,) int8 per-frame
        use_pallas: bool = True,
    ) -> "MultiscaleIndex":
        """Serving-scale construction from pre-built DEVICE arrays, with NO
        host copy of the embedding matrix (a 10M x 512 f32 host mirror is
        20GB; the host keeps only the per-vector metadata). Labeled-row
        vectors for per-round fits come from `vectors_for_rows`, which
        gathers the few hundred labeled rows from the device matrix."""
        self = MultiscaleIndex.__new__(MultiscaleIndex)
        self.embedding = embedding
        self.path = None
        self.meta = meta
        self.vectors = None
        self.excluded = BitMap()
        self.all_indices = FrozenBitMap(meta.frame_dbidx)
        self._tile_bound = valid.shape[1]
        assert self._tile_bound >= meta.max_tiles_per_frame
        self._use_pallas = use_pallas
        self.device_dtype = str(V.dtype)
        self._sharded = None
        self._V = V
        self._row_scale = row_scale
        self._frame_scale = frame_scale
        self._pad_rows = None  # rank_by_scores needs the host-built plan
        self._pad_valid_flat = None
        self._valid = valid
        self._boxes = boxes
        self._zoom = zoom
        self._max_zoom = max(meta.max_zoom_level, 1)
        base = np.zeros(int(valid.shape[0]), dtype=bool)
        base[meta.n_frames:] = True  # padded frames permanently excluded
        self._base_excluded_mask = base
        self._init_exclusion_state()
        return self

    def padded_row_ids(self, rows: np.ndarray) -> np.ndarray:
        """Exact-layout row indices -> padded-device-layout row indices."""
        rows = np.asarray(rows, dtype=np.int64)
        f = self.meta.frame_id[rows]
        offs = rows - self.meta.frame_starts[f]
        return (f.astype(np.int64) * self._tile_bound + offs).astype(np.int32)

    def sum_vectors_for_rows(self, groups) -> np.ndarray:
        """(k, D) f32 sums over exact-layout row groups. Without a host
        mirror this is ONE device dispatch returning k vectors (4KB) —
        point-based refines (e.g. Rocchio's class means) must not fetch the
        full labeled matrix through a slow link just to reduce it."""
        if self.vectors is not None:
            d = self.vectors.shape[1]
            return np.stack([
                self.vectors[np.asarray(g, dtype=np.int64)].sum(axis=0)
                if len(g) else np.zeros(d, dtype=np.float32)
                for g in groups
            ]).astype(np.float32)

        meta = self.meta
        bucket = max(
            512, _next_pow2(max(max((len(g) for g in groups), default=1), 1))
        )
        prows = np.zeros((len(groups), bucket), dtype=np.int32)
        valid = np.zeros((len(groups), bucket), dtype=np.float32)
        for i, g in enumerate(groups):
            g = np.asarray(g, dtype=np.int64)
            prows[i, : g.shape[0]] = self.padded_row_ids(g)
            valid[i, : g.shape[0]] = 1.0
        out = _group_sums(
            self._V, jnp.asarray(prows), jnp.asarray(valid), self._row_scale
        )
        return np.asarray(out, dtype=np.float32)

    def vectors_for_rows(self, rows: np.ndarray) -> np.ndarray:
        """f32 vectors for exact-layout row indices. Uses the host mirror
        when present; otherwise gathers from the device matrix (the per-round
        labeled set is a few hundred rows — one tiny dispatch)."""
        rows = np.asarray(rows, dtype=np.int64)
        if self.vectors is not None:
            return self.vectors[rows]
        n = rows.shape[0]
        prows = self.padded_row_ids(rows)
        # pad to power-of-2 buckets (floor 512): the labeled set GROWS every
        # round, and an exact-shape gather would recompile per round
        # (~seconds each); the 512 floor keeps a typical whole session in
        # ONE compiled shape
        bucket = max(512, _next_pow2(max(n, 1)))
        prows = np.concatenate([prows, np.zeros(bucket - n, np.int32)])
        dev = jnp.asarray(prows)
        out = self._V[dev]
        if out.dtype == jnp.int8:
            scale = (
                self._row_scale[dev][:, None]
                if self._row_scale is not None
                else 1.0
            )
            out = out.astype(jnp.float32) * scale
        return np.asarray(out, dtype=np.float32)[:n]

    # -- basic ops ---------------------------------------------------------
    def string2vec(self, string: str) -> np.ndarray:
        vec = self.embedding.from_string(string=string)
        vec = np.asarray(vec, dtype=np.float32).reshape(-1)
        return vec / np.linalg.norm(vec)

    def score_device(self, vec: np.ndarray):
        """`score` WITHOUT forcing the (N,) result through the host: on a
        device-built index (from_device_arrays) returns a device array that
        downstream device consumers (KnnProp2 propagation priors,
        rank_by_scores) use in place — a feedback session's scores then
        never round-trip N floats per query. Host-built indexes return the
        host scores unchanged (the differential-tested reference path)."""
        q = np.asarray(vec, np.float32).reshape(-1)
        if self.vectors is None:
            # device-built index (from_device_arrays): no host vector mirror.
            # Requires uniform tiling, where the frame-major padded layout IS
            # the exact layout (every row real, e.g. ingest.device_tiling).
            assert self._V is not None and self.meta.n_vectors == int(
                self._V.shape[0]
            ), "device score() needs uniform tiling (padded layout == exact)"
            rs = self._row_scale
            if rs is None and self._frame_scale is not None:
                # query-invariant: expand the per-frame scale to per-row once
                # and keep the (N,) device array (at 10M an uncached repeat
                # is an extra dispatch + transient per set_text/score call)
                rs = getattr(self, "_frame_scale_rows", None)
                if rs is None:
                    rs = jnp.repeat(self._frame_scale, self._tile_bound)
                    self._frame_scale_rows = rs
            return frame_scoring.score_vectors(self._V, jnp.asarray(q), rs)
        return self.vectors @ q

    def score(self, vec: np.ndarray) -> np.ndarray:
        """Per-vector scores in the exact (unpadded) layout
        (reference `multiscale_index.py:284`)."""
        return np.asarray(self.score_device(vec))

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
        mask = self._base_excluded_mask.copy()  # may carry a padded tail
        if exclude is not None and len(exclude):
            mask[: self.meta.n_frames] |= exclude.contains_many(
                self.meta.frame_dbidx.astype(np.uint32)
            )
        return mask

    # -- device-persistent exclusion state ---------------------------------
    # The (F,) bool mask lives ON DEVICE across clicks; per query only the
    # delta vs the previously-seen exclusion set (a handful of dbidxs) rides
    # into the fused program, which applies it and returns the updated mask
    # (SURVEY §7 hard part; the reference re-derives exclusion per query,
    # multiscale_index.py:314-352).
    def _init_exclusion_state(self):
        import threading
        from collections import OrderedDict

        # PER-SESSION device-mask cache: one entry per exclusion BitMap
        # object (a session's `returned` set), so concurrent sessions
        # sharing one index each keep their own device-resident mask and
        # interleaved clicks stay incremental (a single shared slot would
        # force a full host rebuild + upload on every alternation). Each
        # entry's (prev, dev) must stay mutually consistent: dev is exactly
        # prev's exclusions; all writes go through _commit_exclusion under
        # the lock with a per-entry generation check. LRU-capped: an entry
        # holds a (F,)-bool device mask (~1.25 MB at 10M vectors) plus a
        # strong ref to the session's BitMap (keeps id() stable).
        self._excl_lock = threading.Lock()
        self._excl_entries = OrderedDict()  # id(BitMap) -> _ExclEntry
        self._excl_base = {}  # layout -> device mask for exclude=None

    def _no_new_ids(self) -> np.ndarray:
        return np.full(self._EXCL_DELTA, -1, dtype=np.int32)

    def _mask_to_device(self, mask: np.ndarray, sharded: bool):
        """Host frame mask -> the device layout the query program expects:
        (Fq,) flat for the single-device programs (incl. rank_by_scores /
        deferred rounds on a mesh index), (S, Fs) P('data')-sharded for the
        mesh query path."""
        if sharded:
            return self._sharded.shard_mask(mask)
        return jnp.asarray(mask)

    def _dbidx_to_frame_ordinals(self, ids: np.ndarray) -> np.ndarray:
        fd = self.meta.frame_dbidx
        pos = np.searchsorted(fd, ids)
        safe = np.minimum(pos, fd.shape[0] - 1)
        return pos[(pos < fd.shape[0]) & (fd[safe] == ids)].astype(np.int32)

    _EXCL_CACHE = 32  # max concurrent sessions with device-resident masks

    def _device_exclusion(self, exclude: Optional[BitMap], *,
                          sharded: bool = False):
        """(device mask, padded new frame ordinals, commit token)."""
        no_new = self._no_new_ids()
        layout = "sharded" if sharded else "flat"
        with self._excl_lock:
            if exclude is None or len(exclude) == 0:
                base = self._excl_base.get(layout)
                if base is None:
                    base = self._mask_to_device(
                        self._base_excluded_mask, sharded
                    )
                    self._excl_base[layout] = base
                return base, jnp.asarray(no_new), None

            key = id(exclude)
            e = self._excl_entries.get(key)
            if (e is not None and e.obj is exclude and e.layout == layout
                    and e.prev is not None):
                added = exclude.difference(e.prev)
                removed = e.prev.difference(exclude)
                if len(removed) == 0 and len(added) <= self._EXCL_DELTA:
                    ords = self._dbidx_to_frame_ordinals(
                        np.asarray(added.to_array(), dtype=np.int64)
                    )
                    out = no_new
                    out[: ords.shape[0]] = ords
                    e.gen += 1
                    self._excl_entries.move_to_end(key)
                    token = (key, e.gen, exclude, exclude.copy(), layout)
                    return e.dev, jnp.asarray(out), token

            # first sighting of this exclusion set (or it shrank / jumped /
            # changed layout): one full host rebuild, then incremental on
            mask = self._mask_to_device(
                self._frame_exclusion_mask(exclude), sharded
            )
            # publish the rebuilt entry immediately; the program's returned
            # mask is identical (no new ids ride along)
            e = _ExclEntry(exclude, exclude.copy(), mask, layout)
            self._excl_entries[key] = e
            self._excl_entries.move_to_end(key)
            while len(self._excl_entries) > self._EXCL_CACHE:
                self._excl_entries.popitem(last=False)  # evict LRU session
            return mask, jnp.asarray(no_new), None

    def _commit_exclusion(self, token, new_mask):
        if token is None:
            return
        key, gen, exclude, prev_copy, layout = token
        with self._excl_lock:
            e = self._excl_entries.get(key)
            # per-entry generation: only the latest handout for THIS session
            # may publish (an interleaved same-session handout supersedes)
            if e is not None and e.obj is exclude and e.gen == gen:
                e.prev = prev_copy
                e.dev = new_mask

    @property
    def supports_deferred_query(self) -> bool:
        """One-dispatch refine+query fusion (DeferredRocchio): available on
        single-chip device-resident matrices."""
        return self._V is not None and self._sharded is None

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

        if isinstance(vector, frame_scoring.DeferredVector):
            if not self.supports_deferred_query:
                vector = vector.materialize(self)
            else:
                assert vector2 is None
                handler = {
                    frame_scoring.DeferredRocchio: self._query_rocchio,
                    frame_scoring.DeferredLogistic: self._query_logistic,
                    frame_scoring.DeferredMultiReg: self._query_multireg,
                }[type(vector)]
                return handler(
                    vector, topk_eff=topk_eff, shortlist_size=shortlist_size,
                    exclude=exclude, agg_method=agg_method,
                    aug_larger=aug_larger, aug_weight=aug_weight,
                )

        if self._sharded is not None:
            from ..parallel.sharded_index import sharded_query_topk_incr

            # the (S, Fs) mask lives sharded on the mesh across clicks; only
            # the delta frame ordinals ride in (same protocol as the
            # single-chip path below)
            mask, new_ids, token = self._device_exclusion(
                exclude, sharded=True
            )
            dbidxs, scores, act_boxes, act_scores, new_mask = (
                sharded_query_topk_incr(
                    self._sharded,
                    np.asarray(vector, np.float32).reshape(-1),
                    mask, new_ids,
                    topk=topk_eff,
                    shortlist_size=shortlist_size,  # GLOBAL shortlist
                    aug_larger=aug_larger,
                    aug_weight=aug_weight,
                    agg_method=agg_method,
                    qvec2=vector2,
                )
            )
            self._commit_exclusion(token, new_mask)
            activations = [
                {
                    "x1": float(b[0]), "y1": float(b[1]),
                    "x2": float(b[2]), "y2": float(b[3]),
                    "dbidx": int(dbx), "score": float(s),
                }
                for b, s, dbx in zip(act_boxes, act_scores, dbidxs)
            ]
            return {"dbidxs": dbidxs.astype(np.int64), "activations": activations}

        mask, new_ids, token = self._device_exclusion(exclude)
        q = jnp.asarray(np.asarray(vector, np.float32).reshape(-1))
        q2 = (jnp.asarray(np.asarray(vector2, np.float32).reshape(-1))
              if vector2 is not None else None)
        self.last_program_shape = ("plain", vector2 is not None)
        # int8 always routes through XLA: Mosaic int8 VMEM paths stall at
        # ~200GB/s while XLA's int8 matvec streams at ~477GB/s of int8
        # bytes — the fastest scan on this toolchain (scripts/perf_probe.py)
        if self._use_pallas and q2 is None and self._V.dtype != jnp.int8:
            from ..ops.pallas_scoring import query_program_fused_incr

            res, new_mask = query_program_fused_incr(
                self._V, self._valid, self._boxes, self._zoom, q,
                mask, new_ids, self._row_scale,
                shortlist_size=shortlist_size, topk=topk_eff,
                tile_bound=self._tile_bound,
                aug_larger=aug_larger, aug_weight=aug_weight,
                agg_method=agg_method, max_zoom=self._max_zoom,
                interpret=_pallas_interpret(),
            )
        else:
            res, new_mask = frame_scoring.query_program_incr(
                self._V, self._valid, self._boxes, self._zoom,
                q, q2, mask, new_ids, self._row_scale,
                shortlist_size=shortlist_size, topk=topk_eff,
                aug_larger=aug_larger, aug_weight=aug_weight,
                agg_method=agg_method, max_zoom=self._max_zoom,
            )
        self._commit_exclusion(token, new_mask)
        return self._format_result(res)

    def _query_rocchio(
        self,
        dv: "frame_scoring.DeferredRocchio",
        *,
        topk_eff: int,
        shortlist_size: int,
        exclude: Optional[BitMap],
        agg_method: str,
        aug_larger: str,
        aug_weight: str,
    ) -> dict:
        """ONE-dispatch feedback round: class-mean gather + Rocchio update +
        full query program fused into a single device program (the default
        path dispatches the class sums and the query separately)."""
        mask, new_ids, token = self._device_exclusion(exclude)

        def pad_rows(r):
            pr = (self.padded_row_ids(r) if r.size
                  else np.empty(0, np.int32))
            # pow2 buckets bound recompiles to log2(max labels) programs;
            # min 64 covers ~20 feedback rounds before the first regrowth
            B = max(64, 1 << int(np.ceil(np.log2(max(pr.size, 1)))))
            out = np.full(B, -1, np.int32)
            out[: pr.size] = pr
            return jnp.asarray(out)

        pos_padded = pad_rows(dv.pos_rows)
        neg_padded = pad_rows(dv.neg_rows)
        self.last_program_shape = (
            "rocchio", pos_padded.shape[0], neg_padded.shape[0]
        )
        res, new_mask, q = _rocchio_query_incr(
            self._V, self._valid, self._boxes, self._zoom, self._row_scale,
            jnp.asarray(dv.q0), pos_padded, neg_padded,
            mask, new_ids,
            np.float32(dv.alpha), np.float32(dv.beta), np.float32(dv.gamma),
            use_pallas=bool(self._use_pallas and self._V.dtype != jnp.int8),
            tile_bound=self._tile_bound,
            shortlist_size=shortlist_size, topk=topk_eff,
            aug_larger=aug_larger, aug_weight=aug_weight,
            agg_method=agg_method, max_zoom=self._max_zoom,
            interpret=_pallas_interpret(),
        )
        self._commit_exclusion(token, new_mask)
        res, q = jax.device_get((res, q))  # one transfer
        out = self._format_result(res)
        out["qvec"] = np.asarray(q, np.float32)
        return out

    def _query_logistic(
        self,
        dv: "frame_scoring.DeferredLogistic",
        *,
        topk_eff: int,
        shortlist_size: int,
        exclude: Optional[BitMap],
        agg_method: str,
        aug_larger: str,
        aug_weight: str,
    ) -> dict:
        """ONE-dispatch LogReg2 round: labeled-row gather + LBFGS fit + the
        query over the fitted coefficient (see _logistic_query_incr)."""
        mask, new_ids, token = self._device_exclusion(exclude)
        self.last_program_shape = (
            "logreg", dv.prows.shape[0], dv.max_iter, dv.has_anchor
        )
        res, new_mask, params, mu, f, diverged = _logistic_query_incr(
            self._V, self._valid, self._boxes, self._zoom, self._row_scale,
            jnp.asarray(dv.prows), jnp.asarray(dv.valid), jnp.asarray(dv.y),
            jnp.asarray(dv.sw), jnp.asarray(dv.n_real),
            jnp.asarray(dv.pos_weight), jnp.asarray(dv.reg_weight),
            jnp.asarray(dv.anchor), jnp.asarray(dv.params0),
            mask, new_ids,
            fit_intercept=dv.fit_intercept, max_iter=dv.max_iter,
            has_anchor=dv.has_anchor, center=dv.center,
            use_pallas=bool(self._use_pallas and self._V.dtype != jnp.int8),
            tile_bound=self._tile_bound,
            shortlist_size=shortlist_size, topk=topk_eff,
            aug_larger=aug_larger, aug_weight=aug_weight,
            agg_method=agg_method, max_zoom=self._max_zoom,
            interpret=_pallas_interpret(),
        )
        res, params, mu, f, diverged = jax.device_get(
            (res, params, mu, f, diverged)
        )  # one transfer
        if bool(diverged):
            # match the host fit path (learners/logistic_regression.py): fail
            # BEFORE publishing any round state — the exclusion mask is not
            # committed and the caller's returned-set stays clean
            raise ValueError("regression training diverged (nan/inf loss)")
        self._commit_exclusion(token, new_mask)
        out = self._format_result(res)
        out["qvec"] = np.asarray(params[:-1], np.float32)
        out["fit"] = {
            "params": np.asarray(params), "mu": np.asarray(mu),
            "loss": float(f), "diverged": bool(diverged),
        }
        return out

    def _query_multireg(
        self,
        dv: "frame_scoring.DeferredMultiReg",
        *,
        topk_eff: int,
        shortlist_size: int,
        exclude: Optional[BitMap],
        agg_method: str,
        aug_larger: str,
        aug_weight: str,
    ) -> dict:
        """ONE-dispatch MultiReg ('seesaw') round: labeled-row gather +
        centering + the 4-term LBFGS fit + the query over the coefficient
        (see _multireg_query_incr)."""
        mask, new_ids, token = self._device_exclusion(exclude)
        self.last_program_shape = (
            "multireg", dv.prows.shape[0], dv.max_iter, dv.label_loss_type
        )
        res, new_mask, coeff, f, diverged = _multireg_query_incr(
            self._V, self._valid, self._boxes, self._zoom, self._row_scale,
            jnp.asarray(dv.prows), jnp.asarray(dv.valid), jnp.asarray(dv.y),
            jnp.asarray(dv.sw), jnp.asarray(dv.qvec_hat), jnp.asarray(dv.xlx),
            jnp.asarray(dv.rank_loss_margin), jnp.asarray(dv.pos_weight_value),
            jnp.asarray(dv.reg_data_lambda), jnp.asarray(dv.reg_norm_lambda),
            jnp.asarray(dv.reg_query_lambda),
            mask, new_ids,
            label_loss_type=dv.label_loss_type,
            pos_weight_balanced=dv.pos_weight_balanced,
            max_iter=dv.max_iter,
            use_pallas=bool(self._use_pallas and self._V.dtype != jnp.int8),
            tile_bound=self._tile_bound,
            shortlist_size=shortlist_size, topk=topk_eff,
            aug_larger=aug_larger, aug_weight=aug_weight,
            agg_method=agg_method, max_zoom=self._max_zoom,
            interpret=_pallas_interpret(),
        )
        res, coeff, f, diverged = jax.device_get((res, coeff, f, diverged))
        if bool(diverged):
            # match learners/multi_reg.py's host path: raise before any round
            # state (exclusion mask, returned-set) is published
            raise ValueError("multi-reg fit diverged (nan/inf)")
        self._commit_exclusion(token, new_mask)
        out = self._format_result(res)
        out["qvec"] = np.asarray(coeff, np.float32)
        return out

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
        propagation) with the same shortlist + augmentation tail as query().

        A DeferredPropagation marker (graph loop, windowed device mode) fuses
        the staged round — click scatter + Jacobi propagation + this ranking
        tail — into ONE device dispatch; indexes that can't fuse (sharded,
        host-gather layouts) materialize it through the eager path."""
        if shortlist_size is None or shortlist_size < topk:
            shortlist_size = max(topk * 5, shortlist_size or 0)
        shortlist_size = min(shortlist_size, self.n_frames)
        topk_eff = min(topk, self.n_frames)

        from ..ops.propagation import DeferredPropagation

        if isinstance(scores, DeferredPropagation):
            layout = scores.ranker.lp.windowed_layout
            fusable = (
                self._V is not None
                and self._sharded is None
                and self._pad_rows is None
                and layout is not None
                and layout.n == self.meta.n_vectors
            )
            if not fusable:
                scores = scores.materialize()
            else:
                return self._rank_deferred_propagation(
                    scores, topk_eff=topk_eff, shortlist_size=shortlist_size,
                    exclude=exclude, agg_method=agg_method,
                    aug_larger=aug_larger, aug_weight=aug_weight,
                )

        if self._sharded is not None:
            # mesh index: the ranking tail runs SHARDED (per-shard shortlist
            # + augmentation, global cutoff + merged top-k over ICI) — the
            # multi-chip KnnProp2 serving round's rank step
            from ..parallel.sharded_index import sharded_rank_by_scores

            mask_np = np.array(self._base_excluded_mask, dtype=bool)
            if exclude is not None and len(exclude):
                ords = self._dbidx_to_frame_ordinals(
                    np.asarray(exclude.to_array(), dtype=np.int64)
                )
                mask_np[ords[ords >= 0]] = True
            dbidxs, fscores, act_boxes, act_scores = sharded_rank_by_scores(
                self._sharded, np.asarray(scores, np.float32), mask_np,
                topk=topk_eff, shortlist_size=shortlist_size,
                aug_larger=aug_larger, aug_weight=aug_weight,
                agg_method=agg_method,
            )
            activations = [
                {
                    "x1": float(b[0]), "y1": float(b[1]),
                    "x2": float(b[2]), "y2": float(b[3]),
                    "dbidx": int(dbidx), "score": float(s),
                }
                for b, s, dbidx in zip(act_boxes, act_scores, dbidxs)
            ]
            return {"dbidxs": dbidxs.astype(np.int64),
                    "activations": activations}

        mask, new_ids, token = self._device_exclusion(exclude)

        if isinstance(scores, jax.Array):
            # device-resident scores (e.g. label propagation's device_out):
            # no host round-trip of N floats per feedback round
            s = scores.astype(jnp.float32)
        else:
            s = jnp.asarray(np.asarray(scores, np.float32))
        if self._pad_rows is None:
            # device-built index (from_device_arrays): uniform tiling means
            # the exact layout already IS the frame-major padded layout, so
            # no host gather plan is needed — mask invalid rows and go
            assert self.meta.n_vectors == int(s.shape[0]), (
                "rank_by_scores on a device-built index needs uniform "
                "tiling (padded layout == exact layout)"
            )
            s_pad = jnp.where(self._valid.reshape(-1), s, -jnp.inf)
        else:
            s_pad = jnp.where(self._pad_valid_flat, s[self._pad_rows], -jnp.inf)
        res, new_mask = frame_scoring.rank_frames_from_scores_incr(
            s_pad, self._valid, self._boxes, self._zoom,
            mask, new_ids,
            shortlist_size=shortlist_size, topk=topk_eff,
            aug_larger=aug_larger, aug_weight=aug_weight,
            agg_method=agg_method, max_zoom=self._max_zoom,
        )
        self._commit_exclusion(token, new_mask)
        return self._format_result(res)

    def _rank_deferred_propagation(
        self,
        dp,  # ops.propagation.DeferredPropagation
        *,
        topk_eff: int,
        shortlist_size: int,
        exclude: Optional[BitMap],
        agg_method: str,
        aug_larger: str,
        aug_weight: str,
    ) -> dict:
        """ONE-dispatch KnnProp2 round: the staged clicks scatter into the
        persistent device label state, the windowed Jacobi loop runs to
        convergence, and the propagated scores feed the ranking tail — all
        inside a single device program (ops.propagation.
        propagate_rank_windowed). The updated label state and convergence
        info ride back in the same fetch and are committed to the ranker
        afterwards (mirroring the LogReg2 fit state, `_query_logistic`)."""
        import jax

        from ..ops import propagation as prop_ops

        ranker = dp.ranker
        lp = ranker.lp
        layout = lp.windowed_layout
        mask, new_ids, token = self._device_exclusion(exclude)
        labels_dev, il_dev, ids, vals = ranker._deferred_state()
        cidx, wslab, ovf_src, ovf_nbr, ovf_w = layout.device_arrays()
        reorder = (layout.order_arrays()
                   if getattr(layout, "order", None) is not None else None)
        has_order = reorder is not None
        empty = jnp.zeros(0, jnp.int32)
        order_d, inv_d = reorder if has_order else (empty, empty)
        # Mosaic only compiles on real TPU backends (same rule as
        # ops.propagation.propagate_windowed)
        interpret = jax.default_backend() == "cpu"
        # the fused program's Jacobi loop is bounded by the ranker's
        # dispatch budget, NOT max_iter: at 10M tiles a windowed step is
        # ~116 ms, so an un-bounded cold round (fresh session, epsilon
        # unreached) would be a single ~35 s device program — the class of
        # long dispatch execution watchdogs kill (ops/propagation.py
        # dispatch_iters exists for exactly this)
        stop = int(min(lp.dispatch_iters or lp.max_iter, lp.max_iter))
        self.last_program_shape = ("knnprop", ids.shape[0], has_order)
        res, new_mask, scores, labels2, il2, i, done = (
            prop_ops.propagate_rank_windowed(
                cidx, wslab, ovf_src, ovf_nbr, ovf_w,
                layout.routed_arrays(),
                order_d, inv_d,
                lp._deg, ranker.prior_scores, labels_dev, il_dev,
                jnp.asarray(ids), jnp.asarray(vals),
                # start iterate: the prior (reference semantics) unless the
                # ranker opted into warm_start (previous round's fixed point)
                jnp.asarray(ranker._propagation_start(), dtype=jnp.float32),
                self._valid, self._boxes, self._zoom,
                mask, new_ids,
                jnp.float32(lp.reg_lambda), jnp.float32(lp.epsilon),
                jnp.asarray(stop),
                max_iter=lp.max_iter,
                n=layout.n, B=layout.B, W=layout.W, cap=layout.cap,
                interpret=interpret, has_order=has_order,
                shortlist_size=shortlist_size, topk=topk_eff,
                aug_larger=aug_larger, aug_weight=aug_weight,
                agg_method=agg_method, max_zoom=self._max_zoom,
            )
        )
        # one transfer: the ranked result + convergence info together
        res, i_h, done_h = jax.device_get((res, i, done))
        if not bool(done_h) and int(i_h) < lp.max_iter:
            # rare path (round needs more than one dispatch budget): resume
            # the Jacobi loop segment-by-segment from the partial iterate —
            # a mid-loop iterate is already label-clamped, so feeding it back
            # as `start` continues the exact sequence — then re-rank over the
            # converged scores (the fused ranking above was partial). The
            # exclusion deltas were applied inside the fused dispatch, so the
            # re-rank ships an empty delta against the same new mask.
            pr = prop_ops.propagate_windowed(
                layout, lp._deg, ranker.prior_scores, labels2, il2, scores,
                reg_lambda=float(lp.reg_lambda),
                max_iter=lp.max_iter - int(i_h), epsilon=lp.epsilon,
                dispatch_iters=lp.dispatch_iters, interpret=interpret,
            )
            scores = pr.scores
            n2, done_h = map(
                lambda x: x.item(), jax.device_get((pr.n_iter, pr.converged))
            )
            i_h = int(i_h) + int(n2)
            s_pad = jnp.where(self._valid.reshape(-1), scores, -jnp.inf)
            res2, new_mask = frame_scoring.rank_frames_from_scores_incr(
                s_pad, self._valid, self._boxes, self._zoom,
                new_mask, jnp.full(64, -1, jnp.int32),
                shortlist_size=shortlist_size, topk=topk_eff,
                aug_larger=aug_larger, aug_weight=aug_weight,
                agg_method=agg_method, max_zoom=self._max_zoom,
            )
            res = jax.device_get(res2)
        self._commit_exclusion(token, new_mask)
        ranker._commit_deferred(scores, labels2, il2, int(i_h), bool(done_h))
        return self._format_result(res)

    def _format_result(self, res) -> dict:
        import jax

        res = jax.device_get(res)  # one transfer for all leaves (tunnel RTT)
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
        from ..runtime.cache import index_cache

        index_cache.invalidate_prefix(str(Path(index_path)))
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
        idx = MultiscaleIndex(
            embedding=embedding, vectors=vectors, meta=meta,
            path=str(p), excluded=excluded,
            device_dtype=device_dtype,
            mesh=mesh,
            use_pallas=bool(options.get("use_pallas", False)),
            int8_scale=options.get("int8_scale", "row"),
        )
        if options.get("coalesce_ms"):
            # concurrent sessions share one (N,D)@(D,Q) device scan
            from ..web.coalesce import CoalescingIndex

            return CoalescingIndex(idx, window_ms=float(options["coalesce_ms"]))
        return idx

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
