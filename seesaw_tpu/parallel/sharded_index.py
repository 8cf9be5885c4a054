"""Row-sharded frame index: exact distributed top-k over a device mesh.

The database's frames are partitioned contiguously into S = mesh-size shards
(frame-major padded layout, see ops.frame_scoring). Each device owns one
shard's embedding block and runs the *full* single-shard query program
(score -> distinct-frame shortlist -> frame augmentation) on its local
frames — frame augmentation is per-frame independent, so merging per-shard
top-k lists is exact, and the only cross-chip traffic is the (S x k)
candidate gather riding ICI.

This is the scale path for 10M+ vectors (SURVEY.md §7 stage 6): per-chip
work is one bf16 matvec over the local block + an O(k) merge; the reference
needed an ANN index (annoy) because a single CPU couldn't scan — a sharded
MXU scan is both exact and faster.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..indices.meta import VectorMeta, next_pow2 as _next_pow2
from ..ops import frame_scoring


@dataclass
class ShardedFrameIndex:
    """Device-sharded padded blocks (leading axis = shard) + host metadata."""

    mesh: Mesh
    V: jax.Array  # (S, Fs*T, D) sharded over 'data'
    valid: jax.Array  # (S, Fs, T) bool
    boxes: jax.Array  # (S, Fs*T, 4)
    zoom: jax.Array  # (S, Fs*T)
    frame_offset: jax.Array  # (S, 1) global frame base per shard
    frame_dbidx: np.ndarray  # (F_total,) global frame -> dbidx
    n_frames_local: int  # Fs
    tile_bound: int
    max_zoom: int
    row_scale: jax.Array | None = None  # (S, Fs*T) int8 per-row dequant
    pad_rows: np.ndarray | None = None  # (F*T,) meta row per padded slot
    pad_valid: np.ndarray | None = None  # (F*T,) real-tile mask

    @property
    def n_shards(self) -> int:
        return int(self.V.shape[0])

    @property
    def n_frames(self) -> int:
        return self.frame_dbidx.shape[0]

    def shard_mask(self, mask: np.ndarray) -> jax.Array:
        """(n_frames,) host bool -> (S, Fs) device mask sharded over 'data'
        (shard padding frames are permanently excluded)."""
        S, Fs = self.n_shards, self.n_frames_local
        out = np.ones(S * Fs, dtype=bool)
        out[: self.n_frames] = mask[: self.n_frames]
        return jax.device_put(
            jnp.asarray(out.reshape(S, Fs)), NamedSharding(self.mesh, P("data"))
        )

    def shard_tile_scores(self, tile_scores: np.ndarray) -> jax.Array:
        """(n_vectors,) per-tile scores (meta row order, e.g. a propagation
        result) -> (S, Fs*T) padded blocks sharded over 'data', padding rows
        at -inf. The layout mirrors V's so rank-by-scores reuses the query
        tail verbatim."""
        if self.pad_rows is None:
            raise ValueError("index built without pad_rows (old snapshot)")
        S, Fs, T = self.n_shards, self.n_frames_local, self.tile_bound
        flat = np.full(S * Fs * T, -np.inf, dtype=np.float32)
        n_ft = self.pad_rows.shape[0]
        vals = np.asarray(tile_scores, dtype=np.float32)[self.pad_rows]
        vals = np.where(self.pad_valid, vals, -np.inf)
        flat[:n_ft] = vals
        return jax.device_put(
            jnp.asarray(flat.reshape(S, Fs * T)),
            NamedSharding(self.mesh, P("data")),
        )

    @staticmethod
    def build(
        vectors: np.ndarray, meta: VectorMeta, mesh: Mesh,
        dtype: str = "float32",
    ) -> "ShardedFrameIndex":
        """dtype: 'float32' | 'bfloat16' | 'int8' — the same storage options
        as the single-chip index; int8 quantizes each PADDED row by its own
        absmax (MultiscaleIndex int8_scale='row' semantics) and carries the
        (S, Fs*T) dequant scales sharded next to the blocks."""
        if mesh.devices.size != mesh.shape.get("data", 0):
            raise ValueError(
                "ShardedFrameIndex requires a 1-D mesh with axis 'data' "
                f"(got axes {dict(mesh.shape)})"
            )
        S = mesh.shape["data"]
        F = meta.n_frames
        Fs = -(-F // S)
        T = _next_pow2(max(meta.max_tiles_per_frame, 1))

        rows, valid = meta.padded_rows(T)  # (F, T)
        flat_rows = rows.reshape(-1)
        flat_valid = valid.reshape(-1)
        V_pad = np.ascontiguousarray(vectors[flat_rows], dtype=np.float32)
        V_pad[~flat_valid] = 0
        boxes_pad = meta.boxes[flat_rows]
        zoom_pad = meta.zoom_level[flat_rows]

        row_scale_pad = None
        if dtype == "int8":
            row_max = np.abs(V_pad).max(axis=1)
            scales = np.where(row_max > 0, row_max / 127.0, 1.0).astype(
                np.float32
            )
            V_pad = np.clip(
                np.round(V_pad / scales[:, None]), -127, 127
            ).astype(np.int8)
            row_scale_pad = scales
        elif dtype == "bfloat16":
            V_pad = V_pad.astype(jnp.bfloat16)  # ml_dtypes-backed np dtype
        elif dtype != "float32":
            raise ValueError(f"unknown sharded storage dtype {dtype!r}")

        def shard_blocks(arr_ft, fill=0):
            """(F*T, ...) -> (S, Fs*T, ...) padded with fill."""
            out_shape = (S, Fs * T) + arr_ft.shape[1:]
            out = np.full(out_shape, fill, dtype=arr_ft.dtype)
            flat = out.reshape((S * Fs * T,) + arr_ft.shape[1:])
            flat[: F * T] = arr_ft
            return out

        valid_s = np.zeros((S, Fs, T), dtype=bool)
        valid_s.reshape(S * Fs, T)[:F] = valid

        sharding = NamedSharding(mesh, P("data"))

        def put(x):
            return jax.device_put(jnp.asarray(x), sharding)

        offsets = (np.arange(S, dtype=np.int32) * Fs).reshape(S, 1)
        return ShardedFrameIndex(
            mesh=mesh,
            V=put(shard_blocks(V_pad)),
            valid=put(valid_s),
            boxes=put(shard_blocks(boxes_pad)),
            zoom=put(shard_blocks(zoom_pad)),
            frame_offset=put(offsets),
            frame_dbidx=meta.frame_dbidx,
            n_frames_local=Fs,
            tile_bound=T,
            max_zoom=max(meta.max_zoom_level, 1),
            row_scale=(
                put(shard_blocks(row_scale_pad, fill=1.0))
                if row_scale_pad is not None else None
            ),
            pad_rows=flat_rows,
            pad_valid=flat_valid,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "shortlist_size", "topk",
        "aug_larger", "aug_weight", "agg_method", "max_zoom",
    ),
)
def _sharded_query(
    V, valid, boxes, zoom, frame_offset, qvec, qvec2, excluded, new_ids,
    row_scale,
    *,
    mesh: Mesh,
    shortlist_size: int,
    topk: int,
    aug_larger: str,
    aug_weight: str,
    agg_method: str,
    max_zoom: int,
):
    Fs = valid.shape[1]
    topk_local = min(topk, Fs)
    shortlist_local = min(shortlist_size, Fs)
    S = mesh.shape["data"]
    # the GLOBAL raw-score shortlist size: the single-device program (and the
    # reference, multiscale_index.py:291-352) shortlists the top
    # `shortlist_size` frames by raw tile score over the WHOLE database
    # before augmentation. Each shard contributes its local raw top-k, an
    # all_gather establishes the global cutoff, and frames below it are
    # masked out of the augmentation stage — so the sharded result equals
    # the single-device result (a per-shard-only shortlist would augment a
    # SUPERSET of candidates and could rank a raw-rank-51 frame into the
    # final top-k that the reference's protocol never rescores).
    k_global = min(shortlist_size, S * shortlist_local)

    def per_shard(V, valid, boxes, zoom, frame_offset, excluded, *rs):
        rs = rs[0][0] if rs else None  # (Fs*T,) int8 dequant scales
        # device-persistent incremental exclusion (same protocol as the
        # single-chip query_program_incr): new GLOBAL frame ordinals map to
        # this shard's local slots (-1 padding / out-of-shard -> scratch)
        local = new_ids - frame_offset[0, 0]
        local = jnp.where((new_ids >= 0) & (local >= 0) & (local < Fs),
                          local, -1)
        exc = frame_scoring.apply_new_exclusions(excluded[0], local)
        scores = frame_scoring.scoring_matvec(V[0], qvec, rs)
        if qvec2 is not None:
            scores = scores - frame_scoring.scoring_matvec(V[0], qvec2, rs)
        s_ft = jnp.where(valid[0], scores.reshape(Fs, -1), -jnp.inf)
        fmax = jnp.max(s_ft, axis=1)
        fmax = jnp.where(exc, -jnp.inf, fmax)

        # global shortlist cutoff: the k_global-th best (raw frame score,
        # global id) pair under top_k's ordering (score desc, id asc). Ties
        # at the cutoff score are broken by global id exactly as the
        # single-device lax.top_k does, so the sharded shortlist EQUALS the
        # single-device shortlist even on exact f32 ties (e.g. duplicate
        # images at the boundary). Every global-top-k_global frame is inside
        # its shard's local top-shortlist_local under the same ordering
        # (shard contribution <= min(k_global, Fs) <= shortlist_local), so
        # the gathered candidate set always contains the true cutoff pair.
        loc_scores, loc_idx = jax.lax.top_k(fmax, shortlist_local)
        loc_gids = loc_idx.astype(jnp.int32) + frame_offset[0, 0]
        all_scores = jax.lax.all_gather(loc_scores, "data", tiled=True)
        all_gids = jax.lax.all_gather(loc_gids, "data", tiled=True)
        neg_sorted, gid_sorted = jax.lax.sort(
            (-all_scores, all_gids), num_keys=2
        )
        cut_s = -neg_sorted[k_global - 1]
        cut_id = gid_sorted[k_global - 1]
        gid_local = (
            jnp.arange(Fs, dtype=jnp.int32) + frame_offset[0, 0]
        )
        keep = (fmax > cut_s) | ((fmax == cut_s) & (gid_local <= cut_id))
        excl_eff = exc | ~keep

        res = frame_scoring.rank_frames_from_scores(
            scores, valid[0], boxes[0], zoom[0], excl_eff,
            shortlist_size=shortlist_local,
            topk=topk_local,
            aug_larger=aug_larger,
            aug_weight=aug_weight,
            agg_method=agg_method,
            max_zoom=max_zoom,
        )
        ok = res.frame_ids >= 0
        gfids = jnp.where(ok, res.frame_ids + frame_offset[0, 0], -1)
        return (
            gfids[None], res.frame_scores[None],
            res.act_boxes[None], res.act_scores[None], exc[None],
        )

    spec = P("data")
    args = (V, valid, boxes, zoom, frame_offset, excluded)
    if row_scale is not None:
        args = args + (row_scale,)
    gfids, scores, act_boxes, act_scores, new_mask = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec,) * len(args),
        out_specs=spec,
        check_rep=False,
    )(*args)

    # merge (S, k) per-shard candidates — replicated tiny arrays
    flat_scores = scores.reshape(-1)
    top_scores, pos = jax.lax.top_k(flat_scores, min(topk, flat_scores.shape[0]))
    keep = top_scores > -jnp.inf
    return (
        jnp.where(keep, gfids.reshape(-1)[pos], -1),
        top_scores,
        act_boxes.reshape(-1, 4)[pos],
        act_scores.reshape(-1)[pos],
        keep.sum(),
        new_mask,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "shortlist_size", "topk",
        "aug_larger", "aug_weight", "agg_method", "max_zoom",
    ),
)
def _sharded_query_batch(
    V, valid, boxes, zoom, frame_offset, qvecs, excluded, new_ids, row_scale,
    *,
    mesh: Mesh,
    shortlist_size: int,
    topk: int,
    aug_larger: str,
    aug_weight: str,
    agg_method: str,
    max_zoom: int,
):
    """Q-query variant of `_sharded_query`: the per-shard scan becomes one
    (N_local, D) @ (D, Q) MXU matmul (matrix HBM read amortized over all Q
    concurrent sessions, exactly like the single-chip
    `ops.frame_scoring.query_program_batch`), the per-query global-cutoff /
    ranking tail is vmapped, and the (S, Q, k) candidate merge stays exact.
    `excluded` is (S, Q, Fs) sharded over the leading axis; `qvecs` (Q, D)
    is replicated. Batched results equal Q solo sharded queries
    (tests/test_batch_query.py)."""
    Fs = valid.shape[1]
    topk_local = min(topk, Fs)
    shortlist_local = min(shortlist_size, Fs)
    S = mesh.shape["data"]
    k_global = min(shortlist_size, S * shortlist_local)

    def per_shard(V, valid, boxes, zoom, frame_offset, excluded, *rs):
        rs = rs[0][0] if rs else None  # (Fs*T,) int8 dequant scales
        # per-session incremental exclusion: each query's new GLOBAL frame
        # ordinals map to this shard's local slots
        local = new_ids - frame_offset[0, 0]  # (Q, M)
        local = jnp.where((new_ids >= 0) & (local >= 0) & (local < Fs),
                          local, -1)
        exc = jax.vmap(frame_scoring.apply_new_exclusions)(excluded[0], local)
        scores_nq = frame_scoring.scoring_matmat(V[0], qvecs, rs)  # (Fs*T, Q)
        T = valid.shape[2]
        s_qft = jnp.where(
            valid[0][None], scores_nq.T.reshape(qvecs.shape[0], Fs, T), -jnp.inf
        )
        fmax = jnp.max(s_qft, axis=2)  # (Q, Fs)
        fmax = jnp.where(exc, -jnp.inf, fmax)

        # per-query global shortlist cutoff with top_k's exact tie order
        loc_scores, loc_idx = jax.lax.top_k(fmax, shortlist_local)  # (Q, k)
        loc_gids = loc_idx.astype(jnp.int32) + frame_offset[0, 0]
        all_scores = jax.lax.all_gather(loc_scores, "data", axis=1, tiled=True)
        all_gids = jax.lax.all_gather(loc_gids, "data", axis=1, tiled=True)

        def cutoff_one(ls, lg):
            neg_sorted, gid_sorted = jax.lax.sort((-ls, lg), num_keys=2)
            return -neg_sorted[k_global - 1], gid_sorted[k_global - 1]

        cut_s, cut_id = jax.vmap(cutoff_one)(all_scores, all_gids)  # (Q,)
        gid_local = jnp.arange(Fs, dtype=jnp.int32) + frame_offset[0, 0]
        keep = (fmax > cut_s[:, None]) | (
            (fmax == cut_s[:, None]) & (gid_local[None, :] <= cut_id[:, None])
        )
        excl_eff = exc | ~keep  # (Q, Fs)

        res = jax.vmap(
            lambda sc, ex: frame_scoring.rank_frames_from_scores(
                sc, valid[0], boxes[0], zoom[0], ex,
                shortlist_size=shortlist_local,
                topk=topk_local,
                aug_larger=aug_larger,
                aug_weight=aug_weight,
                agg_method=agg_method,
                max_zoom=max_zoom,
            )
        )(scores_nq.T, excl_eff)
        ok = res.frame_ids >= 0
        gfids = jnp.where(ok, res.frame_ids + frame_offset[0, 0], -1)
        return (
            gfids[None], res.frame_scores[None],
            res.act_boxes[None], res.act_scores[None], exc[None],
        )

    spec = P("data")
    args = (V, valid, boxes, zoom, frame_offset, excluded)
    if row_scale is not None:
        args = args + (row_scale,)
    gfids, scores, act_boxes, act_scores, new_mask = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec,) * len(args),
        out_specs=spec,
        check_rep=False,
    )(*args)

    # (S, Q, k) -> per-query merge over the S*k candidates
    Q = qvecs.shape[0]
    k = gfids.shape[2]
    flat_scores = jnp.transpose(scores, (1, 0, 2)).reshape(Q, S * k)
    flat_gfids = jnp.transpose(gfids, (1, 0, 2)).reshape(Q, S * k)
    flat_boxes = jnp.transpose(act_boxes, (1, 0, 2, 3)).reshape(Q, S * k, 4)
    flat_act = jnp.transpose(act_scores, (1, 0, 2)).reshape(Q, S * k)
    top_scores, pos = jax.lax.top_k(flat_scores, min(topk, S * k))
    keep = top_scores > -jnp.inf
    qi = jnp.arange(Q)[:, None]
    return (
        jnp.where(keep, flat_gfids[qi, pos], -1),
        top_scores,
        flat_boxes[qi, pos],
        flat_act[qi, pos],
        keep.sum(axis=1),
        new_mask,
    )


def sharded_query_topk_batch(
    idx: ShardedFrameIndex,
    qvecs: np.ndarray,  # (Q, D)
    excluded_global: np.ndarray,  # (Q, F_total) bool
    *,
    topk: int,
    shortlist_size: int | None = None,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
):
    """Batched multi-query entry for the sharded index from host masks
    (one-shot callers; the coalescer uses `sharded_query_topk_batch_incr`).
    Returns a list of per-query (dbidxs, frame_scores, act_boxes,
    act_scores) tuples, each equal to the solo `sharded_query_topk`
    result."""
    qvecs = np.asarray(qvecs, np.float32)
    Q = qvecs.shape[0]

    S = idx.n_shards
    Fs = idx.n_frames_local
    F = idx.n_frames
    exc = np.ones((Q, S * Fs), dtype=bool)
    exc[:, :F] = excluded_global
    exc = np.ascontiguousarray(exc.reshape(Q, S, Fs).transpose(1, 0, 2))

    sharding = NamedSharding(idx.mesh, P("data"))
    exc_dev = jax.device_put(jnp.asarray(exc), sharding)

    out, _ = sharded_query_topk_batch_incr(
        idx, qvecs, exc_dev,
        jnp.full((Q, 1), -1, jnp.int32),
        topk=topk, shortlist_size=shortlist_size,
        aug_larger=aug_larger, aug_weight=aug_weight,
        agg_method=agg_method,
    )
    return out


def sharded_query_topk_batch_incr(
    idx: ShardedFrameIndex,
    qvecs: np.ndarray,  # (Q, D)
    excluded_dev: jax.Array,  # (S, Q, Fs) bool, P('data')-sharded
    new_ids: jnp.ndarray,  # (Q, M) int32 GLOBAL frame ordinals, -1 padded
    *,
    topk: int,
    shortlist_size: int | None = None,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
):
    """Coalesced multi-query with per-session device-persistent masks: each
    query's (S, Fs) mask rides in stacked on axis 1 and only its per-click
    delta ordinals upload. Returns (per-query result tuples, (S, Q, Fs)
    updated masks — commit row [:, q, :] back to session q's entry)."""
    if shortlist_size is None:
        shortlist_size = topk
    qvecs = np.asarray(qvecs, np.float32)
    Q = qvecs.shape[0]

    gfids, scores, boxes, act_scores, n_valid, new_mask = (
        _sharded_query_batch(
            idx.V, idx.valid, idx.boxes, idx.zoom, idx.frame_offset,
            jnp.asarray(qvecs), excluded_dev, jnp.asarray(new_ids),
            idx.row_scale,
            mesh=idx.mesh,
            shortlist_size=shortlist_size,
            topk=topk,
            aug_larger=aug_larger,
            aug_weight=aug_weight,
            agg_method=agg_method,
            max_zoom=idx.max_zoom,
        )
    )
    gfids = np.asarray(gfids)
    scores = np.asarray(scores)
    boxes = np.asarray(boxes)
    act_scores = np.asarray(act_scores)
    n_valid = np.asarray(n_valid)
    out = []
    for q in range(Q):
        n = int(n_valid[q])
        fids = gfids[q, :n]
        out.append((
            idx.frame_dbidx[fids], scores[q, :n], boxes[q, :n],
            act_scores[q, :n],
        ))
    return out, new_mask


def sharded_query_topk_incr(
    idx: ShardedFrameIndex,
    qvec: np.ndarray,
    excluded_dev: jax.Array,  # (S, Fs) bool, P('data')-sharded, persistent
    new_ids: jnp.ndarray,  # (M,) int32 GLOBAL frame ordinals, -1 padded
    *,
    topk: int,
    shortlist_size: int | None = None,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    qvec2: np.ndarray | None = None,  # subtracted (discount) query
):
    """`sharded_query_topk` with the device-persistent incremental exclusion
    protocol: the (S, Fs) mask stays resident across clicks and only the
    handful of newly-excluded frame ordinals ride in — the sharded
    counterpart of the single-chip `query_program_incr` (at 10M frames the
    per-click host mask rebuild + upload this replaces costs more than the
    scan itself through a dev tunnel). Returns (dbidxs, frame_scores,
    act_boxes, act_scores, new_mask)."""
    if shortlist_size is None:
        shortlist_size = topk

    gfids, scores, boxes, act_scores, n_valid, new_mask = _sharded_query(
        idx.V, idx.valid, idx.boxes, idx.zoom, idx.frame_offset,
        jnp.asarray(np.asarray(qvec, np.float32).reshape(-1)),
        (jnp.asarray(np.asarray(qvec2, np.float32).reshape(-1))
         if qvec2 is not None else None),
        excluded_dev, new_ids, idx.row_scale,
        mesh=idx.mesh,
        shortlist_size=shortlist_size,
        topk=topk,
        aug_larger=aug_larger,
        aug_weight=aug_weight,
        agg_method=agg_method,
        max_zoom=idx.max_zoom,
    )
    n = int(n_valid)
    fids = np.asarray(gfids)[:n]
    return (
        idx.frame_dbidx[fids],
        np.asarray(scores)[:n],
        np.asarray(boxes)[:n],
        np.asarray(act_scores)[:n],
        new_mask,
    )


def sharded_query_topk(
    idx: ShardedFrameIndex,
    qvec: np.ndarray,
    excluded_global: np.ndarray,  # (F_total,) bool
    *,
    topk: int,
    shortlist_size: int | None = None,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    qvec2: np.ndarray | None = None,  # subtracted (discount) query
):
    """Query the sharded index from a host exclusion mask (one-shot callers;
    the serving path uses `sharded_query_topk_incr`). Returns (dbidxs,
    frame_scores, act_boxes, act_scores) truncated to valid rows."""
    out = sharded_query_topk_incr(
        idx, qvec, idx.shard_mask(np.asarray(excluded_global)),
        jnp.full(1, -1, jnp.int32),
        topk=topk, shortlist_size=shortlist_size,
        aug_larger=aug_larger, aug_weight=aug_weight,
        agg_method=agg_method, qvec2=qvec2,
    )
    return out[:4]


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "shortlist_size", "topk",
        "aug_larger", "aug_weight", "agg_method", "max_zoom",
    ),
)
def _sharded_rank_scores(
    tile_scores, valid, boxes, zoom, frame_offset, excluded,
    *,
    mesh: Mesh,
    shortlist_size: int,
    topk: int,
    aug_larger: str,
    aug_weight: str,
    agg_method: str,
    max_zoom: int,
):
    """Rank frames by EXTERNAL per-tile scores over the sharded index — the
    KnnProp2 serving round's ranking tail (single-chip analogue:
    MultiscaleIndex.rank_by_scores) with the same global-shortlist-cutoff
    protocol as `_sharded_query`."""
    Fs = valid.shape[1]
    topk_local = min(topk, Fs)
    shortlist_local = min(shortlist_size, Fs)
    S = mesh.shape["data"]
    k_global = min(shortlist_size, S * shortlist_local)

    def per_shard(tile_scores, valid, boxes, zoom, frame_offset, excluded):
        scores = tile_scores[0]
        exc = excluded[0]
        s_ft = jnp.where(valid[0], scores.reshape(Fs, -1), -jnp.inf)
        fmax = jnp.max(s_ft, axis=1)
        fmax = jnp.where(exc, -jnp.inf, fmax)

        # global shortlist cutoff (see _sharded_query for the tie protocol)
        loc_scores, loc_idx = jax.lax.top_k(fmax, shortlist_local)
        loc_gids = loc_idx.astype(jnp.int32) + frame_offset[0, 0]
        all_scores = jax.lax.all_gather(loc_scores, "data", tiled=True)
        all_gids = jax.lax.all_gather(loc_gids, "data", tiled=True)
        neg_sorted, gid_sorted = jax.lax.sort(
            (-all_scores, all_gids), num_keys=2
        )
        cut_s = -neg_sorted[k_global - 1]
        cut_id = gid_sorted[k_global - 1]
        gid_local = jnp.arange(Fs, dtype=jnp.int32) + frame_offset[0, 0]
        keep = (fmax > cut_s) | ((fmax == cut_s) & (gid_local <= cut_id))
        excl_eff = exc | ~keep

        res = frame_scoring.rank_frames_from_scores(
            scores, valid[0], boxes[0], zoom[0], excl_eff,
            shortlist_size=shortlist_local,
            topk=topk_local,
            aug_larger=aug_larger,
            aug_weight=aug_weight,
            agg_method=agg_method,
            max_zoom=max_zoom,
        )
        ok = res.frame_ids >= 0
        gfids = jnp.where(ok, res.frame_ids + frame_offset[0, 0], -1)
        return (
            gfids[None], res.frame_scores[None],
            res.act_boxes[None], res.act_scores[None],
        )

    spec = P("data")
    gfids, scores, act_boxes, act_scores = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=spec,
        check_rep=False,
    )(tile_scores, valid, boxes, zoom, frame_offset, excluded)

    flat_scores = scores.reshape(-1)
    top_scores, pos = jax.lax.top_k(flat_scores, min(topk, flat_scores.shape[0]))
    keep = top_scores > -jnp.inf
    return (
        jnp.where(keep, gfids.reshape(-1)[pos], -1),
        top_scores,
        act_boxes.reshape(-1, 4)[pos],
        act_scores.reshape(-1)[pos],
        keep.sum(),
    )


def sharded_rank_by_scores(
    idx: ShardedFrameIndex,
    tile_scores,
    excluded_global: np.ndarray,  # (F_total,) bool
    *,
    topk: int,
    shortlist_size: int | None = None,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
):
    """KnnProp2-style serving rank over the mesh: per-tile scores (e.g. a
    sharded label-propagation result, meta row order) -> distinct-frame
    shortlist -> augmentation -> merged global top-k. Returns (dbidxs,
    frame_scores, act_boxes, act_scores). Reference: the single-chip
    `MultiscaleIndex.rank_by_scores` serving `loops/graph_based.py:88-109`."""
    if shortlist_size is None or shortlist_size < topk:
        shortlist_size = max(topk * 5, shortlist_size or 0)
    shortlist_size = min(shortlist_size, idx.n_frames)
    scores_dev = (
        tile_scores if isinstance(tile_scores, jax.Array)
        and tile_scores.ndim == 2
        else idx.shard_tile_scores(np.asarray(tile_scores))
    )
    gfids, scores, boxes, act_scores, n_valid = _sharded_rank_scores(
        scores_dev, idx.valid, idx.boxes, idx.zoom, idx.frame_offset,
        idx.shard_mask(np.asarray(excluded_global)),
        mesh=idx.mesh,
        shortlist_size=shortlist_size,
        topk=topk,
        aug_larger=aug_larger,
        aug_weight=aug_weight,
        agg_method=agg_method,
        max_zoom=idx.max_zoom,
    )
    n = int(n_valid)
    fids = np.asarray(gfids)[:n]
    return (
        idx.frame_dbidx[fids],
        np.asarray(scores)[:n],
        np.asarray(boxes)[:n],
        np.asarray(act_scores)[:n],
    )
