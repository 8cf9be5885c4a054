"""Golden tests: device query program vs a pandas oracle of the reference
`score_frame2`/`rescore_candidates` semantics (multiscale_index.py:112-150,
379-403), written independently from the spec."""
import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from seesaw_tpu.box_utils import box_iou
from seesaw_tpu.indices.meta import VectorMeta
from seesaw_tpu.ops import frame_scoring as fs


def padded_args(meta, V, T=16):
    """(vectors, valid, boxes, zoom) in frame-major padded layout."""
    rows, valid = meta.padded_rows(T)
    fr = rows.reshape(-1)
    fv = valid.reshape(-1)
    Vp = V[fr].copy()
    Vp[~fv] = 0
    return (jnp.array(Vp), jnp.array(valid), jnp.array(meta.boxes[fr]),
            jnp.array(meta.zoom_level[fr]))


# ---------------------------------------------------------------- oracle ---
def oracle_augment(df: pd.DataFrame, *, aug_larger, aug_weight, agg_method):
    """Per-tile augmented scores for one frame, pandas-style (spec oracle)."""
    if agg_method == "plain_score":
        return df.score.values.copy()
    # float32 to match device precision — IoU ties must break identically
    b = df[["x1", "y1", "x2", "y2"]].values.astype(np.float32)
    ious, cont = box_iou(b, b, return_containment=True)
    pairs = []
    for i in range(len(df)):
        for j in range(len(df)):
            if ious[i, j] <= 0:
                continue
            zi, zj = df.zoom_level.values[i], df.zoom_level.values[j]
            if aug_larger == "greater" and not (zj >= zi):
                continue
            if aug_larger == "adjacent" and not (zj == zi):
                continue
            pairs.append((i, j, ious[i, j], cont[i, j], zj, df.score.values[j]))
    jdf = pd.DataFrame(pairs, columns=["il", "jr", "iou", "cont", "zlr", "score_r"])
    out = np.full(len(df), np.nan)
    if aug_weight == "level_max":
        idxmaxes = jdf.groupby(["il", "zlr"]).iou.idxmax()
        max_only = jdf.loc[idxmaxes.values]
        per_i = max_only.groupby("il").score_r.mean()
        out[per_i.index.values.astype(int)] = per_i.values
    else:  # cont_weighted
        from scipy.special import softmax

        for i, gp in jdf.groupby("il"):
            w = softmax(gp.cont.values)
            out[int(i)] = w @ gp.score_r.values
    return out


def make_frame(rng, ntiles, nlevels=3, img=256):
    rows = []
    for _ in range(ntiles):
        zl = int(rng.integers(1, nlevels + 1))
        size = 32 * (2 ** (zl - 1))
        x1 = float(rng.uniform(0, img - size))
        y1 = float(rng.uniform(0, img - size))
        rows.append(dict(x1=x1, y1=y1, x2=x1 + size, y2=y1 + size,
                         zoom_level=zl, score=float(rng.normal())))
    return pd.DataFrame(rows)


MODES = [
    ("all", "level_max", "avg_score"),
    ("greater", "level_max", "avg_score"),
    ("adjacent", "level_max", "avg_score"),
    ("all", "cont_weighted", "avg_score"),
    ("all", "level_max", "plain_score"),
]


@pytest.mark.parametrize("aug_larger,aug_weight,agg_method", MODES)
def test_augment_matches_oracle(aug_larger, aug_weight, agg_method):
    rng = np.random.default_rng(7)
    for trial in range(8):
        df = make_frame(rng, ntiles=int(rng.integers(1, 14)))
        T = 16  # padded
        pad = T - len(df)
        boxes = np.pad(df[["x1", "y1", "x2", "y2"]].values.astype(np.float32),
                       ((0, pad), (0, 0)))
        zoom = np.pad(df.zoom_level.values.astype(np.int32), (0, pad))
        scores = np.pad(df.score.values.astype(np.float32), (0, pad))
        valid = np.arange(T) < len(df)

        got = np.asarray(
            fs.augment_tile_scores(
                jnp.array(boxes), jnp.array(zoom), jnp.array(scores),
                jnp.array(valid),
                aug_larger=aug_larger, aug_weight=aug_weight,
                agg_method=agg_method, max_zoom=4,
            )
        )
        want = oracle_augment(df, aug_larger=aug_larger, aug_weight=aug_weight,
                              agg_method=agg_method)
        got_valid = got[: len(df)]
        np.testing.assert_allclose(got_valid, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"trial {trial}")
        assert (got[len(df):] == -np.inf).all()


def _build_db(rng, n_frames=12, max_tiles=10, d=16):
    metas = []
    all_dbidx, all_zoom, all_boxes = [], [], []
    for f in range(n_frames):
        df = make_frame(rng, ntiles=int(rng.integers(1, max_tiles)))
        all_dbidx += [f * 3] * len(df)  # sparse dbidx values
        all_zoom += df.zoom_level.tolist()
        all_boxes.append(df[["x1", "y1", "x2", "y2"]].values)
        metas.append(df)
    meta, order = VectorMeta.from_arrays(
        np.array(all_dbidx), np.array(all_zoom), np.concatenate(all_boxes)
    )
    V = rng.normal(size=(meta.n_vectors, d)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return meta, V, metas


def test_query_program_matches_oracle_end_to_end():
    rng = np.random.default_rng(3)
    meta, V, frame_dfs = _build_db(rng)
    q = rng.normal(size=V.shape[1]).astype(np.float32)
    q /= np.linalg.norm(q)

    excluded_frames = {1, 4}
    excluded = np.zeros(meta.n_frames, dtype=bool)
    excluded[list(excluded_frames)] = True

    res = fs.query_program(
        *padded_args(meta, V),
        jnp.array(q), None, jnp.array(excluded),
        shortlist_size=8, topk=3,
        aug_larger="all", aug_weight="level_max",
        agg_method="avg_score", max_zoom=4,
    )

    # oracle: score all vectors, pick top-8 distinct frames by max tile
    # score excluding excluded, augment each frame, final top-3
    scores = V @ q
    fmax = np.full(meta.n_frames, -np.inf)
    np.maximum.at(fmax, meta.frame_id, scores)
    fmax[excluded] = -np.inf
    short = np.argsort(-fmax)[:8]
    frame_scores = {}
    for f in short:
        lo, hi = meta.frame_starts[f], meta.frame_starts[f + 1]
        df = pd.DataFrame(dict(
            x1=meta.boxes[lo:hi, 0], y1=meta.boxes[lo:hi, 1],
            x2=meta.boxes[lo:hi, 2], y2=meta.boxes[lo:hi, 3],
            zoom_level=meta.zoom_level[lo:hi], score=scores[lo:hi],
        ))
        aug = oracle_augment(df, aug_larger="all", aug_weight="level_max",
                             agg_method="avg_score")
        frame_scores[f] = np.nanmax(aug)
    want_order = sorted(frame_scores, key=lambda f: -frame_scores[f])[:3]

    got_fids = np.asarray(res.frame_ids)[: int(res.n_valid)]
    assert got_fids.tolist() == want_order
    for rank, f in enumerate(want_order):
        assert np.asarray(res.frame_scores)[rank] == pytest.approx(
            frame_scores[f], rel=1e-5
        )
    # excluded frames never show up
    assert not (set(got_fids.tolist()) & excluded_frames)


def test_query_program_vector2_discount():
    rng = np.random.default_rng(5)
    meta, V, _ = _build_db(rng, n_frames=6)
    q = rng.normal(size=V.shape[1]).astype(np.float32)
    q2 = rng.normal(size=V.shape[1]).astype(np.float32)
    excluded = np.zeros(meta.n_frames, dtype=bool)
    res = fs.query_program(
        *padded_args(meta, V),
        jnp.array(q), jnp.array(q2), jnp.array(excluded),
        shortlist_size=6, topk=2,
        agg_method="plain_score", max_zoom=4,
    )
    scores = V @ q - V @ q2
    fmax = np.full(meta.n_frames, -np.inf)
    np.maximum.at(fmax, meta.frame_id, scores)
    want = np.argsort(-fmax)[:2]
    assert np.asarray(res.frame_ids).tolist() == want.tolist()


def test_exclusion_exhausts_cleanly():
    rng = np.random.default_rng(11)
    meta, V, _ = _build_db(rng, n_frames=4)
    q = rng.normal(size=V.shape[1]).astype(np.float32)
    excluded = np.ones(meta.n_frames, dtype=bool)
    excluded[2] = False
    res = fs.query_program(
        *padded_args(meta, V),
        jnp.array(q), None, jnp.array(excluded),
        shortlist_size=4, topk=3, max_zoom=4,
    )
    assert int(res.n_valid) == 1
    assert np.asarray(res.frame_ids).tolist()[:1] == [2]
    assert np.asarray(res.frame_ids)[1:].tolist() == [-1, -1]
