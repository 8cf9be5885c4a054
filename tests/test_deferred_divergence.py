"""A diverged FUSED fit must fail the round WITHOUT publishing any state.

The host paths raise ValueError before the query runs
(`learners/logistic_regression.py`, `learners/multi_reg.py`); the fused
one-dispatch paths (`MultiscaleIndex._query_logistic/_query_multireg`) must
match: no exclusion-mask commit, no polluted returned-set, and the next
round works normally."""
import numpy as np
import pytest

from seesaw_tpu.indices.meta import VectorMeta
from seesaw_tpu.indices.multiscale import MultiscaleIndex
from seesaw_tpu.learners import LogisticRegression
from seesaw_tpu.learners.multi_reg import RegFit
from seesaw_tpu.runtime.bitmap import BitMap


def _db(n_frames=50, tiles=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    dbidx = np.repeat(np.arange(n_frames), tiles)
    zoom = np.tile(np.array([1, 1, 2, 2])[:tiles], n_frames)
    xy = rng.uniform(0, 100, size=(n_frames * tiles, 2)).astype(np.float32)
    wh = rng.uniform(20, 60, size=(n_frames * tiles, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    meta, order = VectorMeta.from_arrays(dbidx, zoom, boxes)
    V = rng.normal(size=(n_frames * tiles, d)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return V[order], meta


def _labeled(meta, rng):
    rows = rng.choice(meta.n_vectors, size=24, replace=False)
    ys = (np.arange(24) % 2).astype(np.float32)
    return rows, ys


def _poisoned_logistic(idx, rows, ys, tvec):
    m = LogisticRegression(
        regularizer_vector=tvec, class_weights="balanced", scale="centered",
        reg_lambda=5.0, fit_intercept=False, max_iter=50,
    )
    dv = m.deferred_fit_rows(idx, rows, ys)
    dv.params0 = np.full_like(dv.params0, np.nan)  # f0 -> nan -> diverged
    return dv


def _poisoned_multireg(idx, rows, ys, qvec, d):
    m = RegFit(
        xlx=(np.eye(d) * 1e-3).astype(np.float32), qvec=qvec,
        label_loss_type="ce_loss", rank_loss_margin=0.0,
        pos_weight="balanced", reg_data_lambda=0.1, reg_norm_lambda=10.0,
        reg_query_lambda=1.0, max_iter=50,
    )
    dv = m.deferred_fit_rows(idx, rows, ys)
    dv.qvec_hat = np.full_like(dv.qvec_hat, np.nan)  # x0 -> nan -> diverged
    return dv


@pytest.mark.parametrize("kind", ["logistic", "multireg"])
def test_diverged_fused_fit_leaves_state_clean(kind):
    V, meta = _db()
    idx = MultiscaleIndex(vectors=V, meta=meta)
    ctrl = MultiscaleIndex(vectors=V, meta=meta)  # never sees the failure
    rng = np.random.default_rng(1)
    d = V.shape[1]
    tvec = rng.normal(size=d).astype(np.float32)
    tvec /= np.linalg.norm(tvec)
    rows, ys = _labeled(meta, rng)

    # round 1: a normal query commits incremental exclusion state
    excl = BitMap(rng.choice(meta.frame_dbidx, size=5, replace=False))
    r1 = idx.query(vector=tvec, topk=6, shortlist_size=20, exclude=excl)
    ctrl.query(vector=tvec, topk=6, shortlist_size=20, exclude=excl)
    for db in r1["dbidxs"]:
        excl.add(int(db))

    if kind == "logistic":
        dv = _poisoned_logistic(idx, rows, ys, tvec)
    else:
        dv = _poisoned_multireg(idx, rows, ys, tvec, d)

    entry = idx._excl_entries[id(excl)]
    prev_before = entry.prev
    prev_copy = prev_before.copy()
    with pytest.raises(ValueError, match="diverged"):
        idx.query(vector=dv, topk=6, shortlist_size=20, exclude=excl)

    # no state was published by the failed round
    entry_after = idx._excl_entries[id(excl)]
    assert entry_after is entry and entry_after.prev is prev_before
    assert entry_after.prev == prev_copy

    # the next normal round matches an index that never saw the failure
    got = idx.query(vector=tvec, topk=6, shortlist_size=20, exclude=excl)
    want = ctrl.query(vector=tvec, topk=6, shortlist_size=20, exclude=excl)
    assert list(got["dbidxs"]) == list(want["dbidxs"])
    # excluded/seen frames never resurface
    assert not (set(int(x) for x in got["dbidxs"]) & set(excl.to_array()))
