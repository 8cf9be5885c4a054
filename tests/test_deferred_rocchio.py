"""One-dispatch Rocchio round: DeferredRocchio through MultiscaleIndex.query
must equal the two-dispatch host path (sum_vectors_for_rows + query) on
every storage dtype, and the resolved qvec must ride back in the result."""
import numpy as np
import pytest

from seesaw_tpu.indices.meta import VectorMeta
from seesaw_tpu.indices.multiscale import MultiscaleIndex
from seesaw_tpu.ops.frame_scoring import DeferredRocchio
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


@pytest.mark.parametrize("device_dtype", ["float32", "int8"])
def test_deferred_equals_host_path(device_dtype):
    V, meta = _db()
    idx = MultiscaleIndex(vectors=V, meta=meta, device_dtype=device_dtype)
    assert idx.supports_deferred_query
    rng = np.random.default_rng(1)
    q0 = rng.normal(size=V.shape[1]).astype(np.float32)
    rows = rng.choice(meta.n_vectors, size=24, replace=False)
    ys = rng.integers(0, 2, size=24)
    dv = DeferredRocchio(q0, rows[ys > 0], rows[ys == 0], 1.0, 0.7, 0.3)

    excl = BitMap(rng.choice(meta.frame_dbidx, size=5, replace=False))
    got = idx.query(vector=dv, topk=6, shortlist_size=20,
                    exclude=BitMap(excl.to_array()))
    # expected q from the DEVICE matrix's semantics (int8 class means sum
    # the dequantized stored rows, not the exact f32 host mirror)
    prows = idx.padded_row_ids(np.arange(meta.n_vectors))
    Vdev = np.asarray(idx._V)[prows].astype(np.float32)
    if idx._row_scale is not None:
        Vdev = Vdev * np.asarray(idx._row_scale)[prows][:, None]
    pos, neg = rows[ys > 0], rows[ys == 0]
    mean = lambda r: (Vdev[r].sum(axis=0) / max(len(r), 1)).astype(np.float32)
    host_q = (1.0 * q0 + 0.7 * mean(pos) - 0.3 * mean(neg)).astype(np.float32)
    want = idx.query(vector=host_q, topk=6, shortlist_size=20,
                     exclude=BitMap(excl.to_array()))
    assert list(got["dbidxs"]) == list(want["dbidxs"])
    np.testing.assert_allclose(
        [a["score"] for a in got["activations"]],
        [a["score"] for a in want["activations"]], rtol=1e-4,
    )
    np.testing.assert_allclose(got["qvec"], host_q, rtol=1e-4, atol=1e-5)
    # on exact-f32 storage the host materialization is identical too
    if device_dtype == "float32":
        np.testing.assert_allclose(
            dv.materialize(idx), host_q, rtol=1e-5, atol=1e-6
        )


def test_deferred_one_sided_and_empty_labels():
    V, meta = _db(seed=3)
    idx = MultiscaleIndex(vectors=V, meta=meta)
    rng = np.random.default_rng(2)
    q0 = rng.normal(size=V.shape[1]).astype(np.float32)
    for pos, neg in (
        (np.arange(5), np.empty(0, np.int64)),
        (np.empty(0, np.int64), np.arange(7)),
        (np.empty(0, np.int64), np.empty(0, np.int64)),
    ):
        dv = DeferredRocchio(q0, pos, neg, 1.0, 0.7, 0.3)
        got = idx.query(vector=dv, topk=5, shortlist_size=15)
        want = idx.query(vector=dv.materialize(idx), topk=5, shortlist_size=15)
        assert list(got["dbidxs"]) == list(want["dbidxs"])


def test_rocchio_session_uses_one_dispatch(tmp_path):
    """The rocchio loop on a device-resident index defers refine into the
    query; per-round results equal the host formulation, and curr_vec is a
    concrete host vector again after next() (state consumers)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from synth import build_synthetic_root, QSTR

    from seesaw_tpu.basic_types import Box, IndexSpec, SessionParams
    from seesaw_tpu.dataset import GlobalDataManager
    from seesaw_tpu.session import make_session

    build_synthetic_root(str(tmp_path), dataset_name="defroc")
    gdm = GlobalDataManager(str(tmp_path))
    p = SessionParams(
        index_spec=IndexSpec(d_name="defroc", i_name="multiscale"),
        interactive="rocchio_update", batch_size=3, shortlist_size=20,
        interactive_options=dict(
            rocchio_alpha=1.0, rocchio_beta=0.7, rocchio_gamma=0.3
        ),
    )
    s = make_session(gdm, p)["session"]
    s.set_text(QSTR)
    for r in range(4):
        batch = [int(i) for i in s.next()]
        assert len(batch) == 3
        state = s.get_state()
        for j, imdata in enumerate(state.gdata[-1]):
            imdata.boxes = (
                [Box(x1=0.0, y1=0.0, x2=90.0, y2=90.0, marked_accepted=True)]
                if j == 0 else []
            )
        s.update_state(state)
        s.refine()
        from seesaw_tpu.ops.frame_scoring import DeferredRocchio

        assert isinstance(s.loop.curr_vec, DeferredRocchio)
    s.next()
    assert isinstance(s.loop.curr_vec, np.ndarray)


@pytest.mark.parametrize("device_dtype", ["float32", "int8"])
def test_deferred_logistic_equals_fit_rows(device_dtype):
    """DeferredLogistic through query == fit_rows + query over get_coeff."""
    from seesaw_tpu.learners import LogisticRegression

    V, meta = _db(seed=5)
    idx = MultiscaleIndex(vectors=V, meta=meta, device_dtype=device_dtype)
    rng = np.random.default_rng(6)
    tvec = rng.normal(size=V.shape[1]).astype(np.float32)
    tvec /= np.linalg.norm(tvec)
    rows = rng.choice(meta.n_vectors, size=30, replace=False)
    ys = rng.integers(0, 2, size=30).astype(np.float32)
    opts = dict(class_weights="balanced", scale="centered", reg_lambda=5.0,
                fit_intercept=False, max_iter=50)

    m1 = LogisticRegression(regularizer_vector=tvec, **opts)
    dv = m1.deferred_fit_rows(idx, rows, ys)
    got = idx.query(vector=dv, topk=6, shortlist_size=20)
    m1.apply_fit_result(got["fit"])

    # reference: the (device) fit_rows path on an index WITHOUT host mirror
    # semantics — drive _fit_ce_rows via fit_rows by hiding the mirror
    m2 = LogisticRegression(regularizer_vector=tvec, **opts)
    mirror = idx.vectors
    idx.vectors = None
    try:
        m2.fit_rows(idx, rows, ys)
    finally:
        idx.vectors = mirror
    np.testing.assert_allclose(m1.params_, m2.params_, rtol=2e-4, atol=2e-5)
    want = idx.query(vector=m2.get_coeff(), topk=6, shortlist_size=20)
    assert list(got["dbidxs"]) == list(want["dbidxs"])
    np.testing.assert_allclose(got["qvec"], m2.get_coeff(), rtol=2e-4, atol=2e-5)


def test_logreg2_session_one_dispatch(tmp_path):
    """A LogReg2 session on a device index defers the fit into the query and
    keeps warm starts (model params update from the fused payload)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from synth import build_synthetic_root, QSTR

    from seesaw_tpu.basic_types import Box, IndexSpec, SessionParams
    from seesaw_tpu.dataset import GlobalDataManager
    from seesaw_tpu.ops.frame_scoring import DeferredLogistic
    from seesaw_tpu.session import make_session

    build_synthetic_root(str(tmp_path), dataset_name="deflog")
    gdm = GlobalDataManager(str(tmp_path))
    p = SessionParams(
        index_spec=IndexSpec(d_name="deflog", i_name="multiscale"),
        interactive="log_reg2", batch_size=3, shortlist_size=20,
        interactive_options=dict(
            class_weights="balanced", scale="centered", reg_lambda=5.0,
            fit_intercept=False, max_iter=50,
        ),
    )
    s = make_session(gdm, p)["session"]
    s.set_text(QSTR)
    for r in range(5):
        batch = [int(i) for i in s.next()]
        assert len(batch) == 3
        state = s.get_state()
        for j, imdata in enumerate(state.gdata[-1]):
            imdata.boxes = (
                [Box(x1=0.0, y1=0.0, x2=90.0, y2=90.0, marked_accepted=True)]
                if (r + j) % 2 == 0 else []
            )
        s.update_state(state)
        s.refine()
        if s.loop.model is not None:
            assert isinstance(s.loop.curr_vec, DeferredLogistic)
    s.next()
    if s.loop.model is not None:
        assert s.loop.model.params_ is not None  # warm-start state flowed back
        assert isinstance(s.loop.curr_vec, np.ndarray)
    # no-repeat contract held
    seen = [im.dbidx for b in s.get_state().gdata for im in b]
    assert len(seen) == len(set(seen))


@pytest.mark.parametrize("device_dtype", ["float32", "int8"])
def test_deferred_multireg_equals_host_fit(device_dtype):
    """DeferredMultiReg through query == RegFit.fit on the same (device)
    rows + query over get_coeff."""
    from seesaw_tpu.learners.multi_reg import RegFit

    V, meta = _db(seed=8)
    idx = MultiscaleIndex(vectors=V, meta=meta, device_dtype=device_dtype)
    rng = np.random.default_rng(9)
    d = V.shape[1]
    qvec = rng.normal(size=d).astype(np.float32)
    rows = rng.choice(meta.n_vectors, size=28, replace=False)
    ys = rng.integers(0, 2, size=28).astype(np.float32)
    sw = rng.uniform(0.5, 1.0, size=28).astype(np.float32)
    xlx = (np.eye(d) * 1e-3).astype(np.float32)
    kw = dict(
        xlx=xlx, qvec=qvec, label_loss_type="ce_loss", rank_loss_margin=0.0,
        pos_weight="balanced", reg_data_lambda=0.1, reg_norm_lambda=10.0,
        reg_query_lambda=1.0, max_iter=50,
    )
    m1 = RegFit(**kw)
    dv = m1.deferred_fit_rows(idx, rows, ys, sw)
    got = idx.query(vector=dv, topk=6, shortlist_size=20)

    # host fit over the DEVICE rows' values (int8: dequantized)
    prows = idx.padded_row_ids(rows)
    X = np.asarray(idx._V)[prows].astype(np.float32)
    if idx._row_scale is not None:
        X = X * np.asarray(idx._row_scale)[prows][:, None]
    m2 = RegFit(**kw)
    m2.fit(X, ys, sw)
    np.testing.assert_allclose(got["qvec"], m2.get_coeff(),
                               rtol=5e-4, atol=5e-5)
    want = idx.query(vector=m2.get_coeff(), topk=6, shortlist_size=20)
    assert list(got["dbidxs"]) == list(want["dbidxs"])
