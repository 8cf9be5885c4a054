"""Device-persistent incremental exclusion mask (SURVEY §7 hard part).

The (F,) exclusion mask lives on device across clicks; per query only the
newly-excluded dbidxs ride into the fused program (ops.frame_scoring.
apply_new_exclusions). These tests pin the incremental path to the
full-rebuild oracle over evolving/shrinking/jumping exclusion sets, on both
the XLA and the Pallas (interpret) serving paths, and cover the
from_device_arrays host-mirror-free construction.
"""
import numpy as np
import pytest

from seesaw_tpu.indices.meta import VectorMeta
from seesaw_tpu.indices.multiscale import MultiscaleIndex
from seesaw_tpu.runtime.bitmap import BitMap


def _make_index(n_images=30, d=16, seed=0, **kw):
    rng = np.random.default_rng(seed)
    img = 224.0
    quads = [
        (0.0, 0.0, img / 2, img / 2),
        (img / 2, 0.0, img, img / 2),
        (0.0, img / 2, img / 2, img),
        (img / 2, img / 2, img, img),
    ]
    dbidx, zoom, boxes = [], [], []
    for i in range(n_images):
        tiles = [(1, q) for q in quads] + [(2, (0.0, 0.0, img, img))]
        for zl, bx in tiles[: int(rng.integers(2, 6))]:
            dbidx.append(i * 3)  # non-contiguous dbidxs
            zoom.append(zl)
            boxes.append(bx)
    meta, order = VectorMeta.from_arrays(
        np.array(dbidx), np.array(zoom), np.array(boxes, np.float32)
    )
    V = rng.normal(size=(meta.n_vectors, d)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return MultiscaleIndex(vectors=V, meta=meta, **kw), V, meta


def _query(idx, q, exclude, **kw):
    r = idx.query(vector=q, topk=4, shortlist_size=12, exclude=exclude, **kw)
    return list(r["dbidxs"]), [a["score"] for a in r["activations"]]


@pytest.mark.parametrize("use_pallas", [False, True])
def test_incremental_matches_full_rebuild(use_pallas):
    idx, V, meta = _make_index(use_pallas=use_pallas)
    oracle, _, _ = _make_index(use_pallas=False)
    rng = np.random.default_rng(1)
    q = rng.normal(size=V.shape[1]).astype(np.float32)

    returned = BitMap()  # ONE evolving bitmap, like InteractiveQuery.returned
    for round_ in range(6):
        got = _query(idx, q, returned)
        # oracle sees a FRESH BitMap each time -> always full rebuild
        want = _query(oracle, q, BitMap(returned.to_array()))
        assert got[0] == want[0], f"round {round_}: {got[0]} != {want[0]}"
        np.testing.assert_allclose(got[1], want[1], rtol=1e-5)
        returned.update(got[0][:2])  # exclude top-2, like a session batch


def test_shrinking_set_forces_rebuild():
    idx, V, meta = _make_index()
    rng = np.random.default_rng(2)
    q = rng.normal(size=V.shape[1]).astype(np.float32)

    returned = BitMap()
    first = _query(idx, q, returned)
    returned.update(first[0])
    second = _query(idx, q, returned)
    assert not set(second[0]) & set(first[0])

    # user un-labels an image: the set SHRINKS -> must fall back correctly
    removed = first[0][0]
    returned.discard(removed)
    third = _query(idx, q, returned)
    assert removed in third[0]  # it is rankable again


def test_large_delta_falls_back():
    idx, V, meta = _make_index()
    oracle, _, _ = _make_index()
    rng = np.random.default_rng(3)
    q = rng.normal(size=V.shape[1]).astype(np.float32)

    returned = BitMap()
    _query(idx, q, returned)
    # jump by more than _EXCL_DELTA at once (e.g. query_random batches)
    returned.update([int(x) for x in meta.frame_dbidx[:12]])
    got = _query(idx, q, returned)
    want = _query(oracle, q, BitMap(returned.to_array()))
    assert got[0] == want[0]
    np.testing.assert_allclose(got[1], want[1], rtol=1e-5)


def test_unknown_dbidx_in_exclusion_is_ignored():
    idx, V, meta = _make_index()
    rng = np.random.default_rng(4)
    q = rng.normal(size=V.shape[1]).astype(np.float32)
    returned = BitMap()
    base = _query(idx, q, returned)
    returned.update(base[0][:1])
    returned.add(10**6)  # dbidx not in the index (subset semantics)
    got = _query(idx, q, returned)
    assert base[0][0] not in got[0]


def test_from_device_arrays_serving_index():
    import jax.numpy as jnp

    host_idx, V, meta = _make_index(use_pallas=True)
    dev_idx = MultiscaleIndex.from_device_arrays(
        embedding=None,
        V=host_idx._V,
        valid=host_idx._valid,
        boxes=host_idx._boxes,
        zoom=host_idx._zoom,
        meta=meta,
        row_scale=host_idx._row_scale,
        use_pallas=True,
    )
    assert dev_idx.vectors is None
    rng = np.random.default_rng(5)
    q = rng.normal(size=V.shape[1]).astype(np.float32)

    returned = BitMap()
    for _ in range(4):
        got = _query(dev_idx, q, returned)
        want = _query(host_idx, q, BitMap(returned.to_array()))
        assert got[0] == want[0]
        np.testing.assert_allclose(got[1], want[1], rtol=1e-5)
        returned.update(got[0][:2])

    # device-gathered labeled rows == host mirror rows
    rows = rng.choice(meta.n_vectors, size=13, replace=False)
    np.testing.assert_allclose(
        dev_idx.vectors_for_rows(rows), V[rows], rtol=1e-6
    )


def test_concurrent_sessions_share_index():
    """Two sessions' bitmaps alternating (and racing) on ONE index must each
    always see exactly their own exclusions — the generation-checked commit
    protocol keeps (obj, prev, mask) consistent under interleaving."""
    import threading

    idx, V, meta = _make_index(seed=7)
    oracle, _, _ = _make_index(seed=7)
    rng = np.random.default_rng(8)
    n_sessions, n_rounds = 4, 5
    qs = rng.normal(size=(n_sessions, V.shape[1])).astype(np.float32)
    bitmaps = [BitMap() for _ in range(n_sessions)]
    logs = [[] for _ in range(n_sessions)]
    errors = []
    barrier = threading.Barrier(n_sessions)

    def run(i):
        try:
            for _ in range(n_rounds):
                barrier.wait()  # force interleaving each round
                got = _query(idx, qs[i], bitmaps[i])
                logs[i].append(got)
                bitmaps[i].update(got[0][:2])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n_sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors

    # replay each session serially against a fresh oracle index
    for i in range(n_sessions):
        bm = BitMap()
        for got in logs[i]:
            want = _query(oracle, qs[i], BitMap(bm.to_array()))
            assert got[0] == want[0], f"session {i} diverged"
            np.testing.assert_allclose(got[1], want[1], rtol=1e-5)
            bm.update(got[0][:2])


def test_sum_vectors_for_rows_device_matches_host():
    """Device-side group sums (the point-based refine reduction) equal the
    host-mirror reduction, f32 and int8."""
    for dtype in ("float32", "int8"):
        host_idx, V, meta = _make_index(use_pallas=True, device_dtype=dtype)
        dev_idx = MultiscaleIndex.from_device_arrays(
            embedding=None, V=host_idx._V, valid=host_idx._valid,
            boxes=host_idx._boxes, zoom=host_idx._zoom, meta=meta,
            row_scale=host_idx._row_scale, use_pallas=True,
        )
        rng = np.random.default_rng(9)
        groups = [
            rng.choice(meta.n_vectors, size=17, replace=False),
            rng.choice(meta.n_vectors, size=5, replace=False),
            np.zeros(0, dtype=np.int64),  # empty class
        ]
        got = dev_idx.sum_vectors_for_rows(groups)
        want = host_idx.sum_vectors_for_rows(groups)
        atol = 1e-5 if dtype == "float32" else 5e-2
        np.testing.assert_allclose(got, want, atol=atol)
        assert (got[2] == 0).all()


def test_fit_rows_device_matches_host_fit():
    """The fused serving fit (_fit_ce_rows: gather + center + LBFGS in one
    dispatch) must produce the same coefficients as the ordinary host-path
    fit over the same rows, f32 and int8 storage."""
    from seesaw_tpu.learners import LogisticRegression

    for dtype in ("float32", "int8"):
        host_idx, V, meta = _make_index(n_images=40, use_pallas=False,
                                        device_dtype=dtype)
        dev_idx = MultiscaleIndex.from_device_arrays(
            embedding=None, V=host_idx._V, valid=host_idx._valid,
            boxes=host_idx._boxes, zoom=host_idx._zoom, meta=meta,
            row_scale=host_idx._row_scale, use_pallas=False,
        )
        rng = np.random.default_rng(10)
        rows = rng.choice(meta.n_vectors, size=60, replace=False)
        y = rng.integers(0, 2, size=60).astype(np.float32)
        y[0], y[1] = 1.0, 0.0  # both classes present
        tvec = rng.normal(size=V.shape[1]).astype(np.float32)
        tvec /= np.linalg.norm(tvec)

        kw = dict(class_weights="balanced", scale="centered", reg_lambda=5.0,
                  fit_intercept=False, regularizer_vector=tvec, max_iter=50)
        m_host = LogisticRegression(**kw)
        m_host.fit_rows(host_idx, rows, y)  # host-mirror path -> fit()
        m_dev = LogisticRegression(**kw)
        m_dev.fit_rows(dev_idx, rows, y)  # fused device path

        atol = 1e-3 if dtype == "float32" else 2e-2
        np.testing.assert_allclose(
            m_dev.get_coeff(), m_host.get_coeff(), atol=atol,
            err_msg=f"dtype={dtype}",
        )
        np.testing.assert_allclose(m_dev.mu_, m_host.mu_, atol=atol)


def test_interleaved_sessions_stay_incremental(monkeypatch):
    """Two sessions alternating solo clicks on ONE shared index must each
    keep their device mask incremental: after the first sighting of each
    session's BitMap, no further full host mask rebuilds happen (the old
    single-slot cache rebuilt on EVERY alternation)."""
    idx, V, meta = _make_index(seed=7)
    rng = np.random.default_rng(8)
    qa = rng.normal(size=V.shape[1]).astype(np.float32)
    qb = rng.normal(size=V.shape[1]).astype(np.float32)

    rebuilds = {"n": 0}
    orig = MultiscaleIndex._frame_exclusion_mask

    def counting(self, exclude):
        rebuilds["n"] += 1
        return orig(self, exclude)

    monkeypatch.setattr(MultiscaleIndex, "_frame_exclusion_mask", counting)

    excl_a, excl_b = BitMap(), BitMap()
    seen_a, seen_b = set(), set()
    for r in range(5):
        ra = idx.query(vector=qa, topk=2, shortlist_size=10, exclude=excl_a)
        for db in ra["dbidxs"]:
            assert db not in seen_a
            seen_a.add(int(db)); excl_a.add(int(db))
        rb = idx.query(vector=qb, topk=2, shortlist_size=10, exclude=excl_b)
        for db in rb["dbidxs"]:
            assert db not in seen_b
            seen_b.add(int(db)); excl_b.add(int(db))
    # one full rebuild per session (first non-empty sighting), none after
    assert rebuilds["n"] == 2, f"expected 2 rebuilds, saw {rebuilds['n']}"
    assert len(seen_a) == 10 and len(seen_b) == 10


def test_exclusion_cache_eviction_is_correct():
    """More concurrent sessions than the LRU cap: evicted sessions rebuild
    on return but stay CORRECT (no repeats, equal to a fresh-index query)."""
    idx, V, meta = _make_index(seed=9)
    ctrl, _, _ = _make_index(seed=9)
    rng = np.random.default_rng(10)
    q = rng.normal(size=V.shape[1]).astype(np.float32)

    old_cap = MultiscaleIndex._EXCL_CACHE
    MultiscaleIndex._EXCL_CACHE = 2
    try:
        excls = [BitMap() for _ in range(4)]  # 4 sessions, cap 2
        for r in range(3):
            for s, excl in enumerate(excls):
                got = idx.query(vector=q, topk=2, shortlist_size=10,
                                exclude=excl)
                want = ctrl.query(vector=q, topk=2, shortlist_size=10,
                                  exclude=BitMap(excl.to_array()))
                assert list(got["dbidxs"]) == list(want["dbidxs"])
                for db in got["dbidxs"]:
                    assert db not in excl
                    excl.add(int(db))
        assert len(idx._excl_entries) <= 2
    finally:
        MultiscaleIndex._EXCL_CACHE = old_cap
