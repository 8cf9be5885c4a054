"""Batched multi-query scoring: Q concurrent sessions in one dispatch.

query_program_batch must equal Q independent query_program runs (each with
its own exclusion mask), in both float and int8 storage. Also covers the
index-level QueryCoalescer that transparently merges concurrent
MultiscaleIndex.query calls from different server threads.
"""
import threading

import numpy as np
import pytest

import jax.numpy as jnp

from seesaw_tpu.indices.meta import VectorMeta
from seesaw_tpu.indices.multiscale import MultiscaleIndex
from seesaw_tpu.ops import frame_scoring
from seesaw_tpu.runtime.bitmap import BitMap


def _db(n_frames=60, tiles=4, d=16, seed=0):
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
def test_batch_equals_serial(device_dtype):
    V, meta = _db()
    idx = MultiscaleIndex(vectors=V, meta=meta, device_dtype=device_dtype)
    rng = np.random.default_rng(1)
    Q = 5
    qs = rng.normal(size=(Q, V.shape[1])).astype(np.float32)
    excl = np.zeros((Q, meta.n_frames), dtype=bool)
    for i in range(Q):  # distinct per-session exclusions
        excl[i, rng.choice(meta.n_frames, size=7, replace=False)] = True

    kw = dict(shortlist_size=20, topk=6, aug_larger="all",
              aug_weight="level_max", agg_method="avg_score", max_zoom=2)
    batch = frame_scoring.query_program_batch(
        idx._V, idx._valid, idx._boxes, idx._zoom,
        jnp.asarray(qs), jnp.asarray(excl), idx._row_scale, **kw,
    )
    for i in range(Q):
        single = frame_scoring.query_program(
            idx._V, idx._valid, idx._boxes, idx._zoom,
            jnp.asarray(qs[i]), None, jnp.asarray(excl[i]),
            idx._row_scale, **kw,
        )
        assert int(batch.n_valid[i]) == int(single.n_valid)
        n = int(single.n_valid)
        got_ids = np.asarray(batch.frame_ids[i])[:n]
        want_ids = np.asarray(single.frame_ids)[:n]
        # int8 included: the batch program quantizes each query by its OWN
        # max, exactly like a solo dispatch
        assert (got_ids == want_ids).all()
        np.testing.assert_allclose(
            np.asarray(batch.frame_scores[i])[:n],
            np.asarray(single.frame_scores)[:n], rtol=1e-5,
        )


def test_batch_framescale_equals_serial():
    """int8 with PER-FRAME scales: query_program_batch_framescale (int32
    tile max before dequant — the fastest batch scan on chip) must equal Q
    solo query_program runs over the same index (whose row_scale is the
    frame scale expanded per tile)."""
    V, meta = _db(seed=9)
    idx = MultiscaleIndex(vectors=V, meta=meta, device_dtype="int8",
                          int8_scale="frame")
    assert idx._frame_scale is not None
    rng = np.random.default_rng(10)
    Q = 5
    qs = rng.normal(size=(Q, V.shape[1])).astype(np.float32)
    excl = np.zeros((Q, meta.n_frames), dtype=bool)
    for i in range(Q):
        excl[i, rng.choice(meta.n_frames, size=7, replace=False)] = True

    kw = dict(shortlist_size=20, topk=6, aug_larger="all",
              aug_weight="level_max", agg_method="avg_score", max_zoom=2)
    batch = frame_scoring.query_program_batch_framescale(
        idx._V, idx._valid, idx._boxes, idx._zoom,
        jnp.asarray(qs), jnp.asarray(excl), idx._frame_scale, **kw,
    )
    for i in range(Q):
        single = frame_scoring.query_program(
            idx._V, idx._valid, idx._boxes, idx._zoom,
            jnp.asarray(qs[i]), None, jnp.asarray(excl[i]),
            idx._row_scale, **kw,
        )
        n = int(single.n_valid)
        assert int(batch.n_valid[i]) == n
        assert (np.asarray(batch.frame_ids[i])[:n]
                == np.asarray(single.frame_ids)[:n]).all()
        np.testing.assert_allclose(
            np.asarray(batch.frame_scores[i])[:n],
            np.asarray(single.frame_scores)[:n], rtol=1e-5,
        )


def test_coalescer_uses_framescale_program():
    """A coalescer over an int8_scale='frame' index batches through the
    framescale program and still returns exactly the solo results."""
    import threading

    from seesaw_tpu.web.coalesce import QueryCoalescer

    V, meta = _db(seed=12)
    idx = MultiscaleIndex(vectors=V, meta=meta, device_dtype="int8",
                          int8_scale="frame")
    co = QueryCoalescer(idx, window_ms=25.0, max_batch=8)
    rng = np.random.default_rng(13)
    n_threads = 5
    qs = rng.normal(size=(n_threads, V.shape[1])).astype(np.float32)
    excludes = [
        BitMap(rng.choice(meta.frame_dbidx, size=5, replace=False))
        for _ in range(n_threads)
    ]
    results = [None] * n_threads
    errors = []

    def worker(i):
        try:
            results[i] = co.query(vector=qs[i], topk=5, shortlist_size=20,
                                  exclude=excludes[i])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert co.stats["batched"] > 0
    for i in range(n_threads):
        want = idx.query(vector=qs[i], topk=5, shortlist_size=20,
                         exclude=BitMap(excludes[i].to_array()))
        assert list(results[i]["dbidxs"]) == list(want["dbidxs"])


def test_coalescer_transparent():
    from seesaw_tpu.web.coalesce import QueryCoalescer

    V, meta = _db(seed=3)
    idx = MultiscaleIndex(vectors=V, meta=meta)
    co = QueryCoalescer(idx, window_ms=15.0, max_batch=8)

    rng = np.random.default_rng(4)
    n_threads = 6
    qs = rng.normal(size=(n_threads, V.shape[1])).astype(np.float32)
    excludes = []
    for i in range(n_threads):
        bm = BitMap(rng.choice(meta.frame_dbidx, size=5, replace=False))
        excludes.append(bm)

    results = [None] * n_threads
    errors = []

    def worker(i):
        try:
            results[i] = co.query(
                vector=qs[i], topk=5, shortlist_size=20,
                exclude=excludes[i],
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert co.stats["batched"] > 0, "no requests were actually coalesced"

    for i in range(n_threads):
        want = idx.query(vector=qs[i], topk=5, shortlist_size=20,
                         exclude=BitMap(excludes[i].to_array()))
        assert list(results[i]["dbidxs"]) == list(want["dbidxs"])
        np.testing.assert_allclose(
            [a["score"] for a in results[i]["activations"]],
            [a["score"] for a in want["activations"]], rtol=1e-5,
        )


def test_coalescer_single_caller_passthrough():
    from seesaw_tpu.web.coalesce import QueryCoalescer

    V, meta = _db(seed=5)
    idx = MultiscaleIndex(vectors=V, meta=meta)
    co = QueryCoalescer(idx, window_ms=1.0)
    rng = np.random.default_rng(6)
    q = rng.normal(size=V.shape[1]).astype(np.float32)
    got = co.query(vector=q, topk=4, shortlist_size=16, exclude=None)
    want = idx.query(vector=q, topk=4, shortlist_size=16, exclude=None)
    assert list(got["dbidxs"]) == list(want["dbidxs"])


def test_sessions_share_one_index_and_coalesce(tmp_path):
    """Process-wide index sharing (AccessMethod.load memoization): two
    sessions over the same dataset hold the SAME index object (one
    device-resident matrix, the reference cache-actor role), and with
    coalesce_ms their concurrent re-ranks merge into batched dispatches."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from synth import build_synthetic_root, QSTR

    from seesaw_tpu.basic_types import IndexSpec, SessionParams
    from seesaw_tpu.dataset import GlobalDataManager
    from seesaw_tpu.session import make_session
    from seesaw_tpu.web.coalesce import CoalescingIndex

    build_synthetic_root(str(tmp_path), dataset_name="shared")
    gdm = GlobalDataManager(str(tmp_path))

    def params():
        return SessionParams(
            index_spec=IndexSpec(d_name="shared", i_name="multiscale"),
            interactive="plain", batch_size=3, shortlist_size=20,
            agg_method="avg_score", aug_larger="all",
            index_options={"coalesce_ms": 25.0},
        )

    s1 = make_session(gdm, params())["session"]
    s2 = make_session(gdm, params())["session"]
    assert s1.index is s2.index, "sessions must share one index object"
    assert isinstance(s1.index, CoalescingIndex)

    s1.set_text(QSTR)
    s2.set_text(QSTR)

    results = {}

    def drive(name, s):
        for _ in range(3):
            results.setdefault(name, []).extend(int(i) for i in s.next())

    t1 = threading.Thread(target=drive, args=("a", s1))
    t2 = threading.Thread(target=drive, args=("b", s2))
    t1.start(); t2.start(); t1.join(); t2.join()

    co = s1.index._coalescer
    assert co.stats["batched"] > 0, f"no coalescing happened: {co.stats}"
    # each session's no-repeat contract held through the shared scan
    assert len(results["a"]) == len(set(results["a"])) == 9
    assert len(results["b"]) == len(set(results["b"])) == 9

    # rebuilding at the same path must NOT serve the stale cached object
    from seesaw_tpu.runtime.cache import index_cache

    idx_before = gdm.get_dataset("shared").load_index("multiscale", options={})
    index_cache.invalidate_prefix(str(tmp_path))
    idx_after = gdm.get_dataset("shared").load_index("multiscale", options={})
    assert idx_before is not idx_after


@pytest.mark.parametrize("device_dtype", ["float32", "int8"])
def test_coalesced_rounds_stay_incremental(monkeypatch, device_dtype):
    """Coalesced clicks keep each session's device mask resident: after the
    first sighting of each session's BitMap, later coalesced rounds ship
    only delta ordinals (no full host mask rebuilds), and results stay
    equal to a control index queried with fresh masks every round."""
    from seesaw_tpu.web.coalesce import QueryCoalescer

    V, meta = _db(seed=11)
    idx = MultiscaleIndex(vectors=V, meta=meta, device_dtype=device_dtype,
                          int8_scale="frame")
    ctrl = MultiscaleIndex(vectors=V, meta=meta, device_dtype=device_dtype,
                           int8_scale="frame")
    co = QueryCoalescer(idx, window_ms=15.0, max_batch=8)

    rng = np.random.default_rng(12)
    n_sessions = 4
    qs = rng.normal(size=(n_sessions, V.shape[1])).astype(np.float32)
    excludes = [BitMap() for _ in range(n_sessions)]

    rebuilds = {"n": 0}
    orig = MultiscaleIndex._frame_exclusion_mask

    def counting(self, exclude):
        if self is idx:
            rebuilds["n"] += 1
        return orig(self, exclude)

    monkeypatch.setattr(MultiscaleIndex, "_frame_exclusion_mask", counting)

    for r in range(4):
        results = [None] * n_sessions
        errors = []

        def worker(i):
            try:
                results[i] = co.query(vector=qs[i], topk=3,
                                      shortlist_size=15,
                                      exclude=excludes[i])
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(n_sessions)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        for i in range(n_sessions):
            want = ctrl.query(vector=qs[i], topk=3, shortlist_size=15,
                              exclude=BitMap(excludes[i].to_array()))
            assert list(results[i]["dbidxs"]) == list(want["dbidxs"])
            for db in results[i]["dbidxs"]:
                assert db not in excludes[i]  # no repeats within a session
                excludes[i].add(int(db))
    # round 1 ships empty sets (no rebuild); each session rebuilds once on
    # its first NON-EMPTY sighting (round 2), everything after is delta-only
    assert rebuilds["n"] == n_sessions, (
        f"expected {n_sessions} rebuilds, saw {rebuilds['n']}"
    )
