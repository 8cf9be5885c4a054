"""Sharded (8-virtual-device) exact top-k must match the single-chip query
program bit-for-bit on scores and frame ranking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seesaw_tpu.indices.meta import VectorMeta
from seesaw_tpu.ops import frame_scoring as fs
from seesaw_tpu.parallel import ShardedFrameIndex, make_mesh, sharded_query_topk


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(0)
    dbidx, zoom, boxes, vecs = [], [], [], []
    for f in range(41):  # deliberately not divisible by 8
        ntiles = int(rng.integers(1, 9))
        for _ in range(ntiles):
            zl = int(rng.integers(1, 4))
            size = 32.0 * (2 ** (zl - 1))
            x1 = float(rng.uniform(0, 224 - size))
            y1 = float(rng.uniform(0, 224 - size))
            dbidx.append(f * 2 + 5)
            zoom.append(zl)
            boxes.append((x1, y1, x1 + size, y1 + size))
            v = rng.normal(size=24).astype(np.float32)
            vecs.append(v / np.linalg.norm(v))
    meta, order = VectorMeta.from_arrays(
        np.array(dbidx), np.array(zoom), np.array(boxes, np.float32)
    )
    V = np.stack(vecs)[order]
    return meta, V


def single_chip_reference(meta, V, q, excluded, topk, shortlist_size=None):
    rows, valid = meta.padded_rows(16)
    fr, fv = rows.reshape(-1), valid.reshape(-1)
    Vp = V[fr].copy(); Vp[~fv] = 0
    res = fs.query_program(
        jnp.asarray(Vp), jnp.asarray(valid),
        jnp.asarray(meta.boxes[fr]), jnp.asarray(meta.zoom_level[fr]),
        jnp.asarray(q), None, jnp.asarray(excluded),
        shortlist_size=shortlist_size or meta.n_frames, topk=topk,
        aug_larger="all", aug_weight="level_max",
        agg_method="avg_score", max_zoom=3,
    )
    n = int(res.n_valid)
    fids = np.asarray(res.frame_ids)[:n]
    return meta.frame_dbidx[fids], np.asarray(res.frame_scores)[:n]


def test_matches_single_chip(db):
    meta, V = db
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    idx = ShardedFrameIndex.build(V, meta, mesh)

    rng = np.random.default_rng(1)
    q = rng.normal(size=V.shape[1]).astype(np.float32)
    q /= np.linalg.norm(q)

    excluded = np.zeros(meta.n_frames, dtype=bool)
    excluded[[3, 17, 30]] = True

    want_dbidx, want_scores = single_chip_reference(meta, V, q, excluded, topk=10)
    got_dbidx, got_scores, got_boxes, _ = sharded_query_topk(
        idx, q, excluded, topk=10, shortlist_size=idx.n_frames
    )
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)
    assert got_dbidx.tolist() == want_dbidx.tolist()


def test_exclusion_and_exhaustion(db):
    meta, V = db
    mesh = make_mesh(8)
    idx = ShardedFrameIndex.build(V, meta, mesh)
    rng = np.random.default_rng(2)
    q = rng.normal(size=V.shape[1]).astype(np.float32)

    excluded = np.ones(meta.n_frames, dtype=bool)
    excluded[[0, 40]] = False
    got_dbidx, got_scores, _, _ = sharded_query_topk(
        idx, q, excluded, topk=5, shortlist_size=idx.n_frames
    )
    assert set(got_dbidx.tolist()) == {meta.frame_dbidx[0], meta.frame_dbidx[40]}


def test_uneven_small_db():
    # fewer frames than devices
    rng = np.random.default_rng(3)
    xy = rng.uniform(0, 100, size=(6, 2)).astype(np.float32)
    wh = rng.uniform(10, 60, size=(6, 2)).astype(np.float32)
    meta, order = VectorMeta.from_arrays(
        np.array([0, 0, 1, 2, 2, 2]),
        np.array([1, 2, 1, 1, 1, 2]),
        np.concatenate([xy, xy + wh], axis=1),
    )
    V = rng.normal(size=(6, 16)).astype(np.float32)[order]
    mesh = make_mesh(8)
    idx = ShardedFrameIndex.build(V, meta, mesh)
    q = rng.normal(size=16).astype(np.float32)
    got_dbidx, got_scores, _, _ = sharded_query_topk(
        idx, q, np.zeros(3, dtype=bool), topk=3, shortlist_size=idx.n_frames
    )
    assert len(got_dbidx) == 3
    assert set(got_dbidx.tolist()) == {0, 1, 2}


def test_sharded_shortlist_tie_break():
    """Exact f32 ties AT the global shortlist cutoff (e.g. duplicate images
    straddling the boundary): the sharded cutoff must keep exactly the
    frames single-device lax.top_k keeps (ties -> lowest frame id), not a
    superset (ADVICE r3). Tied frames have identical raw max-tile scores
    but DIFFERENT augmented scores, so a tie-superset would leak
    higher-augmented frames from beyond the cutoff into the final top-k."""
    n_frames, d = 24, 8
    dbidx = np.repeat(np.arange(n_frames), 2)
    zoom = np.tile([1, 2], n_frames)
    boxes = np.tile(
        np.array([[0, 0, 64, 64], [0, 0, 128, 128]], np.float32), (n_frames, 1)
    )
    # raw fmax: frames 0..9 distinct high; 10..19 tie at exactly 5.0;
    # 20..23 low. Augmented frame score = mean(tile0, tile1), which for the
    # tie group RISES with frame id (3.0 + 0.2j on tile1).
    s0 = np.concatenate([10.0 - 0.1 * np.arange(10), np.full(10, 5.0), np.full(4, 1.0)])
    s1 = np.concatenate([10.0 - 0.1 * np.arange(10), 3.0 + 0.2 * np.arange(10), np.full(4, 1.0)])
    V = np.zeros((n_frames * 2, d), np.float32)
    V[0::2, 0] = s0.astype(np.float32)
    V[1::2, 0] = s1.astype(np.float32)
    meta, order = VectorMeta.from_arrays(dbidx, zoom, boxes)
    V = V[order]
    q = np.zeros(d, np.float32)
    q[0] = 1.0

    excluded = np.zeros(n_frames, dtype=bool)
    want_dbidx, want_scores = single_chip_reference(
        meta, V, q, excluded, topk=12, shortlist_size=15
    )
    # sanity: the single-device shortlist cut 10..14 out of the tie group
    assert set(want_dbidx.tolist()) == set(range(10)) | {13, 14}

    mesh = make_mesh(8)
    idx = ShardedFrameIndex.build(V, meta, mesh)
    got_dbidx, got_scores, _, _ = sharded_query_topk(
        idx, q, excluded, topk=12, shortlist_size=15
    )
    assert got_dbidx.tolist() == want_dbidx.tolist()
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)


def test_sharded_batch_equals_solo(db):
    """sharded_query_topk_batch == Q solo sharded queries (per-query
    exclusion masks), over the virtual 8-device mesh."""
    from seesaw_tpu.parallel.sharded_index import sharded_query_topk_batch

    meta, V = db
    mesh = make_mesh(8)
    idx = ShardedFrameIndex.build(V, meta, mesh)
    rng = np.random.default_rng(7)
    Q = 5
    qs = rng.normal(size=(Q, V.shape[1])).astype(np.float32)
    excl = np.zeros((Q, meta.n_frames), dtype=bool)
    for i in range(Q):
        excl[i, rng.choice(meta.n_frames, size=6, replace=False)] = True

    batch = sharded_query_topk_batch(
        idx, qs, excl, topk=8, shortlist_size=20
    )
    for i in range(Q):
        want = sharded_query_topk(
            idx, qs[i], excl[i], topk=8, shortlist_size=20
        )
        got = batch[i]
        assert got[0].tolist() == want[0].tolist()
        np.testing.assert_allclose(got[1], want[1], rtol=1e-5)
        np.testing.assert_allclose(got[2], want[2], rtol=1e-5)
        np.testing.assert_allclose(got[3], want[3], rtol=1e-5)


def test_coalescer_batches_sharded_index():
    """Concurrent coalesced queries against a MESH-SHARDED index run the
    batched sharded dispatch (no solo-path carve-out, VERDICT r3 weak #8)
    and return exactly the solo results."""
    import threading

    from seesaw_tpu.indices.multiscale import MultiscaleIndex
    from seesaw_tpu.parallel import make_mesh as mk
    from seesaw_tpu.runtime.bitmap import BitMap
    from seesaw_tpu.web.coalesce import QueryCoalescer

    rng = np.random.default_rng(11)
    n_frames, tiles, d = 40, 4, 16
    dbidx = np.repeat(np.arange(n_frames), tiles)
    zoom = np.tile([1, 1, 2, 2], n_frames)
    xy = rng.uniform(0, 100, size=(n_frames * tiles, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + 60], axis=1)
    meta, order = VectorMeta.from_arrays(dbidx, zoom, boxes)
    V = rng.normal(size=(n_frames * tiles, d)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)

    idx = MultiscaleIndex(vectors=V[order], meta=meta, mesh=mk(8))
    co = QueryCoalescer(idx, window_ms=25.0, max_batch=8)

    n_threads = 5
    qs = rng.normal(size=(n_threads, d)).astype(np.float32)
    excludes = [
        BitMap(rng.choice(meta.frame_dbidx, size=5, replace=False))
        for _ in range(n_threads)
    ]
    results = [None] * n_threads
    errors = []

    def worker(i):
        try:
            results[i] = co.query(
                vector=qs[i], topk=6, shortlist_size=20, exclude=excludes[i]
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert co.stats["batched"] > 0, f"sharded requests were not coalesced: {co.stats}"

    for i in range(n_threads):
        want = idx.query(vector=qs[i], topk=6, shortlist_size=20,
                         exclude=BitMap(excludes[i].to_array()))
        assert list(results[i]["dbidxs"]) == list(want["dbidxs"])
        np.testing.assert_allclose(
            [a["score"] for a in results[i]["activations"]],
            [a["score"] for a in want["activations"]], rtol=1e-5,
        )


def test_use_pallas_rejected_on_mesh():
    """use_pallas pads the frame axis to the kernel's 1024 block, but the
    sharded path's exclusion masks are n_frames-long — the constructor must
    refuse the combination instead of misaligning frames (ADVICE r3)."""
    from seesaw_tpu.indices.multiscale import MultiscaleIndex
    from seesaw_tpu.parallel import make_mesh as mk

    rng = np.random.default_rng(5)
    n_frames, tiles, d = 16, 2, 8
    dbidx = np.repeat(np.arange(n_frames), tiles)
    zoom = np.tile([1, 2], n_frames)
    xy = rng.uniform(0, 100, size=(n_frames * tiles, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + 60], axis=1)
    meta, order = VectorMeta.from_arrays(dbidx, zoom, boxes)
    V = rng.normal(size=(n_frames * tiles, d)).astype(np.float32)

    with pytest.raises(ValueError, match="mutually exclusive"):
        MultiscaleIndex(vectors=V[order], meta=meta, mesh=mk(8),
                        use_pallas=True)


def test_session_over_sharded_index(tmp_path):
    """End-to-end session with the index row-sharded over the 8-device mesh
    (index_options={'sharded': True}): same results as the single-device
    index."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))
    from synth import build_synthetic_root, CATEGORY, QSTR

    import seesaw_tpu.dataset as dsm
    from seesaw_tpu.basic_types import BenchParams, IndexSpec, SessionParams
    from seesaw_tpu.bench.harness import benchmark_loop
    from seesaw_tpu.runtime.bitmap import FrozenBitMap
    from seesaw_tpu.session import make_session

    root = tmp_path / "root"
    build_synthetic_root(str(root))

    def run(index_options):
        p = SessionParams(
            index_spec=IndexSpec(d_name="synth", i_name="multiscale"),
            interactive="plain", batch_size=3, shortlist_size=20,
            index_options=index_options,
        )
        b = BenchParams(name="t", ground_truth_category=CATEGORY, qstr=QSTR,
                        n_batches=6, max_results=5)
        gdm = dsm.GlobalDataManager(str(root))
        ret = make_session(gdm, p, b=b)
        ds = ret["dataset"]
        box_table, _ = ds.load_ground_truth()
        info = benchmark_loop(session=ret["session"], subset=FrozenBitMap(ds.dbidxs),
                              box_table=box_table, b=b, p=p)
        seen = [im.dbidx for batch in ret["session"].get_state().gdata for im in batch]
        return info, seen

    info_single, seen_single = run({})
    info_sharded, seen_sharded = run({"sharded": True})
    assert seen_sharded == seen_single
    assert info_sharded["nfound"] == info_single["nfound"]


def test_sharded_vector2_discount(tmp_path):
    """The two-query discount (MultiRegNeg) matches single-device results on
    the sharded index."""
    import numpy as np

    from seesaw_tpu.indices.meta import VectorMeta
    from seesaw_tpu.indices.multiscale import MultiscaleIndex
    from seesaw_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    n_frames, tiles, d = 40, 4, 16
    dbidx = np.repeat(np.arange(n_frames), tiles)
    zoom = np.tile([1, 1, 2, 2], n_frames)
    xy = rng.uniform(0, 100, size=(n_frames * tiles, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + 60], axis=1)
    meta, order = VectorMeta.from_arrays(dbidx, zoom, boxes)
    V = rng.normal(size=(n_frames * tiles, d)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)

    q = rng.normal(size=d).astype(np.float32)
    q2 = rng.normal(size=d).astype(np.float32)

    single = MultiscaleIndex(vectors=V[order], meta=meta)
    sharded = MultiscaleIndex(vectors=V[order], meta=meta, mesh=make_mesh(8))

    r1 = single.query(vector=q, vector2=q2, topk=8, shortlist_size=20)
    r2 = sharded.query(vector=q, vector2=q2, topk=8, shortlist_size=20)
    np.testing.assert_array_equal(r2["dbidxs"], r1["dbidxs"])
    s1 = [a["score"] for a in r1["activations"]]
    s2 = [a["score"] for a in r2["activations"]]
    np.testing.assert_allclose(s2, s1, atol=1e-5)


def test_sharded_rank_by_scores_matches_single_chip(db):
    """External-score ranking over the mesh (the KnnProp2 round's rank step)
    equals MultiscaleIndex.rank_by_scores on one device: same dbidx order
    and frame scores under exclusion."""
    from seesaw_tpu.indices.multiscale import MultiscaleIndex
    from seesaw_tpu.parallel.sharded_index import sharded_rank_by_scores
    from seesaw_tpu.runtime.bitmap import BitMap

    meta, V = db
    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    scores = rng.normal(size=meta.n_vectors).astype(np.float32)

    idx_solo = MultiscaleIndex(vectors=V, meta=meta)
    idx_mesh = MultiscaleIndex(vectors=V, meta=meta, mesh=mesh)
    assert idx_mesh._sharded is not None

    # exclude the TOP-scoring frames so the exclusion path provably bites
    # (and dbidx != frame ordinal in this fixture, catching id-space mixups)
    head = idx_solo.rank_by_scores(scores, topk=3, exclude=None)
    exclude = BitMap(int(d) for d in head["dbidxs"])
    for topk, sl in ((5, 20), (8, None)):
        want = idx_solo.rank_by_scores(
            scores, topk=topk, shortlist_size=sl, exclude=exclude,
            agg_method="avg_score", aug_larger="all",
        )
        got = idx_mesh.rank_by_scores(
            scores, topk=topk, shortlist_size=sl, exclude=exclude,
            agg_method="avg_score", aug_larger="all",
        )
        assert list(got["dbidxs"]) == list(want["dbidxs"])
        for a, b in zip(got["activations"], want["activations"]):
            assert a["dbidx"] == b["dbidx"]
            np.testing.assert_allclose(a["score"], b["score"], rtol=2e-6)

    # direct API with a host mask, no exclusions
    dbidxs, fscores, _, _ = sharded_rank_by_scores(
        idx_mesh._sharded, scores, np.zeros(meta.n_frames, bool),
        topk=6, shortlist_size=18,
    )
    want2 = idx_solo.rank_by_scores(
        scores, topk=6, shortlist_size=18, exclude=None,
        agg_method="avg_score", aug_larger="all",
    )
    assert list(dbidxs) == list(want2["dbidxs"])
