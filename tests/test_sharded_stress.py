"""Multi-chip stress tests at padding/boundary scale (virtual 8-device mesh).

The toy-sized sharded tests (test_sharded_index.py / test_sharded_graph.py)
prove the mechanics; these exercise the regimes where sharding bugs live:
~100k vectors with ragged per-frame tile counts and a frame count chosen so
the LAST shard is partially padded, shortlist_size larger than a shard's
frame count, fully-excluded shards, and a 12k-vector exact kNN build + 100k
propagation checked bit-for-bit against the single-device programs.
"""
import numpy as np
import pytest

from seesaw_tpu.indices.meta import VectorMeta
from seesaw_tpu.indices.multiscale import MultiscaleIndex
from seesaw_tpu.parallel import make_mesh
from seesaw_tpu.runtime.bitmap import BitMap


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _ragged_db(n_frames, d, seed=0, max_tiles=7):
    """Ragged tiles-per-frame database; n_frames deliberately not divisible
    by the shard count so the last shard carries padding."""
    rng = np.random.default_rng(seed)
    counts = rng.integers(1, max_tiles + 1, size=n_frames)
    n_vec = int(counts.sum())
    dbidx = np.repeat(np.arange(n_frames, dtype=np.int64) * 2 + 1, counts)
    zoom = rng.integers(1, 4, size=n_vec).astype(np.int64)
    xy = rng.uniform(0, 180, size=(n_vec, 2)).astype(np.float32)
    wh = rng.uniform(20, 80, size=(n_vec, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    meta, order = VectorMeta.from_arrays(dbidx, zoom, boxes)
    V = rng.normal(size=(n_vec, d)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return V[order], meta


@pytest.fixture(scope="module")
def big_db():
    # 25k+3 frames x ~4 tiles => ~100k vectors; 25003 % 8 != 0
    return _ragged_db(n_frames=25_003, d=32, seed=1)


def _compare_queries(single, sharded, q, exclude, topk, shortlist):
    r1 = single.query(vector=q, topk=topk, shortlist_size=shortlist,
                      exclude=exclude)
    r2 = sharded.query(vector=q, topk=topk, shortlist_size=shortlist,
                       exclude=BitMap(exclude.to_array()) if exclude else None)
    assert list(r1["dbidxs"]) == list(r2["dbidxs"])
    s1 = [a["score"] for a in r1["activations"]]
    s2 = [a["score"] for a in r2["activations"]]
    np.testing.assert_allclose(s2, s1, rtol=1e-5, atol=1e-6)
    return list(r1["dbidxs"])


def test_sharded_retrieval_100k_ragged(big_db, mesh):
    V, meta = big_db
    single = MultiscaleIndex(vectors=V, meta=meta)
    sharded = MultiscaleIndex(vectors=V, meta=meta, mesh=mesh)
    assert sharded._sharded is not None
    # ragged boundary actually present: last shard partially padded
    assert meta.n_frames % 8 != 0

    rng = np.random.default_rng(2)
    q = rng.normal(size=V.shape[1]).astype(np.float32)
    exclude = BitMap()
    for _ in range(4):
        got = _compare_queries(single, sharded, q, exclude, topk=10,
                               shortlist=50)
        exclude.update(got)  # sessions exclude what they saw


def test_shortlist_exceeds_shard_frames(mesh):
    # 19 frames over 8 shards -> 3 frames/shard; ask for shortlist 50 and
    # topk beyond some shards' counts
    V, meta = _ragged_db(n_frames=19, d=16, seed=3)
    single = MultiscaleIndex(vectors=V, meta=meta)
    sharded = MultiscaleIndex(vectors=V, meta=meta, mesh=mesh)
    rng = np.random.default_rng(4)
    q = rng.normal(size=16).astype(np.float32)
    _compare_queries(single, sharded, q, None, topk=12, shortlist=50)


def test_all_excluded_shards(big_db, mesh):
    V, meta = big_db
    single = MultiscaleIndex(vectors=V, meta=meta)
    sharded = MultiscaleIndex(vectors=V, meta=meta, mesh=mesh)
    rng = np.random.default_rng(5)
    q = rng.normal(size=V.shape[1]).astype(np.float32)

    # exclude every frame owned by shards 0 and 7 (incl. the ragged tail)
    Fs = sharded._sharded.n_frames_local
    ords = np.concatenate([np.arange(0, Fs),
                           np.arange(7 * Fs, meta.n_frames)])
    exclude = BitMap(meta.frame_dbidx[ords])
    got = _compare_queries(single, sharded, q, exclude, topk=10, shortlist=40)
    banned = set(int(x) for x in meta.frame_dbidx[ords])
    assert not (set(got) & banned)

    # everything excluded -> empty result, no crash
    all_ex = BitMap(meta.frame_dbidx)
    r = sharded.query(vector=q, topk=5, shortlist_size=20, exclude=all_ex)
    assert len(r["dbidxs"]) == 0


def test_sharded_knn_12k_bit_equal(mesh):
    from seesaw_tpu.ops.knn import exact_knn
    from seesaw_tpu.parallel.sharded_graph import sharded_exact_knn

    rng = np.random.default_rng(6)
    n = 12_037  # ragged vs 8 shards
    V = rng.normal(size=(n, 16)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    # plant duplicate clusters to force sims > 1.0 tie handling at scale
    V[5000:5010] = V[17]
    V[9999] = V[2]

    ids1, d1 = exact_knn(V, 8)
    ids2, d2 = sharded_exact_knn(V, 8, mesh)
    assert (ids1 == ids2).all(), "sharded kNN != single-device at 12k"
    np.testing.assert_allclose(d2, d1, atol=1e-6)


def test_sharded_propagation_100k(mesh):
    from seesaw_tpu.knn_graph import KNNGraph, rbf_kernel, symmetrize_weights
    from seesaw_tpu.label_propagation import LabelPropagation

    rng = np.random.default_rng(7)
    n = 100_003  # ragged
    k = 8
    # synthetic fixed-degree graph (building exact kNN at 100k is the kNN
    # test's job; propagation only needs a valid symmetric weight structure)
    dst = np.empty((n, k), dtype=np.int32)
    for j in range(k):
        dst[:, j] = (np.arange(n) + rng.integers(1, n)) % n
    dist = rng.uniform(0.05, 0.9, size=(n, k)).astype(np.float32)
    g = KNNGraph(dst, dist)
    sw = symmetrize_weights(g, rbf_kernel(0.5))

    prior = rng.uniform(0.1, 0.9, size=n).astype(np.float32)
    ids = rng.choice(n, size=64, replace=False)
    vals = rng.integers(0, 2, size=64).astype(np.float32)

    kw = dict(reg_lambda=1.0, max_iter=80, epsilon=1e-8)
    got = LabelPropagation(sw, mesh=mesh, **kw).fit_transform(
        label_ids=ids, label_values=vals, reg_values=prior
    )
    want = LabelPropagation(sw, **kw).fit_transform(
        label_ids=ids, label_values=vals, reg_values=prior
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(got[ids], vals, atol=1e-6)
