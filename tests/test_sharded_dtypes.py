"""Sharded storage dtypes: int8 (per-row scales) and bfloat16 blocks must
rank exactly like the single-chip index with the same device_dtype, and a
mesh index must survive alternating flat-layout (rank_by_scores) and
sharded-layout (query) entry points on one shared exclusion BitMap."""
import numpy as np
import pytest

from seesaw_tpu.indices.meta import VectorMeta
from seesaw_tpu.indices.multiscale import MultiscaleIndex
from seesaw_tpu.parallel import make_mesh
from seesaw_tpu.runtime.bitmap import BitMap


def _db(n_frames=41, d=24, seed=0):
    rng = np.random.default_rng(seed)
    dbidx, zoom, boxes, vecs = [], [], [], []
    for f in range(n_frames):
        for _ in range(int(rng.integers(1, 9))):
            zl = int(rng.integers(1, 4))
            size = 32.0 * (2 ** (zl - 1))
            x1 = float(rng.uniform(0, 224 - size))
            y1 = float(rng.uniform(0, 224 - size))
            dbidx.append(f * 2 + 5)
            zoom.append(zl)
            boxes.append((x1, y1, x1 + size, y1 + size))
            v = rng.normal(size=d).astype(np.float32)
            vecs.append(v / np.linalg.norm(v))
    meta, order = VectorMeta.from_arrays(
        np.array(dbidx), np.array(zoom), np.array(boxes, np.float32)
    )
    return np.stack(vecs)[order], meta


@pytest.mark.parametrize("device_dtype", ["int8", "bfloat16"])
def test_sharded_dtype_matches_single_chip(device_dtype):
    V, meta = _db()
    mesh = make_mesh(8)
    idx_m = MultiscaleIndex(
        vectors=V, meta=meta, device_dtype=device_dtype, mesh=mesh
    )
    idx_s = MultiscaleIndex(vectors=V, meta=meta, device_dtype=device_dtype)
    assert idx_m._sharded is not None
    assert idx_m._sharded.V.dtype == idx_s._V.dtype
    assert (idx_m._sharded.row_scale is not None) == (device_dtype == "int8")

    rng = np.random.default_rng(1)
    for trial in range(4):
        q = rng.normal(size=V.shape[1]).astype(np.float32)
        excl = BitMap(rng.choice(meta.frame_dbidx, size=6, replace=False))
        got = idx_m.query(vector=q, topk=7, shortlist_size=20,
                          exclude=BitMap(excl.to_array()))
        want = idx_s.query(vector=q, topk=7, shortlist_size=20,
                           exclude=BitMap(excl.to_array()))
        assert list(got["dbidxs"]) == list(want["dbidxs"])
        np.testing.assert_allclose(
            [a["score"] for a in got["activations"]],
            [a["score"] for a in want["activations"]], rtol=1e-5,
        )


def test_mesh_incremental_exclusion_grows_like_host_mask():
    """The device-persistent (S, Fs) mask + per-click delta equals a fresh
    host-rebuilt mask every round (the single-chip incremental contract,
    generalized to the mesh)."""
    V, meta = _db(seed=2)
    mesh = make_mesh(8)
    idx = MultiscaleIndex(vectors=V, meta=meta, mesh=mesh)
    ctrl = MultiscaleIndex(vectors=V, meta=meta, mesh=mesh)
    rng = np.random.default_rng(3)
    q = rng.normal(size=V.shape[1]).astype(np.float32)

    excl = BitMap()
    seen = []
    for r in range(6):
        got = idx.query(vector=q, topk=3, shortlist_size=15, exclude=excl)
        # control: a FRESH BitMap each round forces the full host rebuild
        want = ctrl.query(vector=q, topk=3, shortlist_size=15,
                          exclude=BitMap(excl.to_array()))
        assert list(got["dbidxs"]) == list(want["dbidxs"])
        for db in got["dbidxs"]:
            assert db not in seen  # no-repeat across rounds
            seen.append(int(db))
            excl.add(int(db))
    assert len(seen) == 18


def test_mesh_layout_alternation_stays_consistent():
    """Alternating rank_by_scores (flat mask layout) and query (sharded
    layout) on ONE mesh index + one growing BitMap must keep exclusion
    semantics exact (layout switches fall back to full rebuilds)."""
    V, meta = _db(seed=4)
    mesh = make_mesh(8)
    idx = MultiscaleIndex(vectors=V, meta=meta, mesh=mesh)
    rng = np.random.default_rng(5)
    q = rng.normal(size=V.shape[1]).astype(np.float32)
    scores = (V @ q).astype(np.float32)

    excl = BitMap()
    seen = set()
    for r in range(4):
        got_q = idx.query(vector=q, topk=2, shortlist_size=10, exclude=excl)
        for db in got_q["dbidxs"]:
            assert db not in seen
            seen.add(int(db)); excl.add(int(db))
        got_r = idx.rank_by_scores(scores, topk=2, shortlist_size=10,
                                   exclude=excl)
        for db in got_r["dbidxs"]:
            assert db not in seen
            seen.add(int(db)); excl.add(int(db))
    assert len(seen) == 16
