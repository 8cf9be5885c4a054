"""int8 / bf16 device-dtype paths must preserve ranking vs float32."""
import numpy as np
import pytest

from seesaw_tpu.indices.meta import VectorMeta
from seesaw_tpu.indices.multiscale import MultiscaleIndex


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(0)
    n_frames, tiles, d = 60, 4, 32
    dbidx = np.repeat(np.arange(n_frames), tiles)
    zoom = np.tile([1, 1, 1, 2], n_frames)
    xy = rng.uniform(0, 100, size=(n_frames * tiles, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + 50], axis=1)
    meta, order = VectorMeta.from_arrays(dbidx, zoom, boxes)
    V = rng.normal(size=(n_frames * tiles, d)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return meta, V[order]


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_quantized_ranking_matches_f32(db, dtype):
    meta, V = db
    rng = np.random.default_rng(1)
    q = rng.normal(size=V.shape[1]).astype(np.float32)
    q /= np.linalg.norm(q)

    exact = MultiscaleIndex(vectors=V, meta=meta)
    quant = MultiscaleIndex(vectors=V, meta=meta, device_dtype=dtype)

    r_exact = exact.query(vector=q, topk=10, shortlist_size=30)
    r_quant = quant.query(vector=q, topk=10, shortlist_size=30)

    # top-10 sets overlap heavily; scores agree to quantization tolerance
    inter = set(r_exact["dbidxs"].tolist()) & set(r_quant["dbidxs"].tolist())
    assert len(inter) >= 8
    s_exact = {a["dbidx"]: a["score"] for a in r_exact["activations"]}
    s_quant = {a["dbidx"]: a["score"] for a in r_quant["activations"]}
    tol = 0.05 if dtype == "int8" else 0.02
    for dbx in inter:
        assert abs(s_exact[dbx] - s_quant[dbx]) < tol


def test_int8_score_frames(db):
    meta, V = db
    rng = np.random.default_rng(2)
    q = rng.normal(size=V.shape[1]).astype(np.float32)
    exact = MultiscaleIndex(vectors=V, meta=meta)
    quant = MultiscaleIndex(vectors=V, meta=meta, device_dtype="int8")
    np.testing.assert_allclose(
        quant.score_frames(q), exact.score_frames(q), atol=0.05
    )
