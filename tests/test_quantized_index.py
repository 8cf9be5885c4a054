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


def _clip_like_vectors(rng, n, d, n_clusters=32):
    """Realistic CLIP-ish distribution: clustered unit vectors with an
    anisotropic common component (CLIP embeddings are strongly non-uniform)."""
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    common = rng.normal(size=d)
    common /= np.linalg.norm(common)
    which = rng.integers(0, n_clusters, size=n)
    V = 0.6 * centers[which] + 0.35 * common + 0.25 * rng.normal(size=(n, d))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return V.astype(np.float32)


def test_per_row_int8_shortlist_recall():
    """Quantization-error study (scaled-down; bench.py repeats at 10M on
    chip). The int8 scores only pick the shortlist — shortlisted frames are
    re-scored in f32 by the augmentation stage — so the ranking-safety
    property is: the f32 top-k must be CONTAINED in the int8 shortlist
    (5x oversized, the index default). Require >=99.9% containment with
    per-row scales, and per-row >= global-scale quality."""
    import jax.numpy as jnp

    from seesaw_tpu.ops.frame_scoring import scoring_matvec

    rng = np.random.default_rng(0)
    n, d, topk, shortlist = 200_000, 64, 10, 50
    V = _clip_like_vectors(rng, n, d)

    row_max = np.abs(V).max(axis=1)
    scales = (row_max / 127.0).astype(np.float32)
    V8 = np.clip(np.round(V / scales[:, None]), -127, 127).astype(np.int8)
    g_scale = float(np.abs(V).max()) / 127.0
    V8g = np.clip(np.round(V / g_scale), -127, 127).astype(np.int8)

    hits_row, hits_glob = 0, 0
    trials = 50
    for t in range(trials):
        q = _clip_like_vectors(rng, 1, d)[0]
        exact = np.argsort(-(V @ q))[:topk]
        s_row = np.asarray(scoring_matvec(jnp.asarray(V8), jnp.asarray(q), jnp.asarray(scales)))
        s_glob = np.asarray(scoring_matvec(jnp.asarray(V8g), jnp.asarray(q * g_scale)))
        hits_row += len(set(exact) & set(np.argsort(-s_row)[:shortlist]))
        hits_glob += len(set(exact) & set(np.argsort(-s_glob)[:shortlist]))

    recall_row = hits_row / (trials * topk)
    recall_glob = hits_glob / (trials * topk)
    assert recall_row >= 0.999, f"per-row int8 top-{topk} in shortlist: {recall_row}"
    assert recall_row >= recall_glob, (recall_row, recall_glob)


def test_from_path_auto_dtype(tmp_path, db):
    """Small saved indexes load exact f32; the auto-bf16 threshold guards
    HBM capacity for big ones (checked via the threshold arithmetic)."""
    meta, V = db
    from seesaw_tpu.indices.multiscale import MultiscaleIndex

    idx = MultiscaleIndex(vectors=V, meta=meta)
    idx.save(str(tmp_path / "ms"))
    loaded = MultiscaleIndex.from_path(str(tmp_path / "ms"))
    assert loaded.device_dtype == "float32"
    loaded2 = MultiscaleIndex.from_path(str(tmp_path / "ms"),
                                        device_dtype="bfloat16")
    assert loaded2.device_dtype == "bfloat16"
    # the auto rule flips at 4GB of f32
    assert (10_000_000 * 512 * 4) > 4 * 1024**3
