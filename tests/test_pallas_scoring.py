"""Pallas fused score+frame-max vs the XLA formulation (interpret mode)."""
import numpy as np
import pytest
import jax.numpy as jnp

from seesaw_tpu.ops.pallas_scoring import fused_frame_max


def make_db(rng, F=48, T=8, D=64, BF=1024):
    Fp = -(-F // BF) * BF
    V = rng.normal(size=(Fp * T, D)).astype(np.float32)
    valid = rng.random((F, T)) < 0.8
    valid[:, 0] = True  # every frame has at least one tile
    vz = np.zeros((Fp, T), dtype=bool)
    vz[:F] = valid
    V[~vz.reshape(-1)] = 0
    excluded = rng.random(F) < 0.2
    q = rng.normal(size=D).astype(np.float32)
    return V, valid, excluded, q


def xla_reference(V, valid, excluded, q):
    scores = V @ q
    F, T = valid.shape
    s = np.where(valid, scores[: F * T].reshape(F, T), -np.inf)
    fmax = s.max(axis=1)
    return np.where(excluded, -np.inf, fmax)


@pytest.mark.parametrize("block_frames", [1024])
def test_fused_matches_xla(block_frames):
    rng = np.random.default_rng(0)
    V, valid, excluded, q = make_db(rng)
    want = xla_reference(V, valid, excluded, q)
    got = np.asarray(
        fused_frame_max(
            jnp.asarray(V), jnp.asarray(valid), jnp.asarray(excluded),
            jnp.asarray(q), tile_bound=8, block_frames=block_frames,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_int8():
    rng = np.random.default_rng(1)
    V, valid, excluded, q = make_db(rng)
    # unit vectors: quantization tolerance scales with score magnitude
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    V = V / np.where(norms > 0, norms, 1.0)
    q = q / np.linalg.norm(q)
    scale = np.abs(V).max() / 127.0
    V8 = np.clip(np.round(V / scale), -127, 127).astype(np.int8)
    got = np.asarray(
        fused_frame_max(
            jnp.asarray(V8), jnp.asarray(valid), jnp.asarray(excluded),
            jnp.asarray(q * scale), tile_bound=8, block_frames=1024,
            interpret=True,
        )
    )
    want = xla_reference(V, valid, excluded, q)
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], atol=0.05)
    assert (got[~finite] == -np.inf).all()


def test_query_program_fused_matches_reference():
    from seesaw_tpu.ops import frame_scoring as fs
    from seesaw_tpu.ops.pallas_scoring import query_program_fused

    rng = np.random.default_rng(2)
    F, T, D = 40, 8, 32
    BF = 1024
    Fp = -(-F // BF) * BF
    V = rng.normal(size=(Fp * T, D)).astype(np.float32)
    valid = rng.random((F, T)) < 0.8
    valid[:, 0] = True
    vmask = np.zeros((Fp, T), dtype=bool)
    vmask[:F] = valid
    V[~vmask.reshape(-1)] = 0
    xy = rng.uniform(0, 100, size=(F * T, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + 40], axis=1)
    zoom = rng.integers(1, 4, size=F * T).astype(np.int32)
    excluded = rng.random(F) < 0.2
    q = rng.normal(size=D).astype(np.float32)

    want = fs.query_program(
        jnp.asarray(V[: F * T]), jnp.asarray(valid), jnp.asarray(boxes),
        jnp.asarray(zoom), jnp.asarray(q), None, jnp.asarray(excluded),
        shortlist_size=12, topk=5, aug_larger="all", aug_weight="level_max",
        agg_method="avg_score", max_zoom=4,
    )
    got = query_program_fused(
        jnp.asarray(V), jnp.asarray(valid), jnp.asarray(boxes),
        jnp.asarray(zoom), jnp.asarray(q), jnp.asarray(excluded),
        shortlist_size=12, topk=5, tile_bound=T, block_frames=BF,
        aug_larger="all", aug_weight="level_max", agg_method="avg_score",
        max_zoom=4, interpret=True,
    )
    assert int(got.n_valid) == int(want.n_valid)
    n = int(want.n_valid)
    np.testing.assert_array_equal(
        np.asarray(got.frame_ids)[:n], np.asarray(want.frame_ids)[:n]
    )
    np.testing.assert_allclose(
        np.asarray(got.frame_scores)[:n], np.asarray(want.frame_scores)[:n],
        rtol=1e-5,
    )
