"""Hermetic (CPU, tiny sizes) coverage for the driver bench CLI (bench.py):
the donated-fill database builder, the shared recall generator's 'both'
mode, and the chained rerank/finetune measurement paths the driver runs on
the real chip."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_build_db_int8_donated_fill():
    # the int8 database is built by a donate_argnums dynamic_update_slice
    # fill (concatenating chunks holds 2x the final array on device and
    # OOMed the 20M capacity probe) — every chunk region must be filled,
    # deterministically
    import jax.numpy as jnp

    n = 16 * 1024 * bench.TILES  # n_chunks=16 divides; 1024-frame padding
    V, valid, boxes, zoom, row_scale, n_frames = bench.build_db(
        n, d=32, dtype="int8"
    )
    assert V.dtype == jnp.int8 and V.shape == (n, 32)
    assert n_frames * bench.TILES == n
    rows = n // 16
    arr = np.asarray(V)
    for c in range(16):  # random bits: an all-zero chunk means it was missed
        assert np.any(arr[c * rows:(c + 1) * rows] != 0), f"chunk {c} unfilled"
    V2 = bench.build_db(n, d=32, dtype="int8")[0]
    np.testing.assert_array_equal(arr, np.asarray(V2))
    assert row_scale is not None and row_scale.shape == (n,)


def test_recall_at_scale_both_equals_separate_runs():
    # scale='both' shares one generated database across the two
    # quantizations; it must reproduce the separate runs key-for-key
    out_both = bench.bench_int8_recall_at_scale(65536, d=64, trials=3,
                                                scale="both")
    out_row = bench.bench_int8_recall_at_scale(65536, d=64, trials=3,
                                               scale="row")
    out_frame = bench.bench_int8_recall_at_scale(65536, d=64, trials=3,
                                                 scale="frame")
    assert out_both == {**out_row, **out_frame}
    assert any(k.endswith("_framescale") for k in out_both)
    assert any(not k.endswith("_framescale") for k in out_both)


@pytest.mark.parametrize("dtype", ["int8", "bfloat16"])
def test_rerank_chain_smoke(dtype):
    # the full rerank measurement path (build -> single query -> wall loop
    # -> 32-query chain) at a tiny size; use_pallas=False (CPU)
    out = bench.bench_rerank(16 * 1024 * bench.TILES, dtype=dtype,
                             use_pallas=False)
    assert out["device_ms"] > 0 and out["p50_ms"] > 0
    assert out["n_vectors"] == 16 * 1024 * bench.TILES


def test_graph_session_smoke():
    # the KnnProp2 serving-round stage end-to-end at tiny size: device-built
    # index (from_device_arrays, no host vector mirror), device score(),
    # rank_by_scores without a host padding plan, ranker propagation, and
    # the no-repeat contract across rounds — both plain and windowed-SpMV
    out = bench.bench_graph_session(n_tiles=1024 * bench.TILES, rounds=4)
    assert out["p50_session_round_ms_knnprop2_1M"] > 0
    assert out["p50_session_round_ms_knnprop2_1M_windowed"] > 0
    # warm-start drive (same fused program, resumed start iterate) + the
    # per-round Jacobi iteration observability
    assert out["p50_session_round_ms_knnprop2_1M_warm"] > 0
    assert out["jacobi_iters_per_round_warm"] >= 1
    assert out["jacobi_iters_per_round"] >= out["jacobi_iters_per_round_warm"]
    # rounds 0-1 pay the plain-rank and fused propagate+rank compiles
    assert out["knnprop2_rounds_measured"] == 2


def test_graph_10M_stage_smoke():
    # the headline-scale graph stage end-to-end at tiny size (CPU interpret
    # kernels): N-scaled slot budget -> sampled selection -> chunked device
    # layout build -> routed overflow -> windowed propagation -> cold+warm
    # fused KnnProp2 drives on the co-resident int8 database
    out = bench.bench_graph_10M(target_tiles=1024 * bench.TILES, rounds=4,
                                reps=(1, 1))
    assert out["graph_10M_coverage"] > 0.5
    assert out["propagation_ms_per_iter_10M_windowed"] > 0
    assert out["p50_propagation_ms_10M_windowed"] > 0
    assert out["p50_session_round_ms_knnprop2_10M_windowed"] > 0
    assert out["p50_session_round_ms_knnprop2_10M_windowed_warm"] > 0
    assert out["knnprop2_10M_rounds_measured"] == 2


def test_finetune_harness_smoke():
    # the shared fine-tune measurement harness (also used by
    # scripts/probe_fused_attention_bwd.py) on the tiny CLIP variant
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.models.clip import ClipEmbedding

    emb = ClipEmbedding(variant="test")
    params = jax.tree.map(jnp.asarray, emb.params)
    rate = bench.finetune_pairs_per_s(emb.model, params, B=4, iters=2,
                                      reps=1)
    assert rate > 0


def test_last_good_record_roundtrip(tmp_path, monkeypatch):
    # a value-null record (outage/timeout) must carry the most recent
    # full-scale record, clearly labeled; quick-mode and env-skip runs
    # must never overwrite it
    import copy
    import json

    monkeypatch.setattr(bench, "_LAST_GOOD_PATH",
                        str(tmp_path / "last_good.json"))
    rec = {"metric": "p50_rerank_device_ms_10M_vectors", "value": 11.6,
           "unit": "ms", "vs_baseline": 4.3,
           "extras": {"n_vectors": 9_994_240}}
    bench._save_last_good(rec)
    extras = {}
    bench._attach_last_good(extras)
    assert extras["last_good_record"]["record"]["value"] == 11.6
    assert "NOT a fresh measurement" in extras["last_good_note"]

    quick = copy.deepcopy(rec)
    quick["extras"]["n_vectors"] = 2_000_000
    quick["value"] = 3.3
    bench._save_last_good(quick)
    envskip = copy.deepcopy(rec)
    envskip["extras"]["skipped_clip"] = "env"
    envskip["value"] = 9.9
    bench._save_last_good(envskip)
    saved = json.load(open(bench._LAST_GOOD_PATH))
    assert saved["record"]["value"] == 11.6  # guards held

    # no file -> attach is a silent no-op
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH",
                        str(tmp_path / "missing.json"))
    extras2 = {}
    bench._attach_last_good(extras2)
    assert "last_good_record" not in extras2


def test_ens_stage_smoke(monkeypatch):
    out = bench.bench_ens(n_tiles=4096, D=8, horizon=5)
    assert out["ens_lookahead_ms_1M"] > 0
    assert out["ens_horizon"] == 5
