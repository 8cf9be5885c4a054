"""Analysis layer over real bench runs on the synthetic dataset."""
import numpy as np
import pandas as pd
import pytest

from seesaw_tpu import analysis
from seesaw_tpu.basic_types import BenchParams, IndexSpec, SessionParams
from seesaw_tpu.bench.harness import BenchRunner, get_all_session_summaries

from synth import build_synthetic_root, CATEGORY, QSTR


@pytest.fixture(scope="module")
def bench_results(tmp_path_factory):
    root = tmp_path_factory.mktemp("an_root")
    build_synthetic_root(str(root))
    results = tmp_path_factory.mktemp("an_results")
    br = BenchRunner(str(root), str(results), redirect_output=True)
    for method in ("plain", "random"):
        p = SessionParams(
            index_spec=IndexSpec(d_name="synth", i_name="multiscale"),
            interactive=method, batch_size=3, shortlist_size=20,
        )
        b = BenchParams(
            name=method, ground_truth_category=CATEGORY, qstr=QSTR,
            n_batches=8, max_results=6,
        )
        br.run_loop(b, p)
    df = get_all_session_summaries(str(results), force_recompute=True)
    return df


def test_summaries_and_metrics(bench_results):
    df = bench_results
    assert len(df) == 2
    mdf = analysis.add_metrics(df)
    assert "average_precision" in mdf.columns
    assert mdf["average_precision"].notna().all()


def test_side_by_side_and_comparison(bench_results):
    mdf = analysis.add_metrics(bench_results)
    mdf = mdf.assign(dataset="synth", category=CATEGORY)
    piv = analysis.side_by_side(mdf, "ndcg_score")
    assert set(piv.columns) == {"plain", "random"}
    cmp = analysis.better_same_worse(mdf, "ndcg_score", baseline="random", other="plain")
    assert cmp["n"] == 1
    # planted signal: plain should beat random
    assert cmp["better"] == 1 or cmp["mean_delta"] > 0
    means = analysis.method_means(mdf)
    assert "plain" in means.index


def test_action_log_timing(bench_results):
    from seesaw_tpu.basic_types import BenchSummary
    import json
    from pathlib import Path

    sd = bench_results.iloc[0]["session_path"]
    data = json.loads((Path(sd) / "summary.json").read_text())
    state = BenchSummary(**data).result.session
    log = analysis.action_log_frame(state)
    assert {"next.start", "next.end"} <= set(log.message)
    phases = analysis.phase_durations(state)
    assert (phases.duration >= 0).all()
    assert len(phases[phases.phase == "next"]) >= 1
    tl = analysis.accept_timeline(state)
    assert tl.elapsed.iloc[0] == 0
    # time to find 1 should exist for the plain run (it finds positives)
    if state.params.interactive == "plain":
        assert analysis.time_to_find_k(state, 1) is not None
