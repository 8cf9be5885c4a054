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


# -- figures-layer tables (reference figures.py:201-345) ---------------------
def _stats_frame():
    rng = np.random.default_rng(0)
    rows = []
    for ds in ("bdd", "coco"):
        for cat in "abcdefgh":
            base = float(rng.uniform(0.02, 0.9))
            for variant, boost in (("baseline", 1.0), ("seesaw", 1.3)):
                rows.append(dict(dataset=ds, category=cat, variant=variant,
                                 average_precision=min(base * boost, 1.0)))
    return pd.DataFrame(rows)


def test_side_by_side_comparison_and_bsw():
    from seesaw_tpu.analysis import bsw_table, side_by_side_comparison

    stats = _stats_frame()
    sbs = side_by_side_comparison(
        stats, baseline_variant="baseline", metric="average_precision"
    )
    assert {"base", "ratio", "delta"} <= set(sbs.columns)
    base_rows = sbs[sbs.variant == "baseline"]
    assert np.allclose(base_rows.ratio, 1.0)

    bsw = bsw_table(sbs, variant="seesaw", metric="average_precision", reltol=1.05)
    assert set(bsw.columns) == {"better", "same", "worse", "total"}
    # seesaw is uniformly 1.3x baseline (capped at 1.0) -> mostly better
    assert bsw.loc["total", "better"] >= bsw.loc["total", "worse"]


def test_summary_breakdown_and_tables(tmp_path):
    from seesaw_tpu.analysis import (
        ablation_table,
        comparison_table,
        rel_plot,
        side_by_side_comparison,
        summary_breakdown,
    )

    stats = _stats_frame()
    mid = stats[stats.variant == "baseline"].assign(
        variant="multiscale",
        average_precision=lambda d: np.minimum(d.average_precision * 1.15, 1.0),
    )
    stats = pd.concat([stats, mid], ignore_index=True)
    sbs = side_by_side_comparison(
        stats, baseline_variant="baseline", metric="average_precision"
    )
    tot = summary_breakdown(sbs, "average_precision")
    assert "counts" in tot.index
    assert set(tot.columns) <= {".1", ".3", "1."}

    comp = comparison_table(tot, variant="seesaw", baseline_variant="baseline")
    assert list(comp.index) == ["counts", "baseline", "this work", "ratio"]
    assert (comp.loc["ratio"].dropna() >= 1.0).all()

    abl = ablation_table(tot, ["baseline", "multiscale", "seesaw"])
    assert "+ feedback fusion" in abl.index
    assert any(c.endswith("delta") for c in abl.columns)

    out = rel_plot(sbs, variant="seesaw", metric="average_precision",
                   out_path=str(tmp_path / "rel.png"))
    assert (tmp_path / "rel.png").exists()


# -- user-study session-log analysis (reference user_data_analysis.py) -------
def _fake_session(session_id, qkey, mode, accepts, duration, t0=1000.0,
                  path="/tmp/s1/"):
    log = [
        dict(logger="client", message="init", time=t0, seen=0, accepted=0),
        dict(logger="client", message="task.started", time=t0 + 1, seen=0, accepted=0),
    ]
    t = t0 + 1
    for i, dt in enumerate(accepts):
        t += dt
        log.append(dict(logger="client", message="selection.start", time=t - 0.5,
                        seen=i, accepted=i, other_fields={"i": 0, "j": i}))
        log.append(dict(logger="client", message="selection.end", time=t - 0.1,
                        seen=i + 1, accepted=i, other_fields={"i": 0, "j": i}))
        log.append(dict(logger="client", message="accept", time=t, seen=i + 1,
                        accepted=i + 1))
    log.append(dict(logger="client", message="task.end", time=t0 + 1 + duration,
                    seen=len(accepts), accepted=len(accepts)))
    return {
        "session_path": path,
        "session": {
            "params": {
                "other_params": {"session_id": session_id, "qkey": qkey, "mode": mode}
            },
            "action_log": log,
            "gdata": [],
        },
    }


def test_user_analysis_tables():
    from seesaw_tpu.user_analysis import (
        bootstrap_stat,
        compute_session_tables,
        find_k_intervals,
        get_session_summaries,
        process_action_log,
    )

    sessions = [
        _fake_session("s1", "pc", "plain", [5, 10, 20], 60, path="/tmp/a/"),
        _fake_session("s2", "pc", "seesaw", [2, 3, 4], 30, path="/tmp/b/"),
        # timed-out session: only 1 accept, censored at 6 min
        _fake_session("s3", "pc", "plain", [100], 60 * 6 + 5, path="/tmp/c/"),
    ]
    df = get_session_summaries(sessions)
    assert len(df) == 3 and set(df.session_id) == {"s1", "s2", "s3"}

    log_res = process_action_log(sessions[0]["session"]["action_log"])
    # timeline starts at accepted=0 (reference convention) then 1, 2, 3
    assert [e["accepted"] for e in log_res["accepted_timeline"]] == [0, 1, 2, 3]
    assert len(log_res["per_image_times"]) == 3

    tables = compute_session_tables(sessions)
    assert len(tables["adf"]) == 3
    acc = tables["accept_df"]
    # censored session got padded up to accepted=10 at 360s
    censored = acc[(acc.session_id == "s3") & (acc.accepted == 10)]
    assert len(censored) == 1 and censored.elapsed_time.iloc[0] == 360

    iv = find_k_intervals(acc, k=2)
    assert {"qkey", "mode", "lower", "med", "high"} <= set(iv.columns)
    plain = iv[iv["mode"] == "plain"]
    seesaw = iv[iv["mode"] == "seesaw"]
    assert seesaw.med.iloc[0] < plain.med.iloc[0]  # seesaw finds 2 faster

    bs = bootstrap_stat(pd.Series([1.0, 2.0, 3.0, 4.0]), n_resamples=500)
    assert bs.lower.iloc[0] <= bs.med.iloc[0] <= bs.high.iloc[0]


def test_bench_to_figures_workflow(bench_results):
    """Full eval workflow: bench summaries -> metrics -> comparison tables
    (the reference's seesaw_bench -> figures.py path)."""
    stats = analysis.add_metrics(bench_results)  # has variant/dataset/category
    sbs = analysis.side_by_side_comparison(
        stats, baseline_variant="random", metric="average_precision"
    )
    assert len(sbs) == 2
    plain = sbs[sbs.variant == "plain"]
    assert float(plain.ratio.iloc[0]) >= 1.0  # plain CLIP beats random order

    bsw = analysis.bsw_table(
        sbs, variant="plain", metric="average_precision", reltol=1.01
    )
    assert bsw.loc["total", "total"] == 1  # one (dataset, category) pair


def test_image_view_timeline_from_timing(tmp_path):
    """Frontend-recorded Imdata.timing intervals -> per-image view timeline
    (reference linear_gdata, user_data_analysis.py:159-189): first interval
    per image, sorted by view start, running accepted count, summary
    metadata attached — driven through a REAL saved session."""
    import json as _json

    from seesaw_tpu.dataset import GlobalDataManager
    from seesaw_tpu.session import make_session
    from seesaw_tpu.basic_types import Box
    from seesaw_tpu.user_analysis import image_view_timeline, load_session_data

    root = tmp_path / "root"
    build_synthetic_root(str(root), dataset_name="tl")
    gdm = GlobalDataManager(str(root))
    p = SessionParams(
        index_spec=IndexSpec(d_name="tl", i_name="multiscale"),
        interactive="plain", batch_size=3, shortlist_size=15,
    )
    sess = make_session(gdm, p)["session"]
    sess.set_text(QSTR)
    import time as _time

    t0 = int(_time.time() * 1000)  # frontend clock (absolute ms)
    for r in range(2):
        sess.next()
        state = sess.get_state()
        for j, im in enumerate(state.gdata[-1]):
            im.boxes = (
                [Box(x1=0, y1=0, x2=50, y2=50, marked_accepted=True)]
                if j == 0 else []
            )
            # the modal open/close interval the frontend records
            ms = t0 + (r * 3 + j) * 2000
            im.timing = [dict(start_ms=ms, end_ms=ms + 1500)]
        sess.update_state(state)
        sess.refine()

    out = tmp_path / "saved"
    out.mkdir()
    (out / "summary.json").write_text(_json.dumps(
        {"session": sess.get_state().model_dump()}
    ))
    sessions = load_session_data(str(tmp_path))
    assert len(sessions) == 1
    df = image_view_timeline(sessions[0])
    # 6 viewed images + the t=0 anchor row
    assert len(df) == 7
    views = df[df.i >= 0]
    assert len(views) == 6
    assert (views.end_s - views.start_s).round(3).eq(1.5).all()
    assert views.start_s.is_monotonic_increasing
    assert int(df.total_accepted.iloc[-1]) == 2  # one accept per round
    assert df.accepted.sum() == 2
