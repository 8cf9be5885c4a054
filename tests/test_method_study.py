"""Method-comparison metric study (scaled down): feedback methods must beat
the zero-shot baseline on ranking metrics END-TO-END through the real bench
harness — the repo's miniature of the reference's `figures/breakdown.parquet`
quality evidence (SURVEY §6). The committed full-size artifact is
docs/method_study.json (scripts/run_method_study.py)."""
import numpy as np
import pytest

from seesaw_tpu.bench.study import (
    TIERS,
    build_study_corpus,
    run_study,
    study_tables,
)


@pytest.fixture(scope="module")
def study_frame(tmp_path_factory):
    wd = tmp_path_factory.mktemp("study")
    root = str(wd / "root")
    _, _, categories = build_study_corpus(
        root, n_images=240, n_pos_per_cat=14, instances_per_tier=1, seed=0
    )
    df = run_study(
        root, str(wd / "results"),
        methods=("plain", "rocchio_update", "log_reg2", "active_search"),
        n_batches=25, max_results=13,
    )
    return df, categories


def test_corpus_shape(study_frame):
    df, categories = study_frame
    assert sorted(categories.values()) == sorted(TIERS)
    assert len(df) == 4 * 3  # methods x categories
    assert (df.ntotal == 14).all()


def test_feedback_beats_zero_shot(study_frame):
    df, _ = study_frame
    means = df.groupby("variant")["ndcg_score"].mean()
    assert means["log_reg2"] > means["plain"] + 0.01, means
    assert means["active_search"] > means["plain"] + 0.01, means
    # never worse per-query (within tolerance)
    piv = df.pivot_table(index="category", columns="variant",
                         values="ndcg_score")
    assert (piv["log_reg2"] >= piv["plain"] - 1e-6).all(), piv


def test_gains_concentrate_in_hard_tier(study_frame):
    """The corpus difficulty gradient shows up where the paper's does: the
    hard tier's zero-shot nDCG is lowest and its feedback delta largest."""
    df, categories = study_frame
    df = df.assign(tier=df.category.map(categories))
    piv = df.pivot_table(index="tier", columns="variant",
                         values="ndcg_score")
    delta = piv["log_reg2"] - piv["plain"]
    assert piv.loc["hard", "plain"] <= piv.loc["easy", "plain"] + 1e-6
    assert delta["hard"] >= delta["easy"] - 1e-6
    assert delta["hard"] > 0.02, delta


def test_study_tables_artifact_shape(study_frame):
    df, categories = study_frame
    tables = study_tables(df, categories)
    assert tables["n_sessions"] == len(df)
    assert set(tables["overall"]) == set(df.variant.unique())
    bsw = tables["better_same_worse_ndcg_vs_plain"]
    assert "plain" not in bsw and "log_reg2" in bsw
    lr = bsw["log_reg2"]
    assert lr["better"] + lr["same"] + lr["worse"] == lr["n"] == 3
