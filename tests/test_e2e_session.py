"""Hermetic end-to-end sessions over the synthetic dataset: the canonical
integration test (the reference's equivalent needed a live Ray cluster;
SURVEY.md §4 'implication for the rebuild')."""
import numpy as np
import pytest

from seesaw_tpu.basic_types import BenchParams, IndexSpec, SessionParams
from seesaw_tpu.bench.harness import BenchRunner, benchmark_loop, process_single_result
from seesaw_tpu.metrics import compute_metrics
from seesaw_tpu.session import make_session
from seesaw_tpu.runtime.bitmap import FrozenBitMap

from synth import build_synthetic_root, QSTR, CATEGORY


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("seesaw_root")
    gdm, ds, info = build_synthetic_root(str(root))
    return str(root), info


def _params(method="plain", batch_size=3, **opts):
    return SessionParams(
        index_spec=IndexSpec(d_name="synth", i_name="multiscale"),
        interactive=method,
        batch_size=batch_size,
        shortlist_size=20,
        agg_method="avg_score",
        aug_larger="all",
        interactive_options=opts or None,
    )


def _bench(n_batches=12, max_results=8):
    return BenchParams(
        name="test",
        ground_truth_category=CATEGORY,
        qstr=QSTR,
        n_batches=n_batches,
        max_results=max_results,
    )


def _run(root, p, b):
    import seesaw_tpu.dataset as dsm

    gdm = dsm.GlobalDataManager(root)
    ret = make_session(gdm, p, b=b)
    ds = ret["dataset"]
    box_table, qgt = ds.load_ground_truth()
    run_info = benchmark_loop(
        session=ret["session"],
        subset=FrozenBitMap(ds.dbidxs),
        box_table=box_table,
        b=b,
        p=p,
    )
    return ret["session"], run_info, qgt


def test_plain_session_finds_positives(synth_root):
    root, info = synth_root
    session, run_info, qgt = _run(root, _params("plain"), _bench())
    # planted signal: text-vector ranking must beat random by a wide margin
    nseen = run_info["nseen"]
    nfound = run_info["nfound"]
    assert nseen > 0
    base_rate = info["is_pos"].mean()
    assert nfound / nseen > 2 * base_rate
    # all returned images distinct and within the dataset
    flat = [im.dbidx for batch in session.get_state().gdata for im in batch]
    assert len(flat) == len(set(flat))


def test_logreg_feedback_improves_on_plain(synth_root):
    root, info = synth_root
    b = _bench(n_batches=15, max_results=12)
    _, plain_info, _ = _run(root, _params("plain"), b)
    _, lr_info, _ = _run(
        root, _params("log_reg2", reg_lambda=10.0, max_iter=50), b
    )
    # logistic feedback should find at least as many in no more batches seen
    assert lr_info["nfound"] >= plain_info["nfound"] - 1


def test_rocchio_runs(synth_root):
    root, _ = synth_root
    b = _bench(n_batches=6, max_results=5)
    _, info, _ = _run(
        root,
        _params("rocchio_update", rocchio_alpha=1.0, rocchio_beta=0.7,
                rocchio_gamma=0.3),
        b,
    )
    assert info["nseen"] > 0


def test_random_loop_runs(synth_root):
    root, _ = synth_root
    _, info, _ = _run(root, _params("random"), _bench(n_batches=4, max_results=100))
    assert info["nseen"] == 12  # 4 batches x 3


def test_start_policy_gates_refine(synth_root):
    root, _ = synth_root
    p = _params("log_reg2", reg_lambda=10.0)
    p.start_policy = "after_first_positive_and_negative"
    _, info, _ = _run(root, p, _bench(n_batches=8, max_results=6))
    assert info["nseen"] > 0


LABEL_PROP_PARAMS = dict(
    matrix_options=dict(knn_path="", knn_k=8, edist=0.5),
    normalize_scores=True,
    normalize_epsilon=0.1,
    sigmoid_before_propagate=True,
    calib_a=2.0,
    calib_b=-0.5,
    prior_weight=1.0,
)


def test_knn_prop2_session(synth_root):
    root, info = synth_root
    p = _params("knn_prop2")
    p.interactive_options = LABEL_PROP_PARAMS
    _, run_info, _ = _run(root, p, _bench(n_batches=10, max_results=8))
    assert run_info["nseen"] > 0
    base_rate = info["is_pos"].mean()
    assert run_info["nfound"] / run_info["nseen"] > base_rate


def test_pseudo_lr_session(synth_root):
    root, _ = synth_root
    p = _params("pseudo_lr")
    p.interactive_options = dict(
        label_prop_params=LABEL_PROP_PARAMS,
        log_reg_params=dict(reg_lambda=10.0, max_iter=50),
        switch_over=True,
        real_sample_weight=5.0,
        sample_size=20,
    )
    _, run_info, _ = _run(root, p, _bench(n_batches=8, max_results=6))
    assert run_info["nseen"] > 0


MULTI_REG_OPTS = dict(
    matrix_options=dict(knn_path="", knn_k=8, edist=0.5),
    label_loss_type="pairwise_rank_loss",
    rank_loss_margin=0.0,
    pos_weight="balanced",
    reg_data_lambda=0.1,
    reg_norm_lambda=10.0,
    reg_query_lambda=1.0,
    max_iter=50,
)


def test_multi_reg_session(synth_root):
    root, info = synth_root
    p = _params("multi_reg")
    p.interactive_options = MULTI_REG_OPTS
    _, run_info, _ = _run(root, p, _bench(n_batches=10, max_results=8))
    assert run_info["nseen"] > 0
    base_rate = info["is_pos"].mean()
    assert run_info["nfound"] / run_info["nseen"] > base_rate


def test_multi_reg_ce_session(synth_root):
    root, _ = synth_root
    p = _params("multi_reg")
    p.interactive_options = {**MULTI_REG_OPTS, "label_loss_type": "ce_loss"}
    _, run_info, _ = _run(root, p, _bench(n_batches=6, max_results=5))
    assert run_info["nseen"] > 0


def test_multi_reg_neg_session(synth_root):
    root, _ = synth_root
    p = _params("multi_reg_neg")
    p.interactive_options = dict(
        reg_norm_lambda=10.0, reg_query_lambda=1.0, max_iter=50,
        discount_neg=True,
    )
    _, run_info, _ = _run(root, p, _bench(n_batches=6, max_results=5))
    assert run_info["nseen"] > 0


def test_lknn_search_session(synth_root):
    root, _ = synth_root
    p = _params("lknn", batch_size=1)
    p.interactive_options = dict(
        matrix_options=dict(knn_path="", knn_k=8, edist=0.5),
        gamma=0.15,
        use_clip_as_gamma=False,
    )
    _, run_info, _ = _run(root, p, _bench(n_batches=10, max_results=4))
    assert run_info["nseen"] == 10 or run_info["nfound"] >= 4


def test_active_search_session(synth_root):
    root, info = synth_root
    p = _params("active_search", batch_size=1)
    p.interactive_options = dict(
        matrix_options=dict(knn_path="", knn_k=8, edist=0.5),
        gamma=dict(mode="fixed", value=0.15),
        reward_horizon=5,
        adjust_horizon=False,
        pruning_on=False,
        implementation="vectorized",
    )
    _, run_info, _ = _run(root, p, _bench(n_batches=12, max_results=5))
    assert run_info["nseen"] > 0


def test_bench_runner_writes_summary(synth_root, tmp_path):
    root, _ = synth_root
    results = tmp_path / "results"
    results.mkdir()
    br = BenchRunner(root, str(results), redirect_output=True)
    out_dir = br.run_loop(_bench(n_batches=5, max_results=4), _params("plain"))
    row = process_single_result(out_dir)
    assert row["has_result"]
    assert row["nseen"] > 0
    m = compute_metrics(
        hit_indices=row["hit_indices"],
        batch_size=3,
        nseen=row["nseen"],
        ntotal=row["ntotal"],
        max_results=4,
    )
    assert 0 <= m["average_precision"] <= 1

    # the parquet CACHE must keep the per-session arrays: add_metrics on a
    # CACHED load previously crashed (hit_indices was dropped at write)
    from seesaw_tpu.analysis import add_metrics, method_means
    from seesaw_tpu.bench.harness import get_all_session_summaries

    fresh = get_all_session_summaries(str(results))
    cached = get_all_session_summaries(str(results))  # parquet round-trip
    mm_f = method_means(add_metrics(fresh))
    mm_c = method_means(add_metrics(cached))
    assert (mm_f.values == mm_c.values).all()


def test_session_state_roundtrip(synth_root):
    root, _ = synth_root
    session, _, _ = _run(root, _params("plain"), _bench(n_batches=3, max_results=3))
    state = session.get_state()
    js = state.model_dump_json()
    from seesaw_tpu.basic_types import SessionState

    state2 = SessionState.model_validate_json(js)
    assert state2.query_string == QSTR
    assert len(state2.gdata) == len(state.gdata)
