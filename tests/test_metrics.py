import numpy as np
import pytest

from seesaw_tpu import metrics


def test_average_precision_perfect_prefix():
    # first 3 results are the only 3 positives found, max_results=3 => perfect
    assert metrics.average_precision(
        np.array([0, 1, 2]), npositive=4, max_results=3
    ) == pytest.approx(1.0)


def test_average_precision_truncation():
    # hits beyond max_results are ignored
    full = metrics.average_precision(np.array([0, 5]), npositive=2, max_results=1)
    assert full == pytest.approx(1.0)


def test_average_precision_missing_positives_score_zero():
    # only 1 of 2 positives found at rank 1: mean(1/1, 2/inf) = .5
    ap = metrics.average_precision(np.array([0]), npositive=2)
    assert ap == pytest.approx(0.5)


def test_average_precision_generic():
    # hits at seen-positions 1 and 3 (ranks 2, 4), npositive=2
    ap = metrics.average_precision(np.array([1, 3]), npositive=2)
    assert ap == pytest.approx((1 / 2 + 2 / 4) / 2)


def test_dcg_and_ndcg():
    hits = np.array([0, 1])
    assert metrics.dcg_score(hits) == pytest.approx(1 / np.log2(2) + 1 / np.log2(3))
    # best possible given 10 seen, 2 positives is hits at 0,1 -> ndcg == 1
    assert metrics.ndcg_score(hits, nseen=10, npositive=2) == pytest.approx(1.0)
    worse = metrics.ndcg_score(np.array([3, 8]), nseen=10, npositive=2)
    assert 0 < worse < 1.0


def test_rank_kth_batch():
    hits = np.array([4, 7])
    out = metrics.rank_kth(hits, ntotal=3, ks=np.array([1, 2, 3, 10]))
    assert out[0] == 5 and out[1] == 8
    assert out[2] == np.inf  # 3rd positive exists but never found
    assert np.isnan(out[3])  # ntotal < 10: not applicable


def test_compute_metrics_smoke():
    m = metrics.compute_metrics(
        hit_indices=np.array([0, 2]), batch_size=3, nseen=9, ntotal=4, max_results=10
    )
    assert m["nfound"] == 2
    assert m["rank_first"] == 1
    assert m["reciprocal_rank"] == pytest.approx(1.0)
    assert 0 < m["average_precision"] <= 1
    assert 0 < m["ndcg_score"] <= 1


def test_average_reciprocal_gap():
    # hits at ranks 1,3: gaps 1,2 -> mean(1/1, 1/2) over max_results=2
    v = metrics.average_reciprocal_gap(np.array([0, 2]), npositive=2)
    assert v == pytest.approx(0.75)
