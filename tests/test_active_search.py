"""Active search: LKNN model analytics (ring graph), vectorized ENS vs the
generic tree-search oracle, NPB expectation, CEAS."""
import numpy as np
import pytest

from seesaw_tpu.loops.ens_search import (
    Result,
    efficient_nonmyopic_search,
    min_expected_cost_approx,
    npb_expectation,
)
from seesaw_tpu.loops.lknn_model import Dataset, LKNNModel, initial_gamma_array


def ring_model(n=8, gamma=0.2):
    nbr = np.stack([(np.arange(n) - 1) % n, (np.arange(n) + 1) % n], axis=1).astype(np.int32)
    ds = Dataset.from_vectors(np.zeros((n, 4)))
    return LKNNModel.from_dataset(ds, nbr=nbr, gamma=initial_gamma_array(gamma, n))


def test_lknn_conditioning_ring():
    m = ring_model()
    s0 = m.scores()
    np.testing.assert_allclose(s0, 0.2, atol=1e-4)

    m1 = m.condition(0, 1)
    s1 = m1.scores()
    # neighbors 1 and 7: (0 + 1 + gamma) / (0 + 1 + 1) = (1.2)/2 = 0.6
    assert s1[1] == pytest.approx(0.6, abs=1e-4)
    assert s1[7] == pytest.approx(0.6, abs=1e-4)
    assert s1[3] == pytest.approx(0.2, abs=1e-4)  # untouched
    # original model untouched (functional conditioning)
    np.testing.assert_allclose(m.scores(), s0)

    m0 = m.condition(0, 0)
    assert m0.scores()[1] == pytest.approx(0.1, abs=1e-4)  # (0+gamma)/2

    # in-place variant
    m.condition_(4, 1)
    assert m.scores()[3] == pytest.approx(0.6, abs=1e-4)
    assert 4 in m.dataset.seen_indices


def test_top_k_remaining_excludes_seen():
    m = ring_model()
    m.condition_(2, 1)
    idxs, scores = m.top_k_remaining(3)
    assert 2 not in idxs
    assert (np.diff(scores) <= 1e-12).all()
    # neighbors of 2 rank highest
    assert set(idxs[:2]) == {1, 3}


def test_probability_bound():
    m = ring_model()
    b = m.probability_bound(1)
    # (gamma + 1) / 2 at fresh vertices
    assert b == pytest.approx(1.2 / 2, abs=1e-4)


def test_vectorized_ens_matches_loop_oracle():
    m = ring_model(n=10, gamma=0.3)
    m.condition_(0, 1)
    m.condition_(5, 0)
    for t in (2, 3, 4):
        vec = efficient_nonmyopic_search(
            m, reward_horizon=t, lookahead_limit=2, pruning_on=False,
            implementation="vectorized",
        )
        loop = efficient_nonmyopic_search(
            m, reward_horizon=t, lookahead_limit=2, pruning_on=False,
            implementation="loop",
        )
        assert vec.value == pytest.approx(loop.value, abs=1e-4), f"t={t}"
        assert vec.index == loop.index, f"t={t}"


def test_lookahead1_greedy():
    m = ring_model()
    m.condition_(0, 1)
    res = efficient_nonmyopic_search(
        m, reward_horizon=1, lookahead_limit=1, pruning_on=False
    )
    assert res.index in (1, 7)


def test_pruned_loop_matches_unpruned():
    m = ring_model(n=8, gamma=0.25)
    m.condition_(3, 1)
    a = efficient_nonmyopic_search(
        m, reward_horizon=3, lookahead_limit=2, pruning_on=True, implementation="loop"
    )
    b = efficient_nonmyopic_search(
        m, reward_horizon=3, lookahead_limit=2, pruning_on=False, implementation="loop"
    )
    assert a.value == pytest.approx(b.value, abs=1e-6)
    assert a.index == b.index


def test_npb_expectation():
    # constant probability p: expectation of draws to r successes ~ r/p
    p = 0.25
    probs = np.full(200, p)
    e = npb_expectation(2, probs)
    assert e == pytest.approx(2 / p, abs=1.0)
    # certain successes: exactly r draws
    assert npb_expectation(3, np.ones(10)) == pytest.approx(3.0)


def test_ceas_picks_promising():
    m = ring_model(n=10, gamma=0.2)
    m.condition_(0, 1)
    res = min_expected_cost_approx(1, t=2, model=m, top_k=5)
    assert res.index in (1, 9)
    assert np.isfinite(res.value)
