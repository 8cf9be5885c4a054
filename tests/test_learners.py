import numpy as np
import pytest

from seesaw_tpu.learners import LogisticRegression, RankRegression


def make_data(rng, n=60, d=8, sep=2.0):
    w = rng.normal(size=d)
    w /= np.linalg.norm(w)
    X = rng.normal(size=(n, d)).astype(np.float32)
    y = (X @ w + 0.1 * rng.normal(size=n) > 0).astype(np.float32)
    X[y == 1] += sep * 0.2 * w  # widen the margin a bit
    return X.astype(np.float32), y, w


def test_logistic_separates():
    rng = np.random.default_rng(0)
    X, y, w = make_data(rng)
    m = LogisticRegression(reg_lambda=1.0, regularizer_vector=w, verbose=False)
    m.fit(X, y)
    p = m.predict_proba(X).ravel()
    acc = ((p > 0.5) == y).mean()
    assert acc > 0.9
    # anchor regularizer keeps the coefficient near the query direction
    c = m.get_coeff()
    cos = c @ w / np.linalg.norm(c)
    assert cos > 0.7


def test_logistic_warm_start_stable():
    rng = np.random.default_rng(1)
    X, y, _ = make_data(rng)
    m = LogisticRegression(reg_lambda=10.0, regularizer_vector=None)
    m.fit(X, y)
    c1 = m.get_coeff()
    m.fit(X, y)  # warm start from same optimum: should stay put
    np.testing.assert_allclose(m.get_coeff(), c1, atol=1e-3)


def test_balanced_class_weights_affect_imbalanced_fit():
    rng = np.random.default_rng(2)
    X, y, _ = make_data(rng, n=100)
    # make positives rare
    keep = np.concatenate([np.where(y == 1)[0][:5], np.where(y == 0)[0]])
    Xs, ys = X[keep], y[keep]
    mb = LogisticRegression(class_weights="balanced", reg_lambda=1.0).fit(Xs, ys)
    mu = LogisticRegression(class_weights=1.0, reg_lambda=1.0).fit(Xs, ys)
    # balanced fit must score positives higher on average
    assert mb.predict_proba(Xs[ys == 1]).mean() > mu.predict_proba(Xs[ys == 1]).mean()


def test_rank_regression_orders():
    rng = np.random.default_rng(3)
    X, y, w = make_data(rng)
    m = RankRegression(reg_lambda=1.0, regularizer_vector=w)
    m.fit(X, y)
    s = m.score_raw(X)
    # positives should rank above negatives on average (AUC-ish check)
    assert s[y == 1].mean() > s[y == 0].mean() + 0.05


def test_intercept_uncentering():
    rng = np.random.default_rng(4)
    X, y, _ = make_data(rng)
    X += 5.0  # shift: centering must absorb this
    m = LogisticRegression(reg_lambda=1.0).fit(X, y)
    # predict_proba path and manual coeff/intercept path must agree
    logits = X @ m.get_coeff() + m.get_intercept()
    p = 1 / (1 + np.exp(-logits))
    np.testing.assert_allclose(p, m.predict_proba(X).ravel(), atol=1e-5)
