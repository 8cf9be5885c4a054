"""Temperature-regression research extra: learns separable classes, loss
decreases, temperatures stay positive."""
import numpy as np

from seesaw_tpu.research.looptest import TempRegression


def test_temp_regression_learns():
    rng = np.random.default_rng(0)
    C, D, n = 4, 16, 400
    centers = rng.normal(size=(C, D)) * 3
    y = rng.integers(0, C, size=n)
    X = centers[y] + rng.normal(size=(n, D))

    m = TempRegression(D, C, seed=0)
    losses = m.fit(X, y, epochs=300)
    assert losses[-1] < losses[0] * 0.5
    acc = (m.predict(X) == y).mean()
    assert acc > 0.95, acc
    assert (m.temperatures > 0).all()


def test_initial_weights_seed():
    rng = np.random.default_rng(1)
    W0 = rng.normal(size=(3, 8)).astype(np.float32)
    m = TempRegression(8, 3, initial_weights=W0)
    np.testing.assert_allclose(np.asarray(m.params.W), W0)
