import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seesaw_tpu.ops.lbfgs import lbfgs_minimize


def test_quadratic():
    A = jnp.array([[3.0, 0.5], [0.5, 1.0]])
    b = jnp.array([1.0, -2.0])

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    res = lbfgs_minimize(f, jnp.zeros(2), max_iter=50)
    want = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-4)
    assert bool(res.converged)
    assert not bool(res.diverged)


def test_rosenbrock():
    def f(x):
        return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

    res = lbfgs_minimize(f, jnp.array([-1.2, 1.0]), max_iter=200)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)


def test_logistic_matches_sklearn():
    from sklearn.linear_model import LogisticRegression

    rng = np.random.default_rng(0)
    X = rng.normal(size=(80, 5)).astype(np.float32)
    w_true = rng.normal(size=5)
    y = (X @ w_true + 0.3 * rng.normal(size=80) > 0).astype(np.float32)

    lam = 1.0
    Xj, yj = jnp.array(X), jnp.array(y)

    def f(w):
        logits = Xj @ w
        ce = jnp.mean(jax.nn.softplus(logits) - yj * logits)
        return ce + lam / (2 * X.shape[0]) * w @ w

    res = lbfgs_minimize(f, jnp.zeros(5), max_iter=200)
    sk = LogisticRegression(C=1.0 / lam, fit_intercept=False, tol=1e-8).fit(X, y)
    np.testing.assert_allclose(np.asarray(res.x), sk.coef_.ravel(), atol=2e-3)


def test_inside_jit_and_divergence_flag():
    def f(x):
        return jnp.log(x[0])  # -> -inf as x -> 0+, grad explodes; NaN for x<0

    res = jax.jit(lambda x0: lbfgs_minimize(f, x0, max_iter=30))(jnp.array([2.0]))
    assert bool(res.diverged) or bool(res.converged) or int(res.n_iter) == 30


def test_already_optimal():
    def f(x):
        return (x ** 2).sum()

    res = lbfgs_minimize(f, jnp.zeros(3))
    assert int(res.n_iter) == 0 and bool(res.converged)
