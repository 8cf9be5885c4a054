"""Cross-check the sparse inversion gradient vs the dense jnp rank loss —
the reference's 3-way implementation test (pairwise_rank_loss_test.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seesaw_tpu.learners.vec_state import (
    VecState,
    compute_inversions,
    rank_loss_gradient,
)
from seesaw_tpu.ops import rank_loss as rl


def test_compute_inversions_cases():
    labs = np.array([1, 0, 1, 0], dtype=float)
    scores = np.array([4.0, 3.0, 2.0, 1.0])  # pos,neg,pos,neg correctly mixed
    inv = compute_inversions(labs, scores)
    # element 0 (top pos): 0 inversions; element 1 (neg above pos@2): 1
    assert inv.tolist() == [0, 1, 1, 0]
    # fully inverted
    inv2 = compute_inversions(np.array([0.0, 1.0]), np.array([2.0, 1.0]))
    assert inv2.tolist() == [1, 1]


def dense_grad(w, X, y, margin):
    """Autograd of mean pairwise hinge via the dense jnp loss."""
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    npairs = float((y == 1).sum() * (y == 0).sum())

    def loss(wj):
        s = Xj @ wj
        # hinge over (pos, neg) pairs with margin
        m = rl.pairwise_rank_loss_matrix(yj, s, margin=margin)
        # matrix counts each unordered pair twice (both directions)
        return m.sum() / (2 * npairs)

    return np.asarray(jax.grad(loss)(jnp.asarray(w)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sparse_gradient_matches_dense(seed):
    rng = np.random.default_rng(seed)
    n, d = 30, 8
    X = rng.normal(size=(n, d)).astype(np.float32)
    y = (rng.random(n) < 0.4).astype(np.float32)
    if y.sum() in (0, n):
        y[0] = 1 - y[0]
    w = rng.normal(size=d).astype(np.float32)
    w /= np.linalg.norm(w)

    grad, loss = rank_loss_gradient(w, X, y, margin=0.0)
    want = dense_grad(w, X, y, margin=0.0)
    np.testing.assert_allclose(grad, want, atol=1e-4)
    assert loss >= 0


def test_separated_data_zero_gradient():
    rng = np.random.default_rng(3)
    d = 6
    w = np.ones(d, dtype=np.float32) / np.sqrt(d)
    Xpos = np.abs(rng.normal(size=(5, d))).astype(np.float32) + 1
    Xneg = -np.abs(rng.normal(size=(5, d))).astype(np.float32) - 1
    X = np.concatenate([Xpos, Xneg])
    y = np.array([1.0] * 5 + [0.0] * 5, dtype=np.float32)
    grad, loss = rank_loss_gradient(w, X, y, margin=0.0)
    assert loss == 0.0 and (grad == 0).all()


def test_vec_state_improves_separation():
    rng = np.random.default_rng(4)
    d = 16
    target = rng.normal(size=d).astype(np.float32)
    target /= np.linalg.norm(target)
    X = rng.normal(size=(60, d)).astype(np.float32)
    y = (X @ target > 0).astype(np.float32)

    vs = VecState(rng.normal(size=d).astype(np.float32), margin=0.1, lr=0.5,
                  renormalize=True)
    def auc(w):
        s = X @ w
        return (s[y == 1].mean() - s[y == 0].mean())

    before = auc(vs.get_vec())
    for _ in range(30):
        vs.update(X, y)
    after = auc(vs.get_vec())
    assert after > before
