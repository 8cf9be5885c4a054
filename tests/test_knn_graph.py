"""Graph stack tests: exact kNN, symmetric weights, Laplacian, propagation."""
import numpy as np
import pytest

from seesaw_tpu.knn_graph import (
    KNNGraph,
    rbf_kernel,
    symmetrize_weights,
)
from seesaw_tpu.label_propagation import LabelPropagation
from seesaw_tpu.loops.knn_methods import (
    LabelPropagationRanker2,
    SimpleKNNRanker,
    normalize_scores,
    sigmoid,
)


def brute_knn(V, k):
    d = 1.0 - V @ V.T
    np.fill_diagonal(d, np.inf)
    idx = np.argsort(d, axis=1)[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


def test_exact_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    V = rng.normal(size=(500, 32)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    g = KNNGraph.build(V, n_neighbors=10, block_size=128)
    want_idx, want_dist = brute_knn(V, 10)
    np.testing.assert_allclose(g.dist, np.clip(want_dist, 0, None), atol=1e-4)
    # ids can differ on exact distance ties; compare via distances above and
    # spot-check id agreement rate
    agree = (g.dst == want_idx).mean()
    assert agree > 0.99


def test_knn_graph_save_load(tmp_path):
    rng = np.random.default_rng(1)
    V = rng.normal(size=(50, 8)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    g = KNNGraph.build(V, n_neighbors=5)
    g.save(tmp_path / "knng")
    g2 = KNNGraph.from_file(tmp_path / "knng")
    np.testing.assert_array_equal(g.dst, g2.dst)
    np.testing.assert_allclose(g.dist, g2.dist, atol=1e-6)
    assert g2.restrict_k(k=3).k == 3


def _two_node_graph(distance):
    # 0 <-> 1 at the given distance
    dst = np.array([[1], [0]], dtype=np.int32)
    dist = np.array([[distance], [distance]], dtype=np.float32)
    return KNNGraph(dst, dist)


def test_laplacian_edge_loss_extremes():
    """Analytic 2-node test mirroring the reference's inline
    `test_simple_edge_loss` (knn_graph.py:109-134)."""
    g = _two_node_graph(1.0)
    w_wide = symmetrize_weights(g, rbf_kernel(10000.0))  # weight ~ 1
    assert w_wide.laplacian_quadratic(np.array([0.0, 0.0])) == pytest.approx(0)
    assert w_wide.laplacian_quadratic(np.array([1.0, 1.0])) == pytest.approx(0)
    assert w_wide.laplacian_quadratic(np.array([0.0, 1.0])) == pytest.approx(1.0, abs=1e-3)

    w_narrow = symmetrize_weights(g, rbf_kernel(0.0001))  # weight ~ 0
    assert w_narrow.laplacian_quadratic(np.array([0.0, 1.0])) == pytest.approx(0, abs=1e-3)


def test_symmetrize_vs_scipy_reference():
    """Weights must match the reference's W+W^T edge-count-corrected CSR."""
    import scipy.sparse as sp

    rng = np.random.default_rng(2)
    V = rng.normal(size=(40, 8)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    g = KNNGraph.build(V, n_neighbors=4)
    kfun = rbf_kernel(0.3)
    sym = symmetrize_weights(g, kfun)

    # scipy oracle following the reference construction
    n = g.nvecs
    src = np.repeat(np.arange(n), g.k)
    dst = g.dst.reshape(-1)
    w = kfun(g.dist.reshape(-1))
    W = sp.coo_array((w, (src, dst)), shape=(n, n))
    A = sp.coo_array((np.ones_like(w), (src, dst)), shape=(n, n))
    Asym = (A.T + A).tocsr()
    Wsym = (W.T + W).tocsr()
    # divide by edge multiplicity
    Wref = Wsym.copy()
    Wref.data = Wsym.data / Asym.data

    dense_ref = Wref.toarray()
    dense_got = np.zeros((n, n))
    for i in range(n):
        for j, wv in zip(sym.nbr[i], sym.w[i]):
            if j >= 0:
                dense_got[i, j] = wv
    np.testing.assert_allclose(dense_got, dense_ref, atol=1e-5)
    np.testing.assert_allclose(sym.degree, dense_ref.sum(axis=1), atol=1e-4)


def test_xlx_matches_dense():
    rng = np.random.default_rng(3)
    V = rng.normal(size=(30, 6)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    g = KNNGraph.build(V, n_neighbors=3)
    sym = symmetrize_weights(g, rbf_kernel(0.5))
    n = sym.nvecs
    Wd = np.zeros((n, n))
    for i in range(n):
        for j, wv in zip(sym.nbr[i], sym.w[i]):
            if j >= 0:
                Wd[i, j] = wv
    L = np.diag(Wd.sum(1)) - Wd
    X = rng.normal(size=(n, 6)).astype(np.float32)
    want = X.T @ (L / L.diagonal().sum()) @ X
    got = sym.xlx(X, normalize_by_trace=True)
    np.testing.assert_allclose(got, want, atol=1e-4)


def oracle_propagate(W_dense, prior, label_ids, label_values, lam, iters=300, eps=1e-5):
    """Reference Jacobi loop written directly from the spec. On convergence
    the PRE-step iterate is returned, like the reference implementation
    (`label_propagation.py:66-79` breaks before old = new) — the full-session
    differential pins our program to that semantics."""
    f = prior.copy()
    f[label_ids] = label_values
    wsum = W_dense.sum(axis=0)
    for _ in range(iters):
        nf = (W_dense @ f + lam * prior) / (wsum + lam)
        nf[label_ids] = label_values
        if np.max((nf - f) ** 2) < eps:
            return f
        f = nf
    return f


def test_propagation_matches_oracle():
    rng = np.random.default_rng(4)
    V = rng.normal(size=(60, 8)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    g = KNNGraph.build(V, n_neighbors=5)
    sym = symmetrize_weights(g, rbf_kernel(0.4))
    n = sym.nvecs
    Wd = np.zeros((n, n))
    for i in range(n):
        for j, wv in zip(sym.nbr[i], sym.w[i]):
            if j >= 0:
                Wd[i, j] = wv

    prior = rng.uniform(0.2, 0.8, size=n).astype(np.float32)
    label_ids = np.array([3, 10, 25])
    label_values = np.array([1.0, 0.0, 1.0], dtype=np.float32)

    lp = LabelPropagation(sym, reg_lambda=2.0, max_iter=300)
    got = lp.fit_transform(
        label_ids=label_ids, label_values=label_values, reg_values=prior
    )
    want = oracle_propagate(Wd, prior, label_ids, label_values, lam=2.0)
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_allclose(got[label_ids], label_values, atol=1e-6)


def test_simple_knn_ranker_updates():
    # ring graph: each vertex connected to its two ring neighbors
    n = 8
    dst = np.stack([(np.arange(n) - 1) % n, (np.arange(n) + 1) % n], axis=1).astype(np.int32)
    dist = np.full((n, 2), 0.5, dtype=np.float32)
    g = KNNGraph(dst, dist)
    r = SimpleKNNRanker(g, init_scores=np.zeros(n))
    s0 = r.current_scores()
    r.update([0], [1.0])
    s1 = r.current_scores()
    assert s1[0] == 1.0  # clamped
    # ring neighbors of 0 get a positive vote
    assert s1[1] > s0[1] and s1[7] > s0[7]
    assert s1[4] == pytest.approx(s0[4])  # far vertex unchanged
    # relabel to 0: neighbors drop back
    r.update([0], [0.0])
    s2 = r.current_scores()
    assert s2[0] == 0.0
    assert s2[1] < s1[1]


def test_label_prop_ranker_flow():
    rng = np.random.default_rng(5)
    V = rng.normal(size=(40, 8)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    g = KNNGraph.build(V, n_neighbors=4)
    sym = symmetrize_weights(g, rbf_kernel(0.4))
    r = LabelPropagationRanker2(
        weights=sym,
        normalize_scores=True,
        normalize_epsilon=0.1,
        sigmoid_before_propagate=True,
        calib_a=2.0,
        calib_b=-0.5,
        prior_weight=1.0,
    )
    base = rng.normal(size=40)
    r.set_base_scores(base)
    s0 = r.current_scores()
    assert (s0 >= 0).all() and (s0 <= 1).all()
    # only positive label: no propagation happens
    r.update([7], [1.0])
    # positive + negative: propagation runs and clamps labels
    r.update([12], [0.0])
    s1 = r.current_scores()
    assert s1[7] == pytest.approx(1.0)
    assert s1[12] == pytest.approx(0.0)
    top, scores = r.top_k(5)
    assert 7 not in top and 12 not in top  # unlabeled_only default
    assert len(top) == 5


def test_normalize_scores():
    s = np.array([1.0, 3.0, 5.0])
    out = normalize_scores(s, 0.1)
    assert out[0] == pytest.approx(0.1) and out[-1] == pytest.approx(0.9)
    const = normalize_scores(np.ones(4), 0.1)
    assert (const == 0.5).all()


def test_propagate_chunked_bitwise_equal():
    """Bounded-dispatch propagation (dispatch_iters) must be BIT-identical
    to the single-dispatch program — it is the same while_loop resumed from
    carried state (the serving path chunks 1M-tile runs to stay under
    device execution watchdogs)."""
    import jax.numpy as jnp
    import numpy as np

    from seesaw_tpu.ops.propagation import propagate

    rng = np.random.default_rng(5)
    n, k = 300, 6
    nbr = rng.integers(0, n, size=(n, k)).astype(np.int32)
    nbr[5, 2:] = -1  # padding rows
    w = rng.uniform(0.1, 1.0, size=(n, k)).astype(np.float32)
    w[nbr < 0] = 0.0
    degree = w.sum(axis=1)
    prior = rng.uniform(0.01, 0.99, size=n).astype(np.float32)
    labels = np.zeros(n, np.float32)
    labels[:10] = 1.0
    is_labeled = np.zeros(n, bool)
    is_labeled[:20] = True

    args = [jnp.asarray(x) for x in
            (nbr, w, degree, prior, labels, is_labeled, prior)]
    for eps, max_iter in ((1e-7, 300), (0.0, 37)):
        ref = propagate(*args, reg_lambda=1.0, max_iter=max_iter, epsilon=eps)
        for c in (1, 3, 50, 1000):
            got = propagate(*args, reg_lambda=1.0, max_iter=max_iter,
                            epsilon=eps, dispatch_iters=c)
            assert int(got.n_iter) == int(ref.n_iter), (eps, max_iter, c)
            assert bool(got.converged) == bool(ref.converged)
            np.testing.assert_array_equal(
                np.asarray(got.scores), np.asarray(ref.scores),
                err_msg=f"eps={eps} chunk={c}",
            )


def test_label_prop_ranker_device_mode_matches_host():
    """Device mode (set_base_scores receives a DEVICE array, as a
    device-built serving index produces) must match the host path exactly:
    device-persistent labels + per-round delta scatters + a device-resident
    prior replace the reference's full host-array assembly per round
    (`label_propagation.py:44-66`), so scores must agree to f32 tolerance
    across rounds, including staged-then-flushed clicks and re-labeling."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    V = rng.normal(size=(60, 8)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    g = KNNGraph.build(V, n_neighbors=4)
    sym = symmetrize_weights(g, rbf_kernel(0.4))
    opts = dict(
        normalize_scores=True, normalize_epsilon=0.1,
        sigmoid_before_propagate=True, calib_a=2.0, calib_b=-0.5,
        prior_weight=1.0,
    )
    host = LabelPropagationRanker2(weights=sym, **opts)
    dev = LabelPropagationRanker2(weights=sym, **opts)
    base = rng.normal(size=60).astype(np.float32)
    host.set_base_scores(base)
    dev.set_base_scores(jnp.asarray(base))
    rounds = [
        ([7], [1.0]),             # positives only: staged, no propagation
        ([12, 3], [0.0, 1.0]),    # first flush: full device upload
        ([30, 31], [0.0, 0.0]),   # delta scatter
        ([12], [1.0]),            # re-label flips 12; no negatives remain
        ([40, 2, 5], [0.0, 1.0, 0.0]),  # delta scatter after stale round
    ]
    for ids, labs in rounds:
        host.update(ids, labs)
        dev.update(ids, labs)
        np.testing.assert_allclose(
            dev.current_scores(), host.current_scores(), atol=2e-5,
            err_msg=f"round with ids={ids}",
        )
    assert dev._labels_dev is not None, "device mode never engaged"
    assert not dev._pending, "clicks left unflushed"
    # the device label state agrees with the host mirrors
    np.testing.assert_array_equal(
        np.asarray(dev._labels_dev), dev.labels.astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(dev._is_labeled_dev), dev.is_labeled > 0)
    # host path stayed host-resident (differential-tested reference path)
    assert host._labels_dev is None


def test_normalize_scores_device_matches_host():
    import jax.numpy as jnp

    s = np.array([1.0, 3.0, 5.0], np.float32)
    np.testing.assert_allclose(
        np.asarray(normalize_scores(jnp.asarray(s), 0.1)),
        normalize_scores(s, 0.1), atol=1e-7)
    const = normalize_scores(jnp.ones(4), 0.1)
    assert (np.asarray(const) == 0.5).all()
    np.testing.assert_allclose(
        np.asarray(sigmoid(jnp.asarray(s))), sigmoid(s), atol=1e-7)


def test_weight_device_arrays_shared_across_instances():
    """Concurrent sessions share the cached weight structure, so the device
    uploads must be cached ON that structure: N LabelPropagation instances
    over one SymmetricWeights hold one device copy of (nbr, w, degree), not
    one each — and the windowed path touches only `degree`, so a windowed
    serving session never pays the (N, K) nbr/w upload at all."""
    rng = np.random.default_rng(3)
    V = rng.normal(size=(256, 16)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    weights = symmetrize_weights(KNNGraph.build(V, 5), rbf_kernel(0.5))

    lp1 = LabelPropagation(weights=weights, reg_lambda=1.0)
    lp2 = LabelPropagation(weights=weights, reg_lambda=2.0)
    assert getattr(weights, "_device_cache", None) in (None, {}), \
        "construction must not upload anything"
    assert lp1._deg is lp2._deg
    assert "nbr" not in weights._device_cache, "degree must not drag nbr in"
    assert lp1._nbr is lp2._nbr
    assert lp1._w is lp2._w
    nbr_dev, w_dev, deg_dev = weights.device_arrays()
    assert nbr_dev is lp1._nbr and w_dev is lp1._w and deg_dev is lp1._deg

    # the shared arrays still serve a correct fit
    prior = rng.uniform(size=weights.nvecs).astype(np.float32)
    out = lp1.fit_transform(
        label_ids=np.array([0, 5]), label_values=np.array([1.0, 0.0]),
        reg_values=prior)
    assert out.shape == (weights.nvecs,)


def test_warm_start_matches_cold_fixed_point():
    """`warm_start=True` starts each round's Jacobi iteration from the
    previous round's converged scores instead of the prior (the reference
    always restarts at the prior, `research/knn_methods.py:152`). The fixed
    point is unique for reg_lambda > 0, so the converged iterates must agree
    to convergence tolerance across rounds — while typically using fewer
    iterations."""
    rng = np.random.default_rng(11)
    V = rng.normal(size=(80, 8)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    g = KNNGraph.build(V, n_neighbors=5)
    sym = symmetrize_weights(g, rbf_kernel(0.4))
    opts = dict(
        normalize_scores=True, normalize_epsilon=0.1,
        sigmoid_before_propagate=True, calib_a=2.0, calib_b=-0.5,
        prior_weight=1.0,
    )
    cold = LabelPropagationRanker2(weights=sym, **opts)
    warm = LabelPropagationRanker2(weights=sym, warm_start=True, **opts)
    # tighten the stop rule: it tests max (step delta)^2 < epsilon, so the
    # per-step tolerance is sqrt(eps) and the fixed-point slack is
    # ~sqrt(eps)/(1-rho) — the default 1e-5 leaves ~3e-3 start-dependent
    # wobble that would dominate the signal
    cold.lp.epsilon = 1e-12
    warm.lp.epsilon = 1e-12
    cold.lp.max_iter = 5000
    warm.lp.max_iter = 5000
    base = rng.normal(size=80).astype(np.float32)
    cold.set_base_scores(base)
    warm.set_base_scores(base)
    rounds = [
        ([3], [1.0]), ([17], [0.0]), ([40, 41], [1.0, 0.0]),
        ([17], [1.0]), ([5, 60], [0.0, 0.0]),
    ]
    for ids, labs in rounds:
        cold.update(ids, labs)
        warm.update(ids, labs)
        # both converge to the same unique fixed point; the stop rule
        # (per-step delta < epsilon) leaves ~eps/(1-rho) slack
        np.testing.assert_allclose(
            warm.current_scores(), cold.current_scores(), atol=1e-4,
            err_msg=f"round with ids={ids}",
        )
        # ranking order at the top is preserved
        assert list(warm.top_k(5)[0]) == list(cold.top_k(5)[0])
    # a new prior invalidates the old warm iterate BEFORE re-propagating
    # (reference reset semantics): with labels present set_base_scores runs
    # a fresh cold-started propagation, so the recorded iterate is the new
    # prior's own result, not a stale one
    warm.set_base_scores(base * 0.5)
    np.testing.assert_array_equal(
        np.asarray(warm._scores_dev), warm.current_scores())


def test_hierarchical_topk_exact():
    """The segment-max selection is EXACT vs lax.top_k (no ties in random
    f32 input): at most k segments can hold elements >= the k-th largest."""
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.ops.knn import _hierarchical_topk

    rng = np.random.default_rng(3)
    sims = jnp.asarray(rng.normal(size=(16, 32768)).astype(np.float32))
    want_v, want_i = jax.lax.top_k(sims, 33)
    got_v, got_i = _hierarchical_topk(sims, 33)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_exact_knn_blocked_path_matches_bruteforce():
    """The fused blocked program (N > 8192: bf16 matmul + hierarchical
    top-k + cross-chunk merge + padding masks) agrees with the f32 brute
    force on clustered unit vectors up to bf16-margin ties."""
    from seesaw_tpu.ops.knn import exact_knn

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(64, 32)).astype(np.float32)
    V = centers[rng.integers(0, 64, size=9000)] * 2.0
    V += rng.normal(size=V.shape).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    ids, dist = exact_knn(V, 8, block_size=1024)
    want_idx, want_dist = brute_knn(V, 8)
    # bf16 scores: distances agree to bf16 resolution; the neighbor SET
    # may swap entries whose f32 distances differ by < bf16 eps
    np.testing.assert_allclose(dist, np.clip(want_dist, 0, None), atol=8e-3)
    overlap = np.mean([
        len(set(ids[i]) & set(want_idx[i])) / 8 for i in range(0, 9000, 7)
    ])
    assert overlap > 0.97, f"neighbor-set overlap {overlap}"
    assert (ids != np.arange(9000)[:, None]).all(), "self-edge leaked"
