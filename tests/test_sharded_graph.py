"""Sharded graph stack must match the single-device programs bit-for-bit
(8-device virtual CPU mesh via conftest)."""
import jax
import numpy as np
import pytest

from seesaw_tpu.knn_graph import KNNGraph, rbf_kernel, symmetrize_weights
from seesaw_tpu.label_propagation import LabelPropagation
from seesaw_tpu.ops.knn import exact_knn
from seesaw_tpu.ops.propagation import propagate
from seesaw_tpu.parallel import make_mesh, sharded_exact_knn, sharded_propagate


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _unit(rng, n, d):
    v = rng.normal(size=(n, d))
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("n,k", [(64, 5), (100, 8), (37, 3), (8, 7)])
def test_sharded_knn_matches_single_device(mesh, n, k):
    rng = np.random.default_rng(n)
    V = _unit(rng, n, 16)
    ids1, d1 = exact_knn(V, k)
    ids8, d8 = sharded_exact_knn(V, k, mesh)
    # neighbor sets identical; distances may differ by 1 ulp because the
    # single-device path reduces a differently-shaped matmul
    np.testing.assert_array_equal(ids8, ids1)
    np.testing.assert_allclose(d8, d1, atol=1e-6)


def test_sharded_knn_uneven_rows(mesh):
    # N not divisible by the shard count; N smaller than S*k
    rng = np.random.default_rng(0)
    V = _unit(rng, 13, 8)
    ids1, d1 = exact_knn(V, 4)
    ids8, d8 = sharded_exact_knn(V, 4, mesh)
    np.testing.assert_array_equal(ids8, ids1)
    np.testing.assert_allclose(d8, d1, atol=1e-6)


def test_knn_graph_build_with_mesh(mesh):
    rng = np.random.default_rng(3)
    V = _unit(rng, 50, 12)
    g1 = KNNGraph.build(V, 6)
    g8 = KNNGraph.build(V, 6, mesh=mesh)
    np.testing.assert_array_equal(g8.dst, g1.dst)
    np.testing.assert_allclose(g8.dist, g1.dist, atol=1e-6)


def test_sharded_propagation_matches_single_device(mesh):
    rng = np.random.default_rng(7)
    n = 90
    V = _unit(rng, n, 16)
    g = KNNGraph.build(V, 6)
    sw = symmetrize_weights(g, rbf_kernel(0.5))

    label_ids = np.array([2, 31, 55, 78])
    label_values = np.array([1.0, 0.0, 1.0, 0.0], np.float32)
    prior = rng.uniform(0.1, 0.9, size=n).astype(np.float32)
    labels = np.zeros(n, np.float32)
    labels[label_ids] = label_values
    is_labeled = np.zeros(n, bool)
    is_labeled[label_ids] = True
    start = prior.copy()

    for reg_lambda in (0.5, 2.0):
        res1 = propagate(
            sw.nbr, sw.w, sw.degree, prior, labels, is_labeled, start,
            reg_lambda=reg_lambda, max_iter=200, epsilon=1e-10,
        )
        out8 = sharded_propagate(
            sw.nbr, sw.w, sw.degree, prior, labels, is_labeled, start,
            mesh, reg_lambda=reg_lambda, max_iter=200, epsilon=1e-10,
        )
        np.testing.assert_array_equal(out8, np.asarray(res1.scores))


def test_label_propagation_wrapper_with_mesh(mesh):
    """LabelPropagation(mesh=...) routes through the sharded program."""
    rng = np.random.default_rng(11)
    n = 40
    V = _unit(rng, n, 8)
    sw = symmetrize_weights(KNNGraph.build(V, 5), rbf_kernel(0.5))
    prior = rng.uniform(0.2, 0.8, size=n).astype(np.float32)
    ids = np.array([1, 20])
    vals = np.array([1.0, 0.0])

    single = LabelPropagation(sw, reg_lambda=1.0, max_iter=150, epsilon=1e-10)
    sharded = LabelPropagation(
        sw, reg_lambda=1.0, max_iter=150, epsilon=1e-10, mesh=mesh
    )
    a = single.fit_transform(label_ids=ids, label_values=vals, reg_values=prior)
    b = sharded.fit_transform(label_ids=ids, label_values=vals, reg_values=prior)
    np.testing.assert_array_equal(a, b)


def test_sharded_windowed_propagation_matches_single_device(mesh):
    """Mesh-sharded windowed propagation (slab blocks sharded, scores
    all-gathered per iteration, per-shard overflow) must match both the
    single-device windowed program and the XLA path, including through a
    relabeled (order-baked) layout and ragged block counts."""
    from seesaw_tpu.ops.pallas_spmv import build_windowed_layout
    from seesaw_tpu.ops.propagation import propagate_windowed
    from seesaw_tpu.parallel.sharded_graph import sharded_propagate_windowed

    rng = np.random.default_rng(13)
    n, K = 2000, 6  # NB = ceil(2000/256) = 8 blocks over 8 shards, ragged
    base = np.arange(n)[:, None]
    local = np.clip(base + rng.integers(-120, 121, size=(n, K)), 0, n - 1)
    rand = rng.integers(0, n, size=(n, K))
    nbr = np.where(rng.random((n, K)) < 0.85, local, rand).astype(np.int32)
    w = rng.uniform(0.1, 1.0, size=(n, K)).astype(np.float32)
    nbr[11, 2:] = -1
    w[nbr < 0] = 0.0
    layout = build_windowed_layout(nbr, w, B=256, W=512, cap=4)
    assert 0.3 < layout.coverage < 1.0  # mixes kernel AND overflow edges

    degree = w.sum(axis=1)
    prior = rng.uniform(0.05, 0.95, size=n).astype(np.float32)
    labels = np.zeros(n, np.float32)
    labels[:12] = 1.0
    is_labeled = np.zeros(n, bool)
    is_labeled[:25] = True
    args = dict(reg_lambda=1.0, max_iter=120, epsilon=1e-9)

    import jax.numpy as jnp

    ref = propagate_windowed(
        layout, jnp.asarray(degree), jnp.asarray(prior), jnp.asarray(labels),
        jnp.asarray(is_labeled), jnp.asarray(prior), interpret=True, **args,
    )
    got = sharded_propagate_windowed(
        layout, degree, prior, labels, is_labeled, prior, mesh,
        interpret=True, **args,
    )
    np.testing.assert_allclose(
        got, np.asarray(ref.scores), rtol=2e-5, atol=2e-6
    )


def test_sharded_windowed_relabeled_layout(mesh):
    """A layout with a baked-in RCM relabeling goes through the sharded
    path in permuted space; callers still see original vertex ids."""
    from seesaw_tpu.knn_graph import KNNGraph, rbf_kernel, symmetrize_weights
    from seesaw_tpu.ops.pallas_spmv import build_windowed_layout_auto
    from seesaw_tpu.parallel.sharded_graph import sharded_propagate_windowed

    rng = np.random.default_rng(29)
    n, d = 4096, 12
    centers = rng.normal(size=(40, d))
    V = centers[rng.integers(0, 40, size=n)] + 0.1 * rng.normal(size=(n, d))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    V = V[rng.permutation(n)].astype(np.float32)
    sw = symmetrize_weights(KNNGraph.build(V, 5), rbf_kernel(0.5))
    layout = build_windowed_layout_auto(sw.nbr, sw.w, device=False)
    assert layout is not None and layout.order is not None

    prior = rng.uniform(0.1, 0.9, size=n).astype(np.float32)
    labels = np.zeros(n, np.float32)
    labels[:6] = 1.0
    is_labeled = np.zeros(n, bool)
    is_labeled[:12] = True
    args = dict(reg_lambda=1.0, max_iter=80, epsilon=1e-9)
    ref = propagate(
        np.asarray(sw.nbr), np.asarray(sw.w), sw.degree.astype(np.float32),
        prior, labels, is_labeled, prior, **args,
    )
    got = sharded_propagate_windowed(
        layout, sw.degree.astype(np.float32), prior, labels, is_labeled,
        prior, mesh, interpret=True, **args,
    )
    np.testing.assert_allclose(
        got, np.asarray(ref.scores), rtol=2e-5, atol=2e-6
    )


def test_label_propagation_mesh_windowed(mesh):
    """LabelPropagation(mesh=..., windowed_layout=...) routes through the
    sharded windowed program and matches the plain mesh path."""
    from seesaw_tpu.ops.pallas_spmv import build_windowed_layout

    rng = np.random.default_rng(31)
    n = 700
    V = _unit(rng, n, 8)
    sw = symmetrize_weights(KNNGraph.build(V, 5), rbf_kernel(0.5))
    layout = build_windowed_layout(sw.nbr, sw.w, B=128, W=256, cap=4)
    prior = rng.uniform(0.2, 0.8, size=n).astype(np.float32)
    ids = np.array([1, 200, 650])
    vals = np.array([1.0, 0.0, 1.0])

    plain = LabelPropagation(sw, reg_lambda=1.0, max_iter=150, epsilon=1e-9,
                             mesh=mesh)
    windowed = LabelPropagation(sw, reg_lambda=1.0, max_iter=150,
                                epsilon=1e-9, mesh=mesh,
                                windowed_layout=layout)
    a = plain.fit_transform(label_ids=ids, label_values=vals,
                            reg_values=prior)
    b = windowed.fit_transform(label_ids=ids, label_values=vals,
                               reg_values=prior)
    np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-6)


def test_sharded_knn_fewer_rows_than_shards(mesh):
    rng = np.random.default_rng(2)
    V = _unit(rng, 5, 8)  # N < S
    ids1, d1 = exact_knn(V, 3)
    ids8, d8 = sharded_exact_knn(V, 3, mesh)
    np.testing.assert_array_equal(ids8, ids1)
    np.testing.assert_allclose(d8, d1, atol=1e-6)


def test_sharded_windowed_routed_layout(mesh):
    """A layout carrying a routed overflow (vestigial COO) still serves ALL
    overflow edges through the sharded path — the per-shard split must
    reconstruct the edge list via RoutedOverflow.to_coo()."""
    import jax.numpy as jnp

    from seesaw_tpu.ops.pallas_spmv import (
        build_windowed_layout,
        with_routed_overflow,
    )
    from seesaw_tpu.ops.propagation import propagate_windowed
    from seesaw_tpu.parallel.sharded_graph import sharded_propagate_windowed

    rng = np.random.default_rng(31)
    n, K = 1600, 5
    nbr = rng.integers(0, n, size=(n, K)).astype(np.int32)  # heavy overflow
    w = rng.uniform(0.1, 1.0, size=(n, K)).astype(np.float32)
    layout = with_routed_overflow(
        build_windowed_layout(nbr, w, B=256, W=512, cap=4), min_edges=1
    )
    assert layout.routed is not None

    degree = w.sum(axis=1)
    prior = rng.uniform(0.05, 0.95, size=n).astype(np.float32)
    labels = np.zeros(n, np.float32)
    labels[:10] = 1.0
    is_labeled = np.zeros(n, bool)
    is_labeled[:20] = True
    args = dict(reg_lambda=1.0, max_iter=120, epsilon=1e-9)

    ref = propagate_windowed(
        layout, jnp.asarray(degree), jnp.asarray(prior), jnp.asarray(labels),
        jnp.asarray(is_labeled), jnp.asarray(prior), interpret=True, **args,
    )
    got = sharded_propagate_windowed(
        layout, degree, prior, labels, is_labeled, prior, mesh,
        interpret=True, **args,
    )
    np.testing.assert_allclose(
        got, np.asarray(ref.scores), rtol=2e-5, atol=2e-6
    )


def test_ranker_mesh_warm_start_composes(mesh):
    """LabelPropagationRanker2(mesh=...) routes rounds through the sharded
    propagation program, and warm_start composes with it: the converged
    scores agree with a single-device cold-start ranker to stop-rule
    tolerance (unique fixed point for reg_lambda > 0)."""
    from seesaw_tpu.loops.knn_methods import LabelPropagationRanker2

    rng = np.random.default_rng(23)
    n = 96
    V = _unit(rng, n, 8)
    sw = symmetrize_weights(KNNGraph.build(V, 5), rbf_kernel(0.5))
    opts = dict(
        normalize_scores=True, normalize_epsilon=0.1,
        sigmoid_before_propagate=True, calib_a=2.0, calib_b=-0.5,
        prior_weight=1.0,
    )
    single = LabelPropagationRanker2(weights=sw, **opts)
    sharded = LabelPropagationRanker2(weights=sw, mesh=mesh,
                                      warm_start=True, **opts)
    for r in (single, sharded):
        r.lp.epsilon = 1e-12
        r.lp.max_iter = 5000
    base = rng.normal(size=n).astype(np.float32)
    single.set_base_scores(base)
    sharded.set_base_scores(base)
    for ids, labs in [([4], [1.0]), ([50], [0.0]), ([7, 8], [1.0, 0.0])]:
        single.update(ids, labs)
        sharded.update(ids, labs)
        np.testing.assert_allclose(
            sharded.current_scores(), single.current_scores(), atol=1e-4,
            err_msg=f"round with ids={ids}",
        )


def test_windowed_mesh_prep_and_program_cached(mesh):
    """Serving rounds must not redo the O(N+E) host prep (overflow split,
    slab upload) or re-trace the shard_map program: second call hits both
    caches and returns identical scores."""
    from seesaw_tpu.knn_graph import SymmetricWeights
    from seesaw_tpu.ops.pallas_spmv import build_windowed_layout
    from seesaw_tpu.parallel import sharded_graph as sg

    rng = np.random.default_rng(4)
    n, K = 2048, 8
    base = np.arange(n, dtype=np.int32)[:, None]
    nbr = np.clip(base + rng.integers(-60, 61, size=(n, K)), 0, n - 1).astype(
        np.int32
    )
    w = rng.uniform(0.1, 1.0, size=(n, K)).astype(np.float32)
    layout = build_windowed_layout(nbr, w, B=128, W=256, cap=K)
    sw = SymmetricWeights(nbr=nbr, w=w, degree=w.sum(axis=1))

    prior = rng.uniform(0.1, 0.9, size=n).astype(np.float32)
    labels = np.zeros(n, np.float32); labels[0] = 1.0
    is_lab = np.zeros(n, bool); is_lab[[0, n - 1]] = True

    kw = dict(reg_lambda=1.0, max_iter=60, epsilon=1e-8)
    hits0 = sg._windowed_mesh_run.cache_info().hits
    out1 = sg.sharded_propagate_windowed(
        layout, sw.degree, prior, labels, is_lab, prior, mesh, **kw
    )
    prep1 = sg._prep_windowed_mesh(layout, mesh)
    out2 = sg.sharded_propagate_windowed(
        layout, sw.degree, prior, labels, is_lab, prior, mesh, **kw
    )
    prep2 = sg._prep_windowed_mesh(layout, mesh)
    assert prep1 is prep2, "prep rebuilt on the second round"
    assert sg._windowed_mesh_run.cache_info().hits > hits0, (
        "compiled program re-traced on the second round"
    )
    np.testing.assert_array_equal(out1, out2)
