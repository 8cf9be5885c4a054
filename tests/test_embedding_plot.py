"""Embedding explorer: PCA projection, device k-means, standalone HTML."""
import json

import numpy as np

from seesaw_tpu.embedding_plot import Visualizer


def _clustered(rng, n, d, k):
    centers = rng.normal(size=(k, d)) * 4
    which = rng.integers(0, k, size=n)
    X = centers[which] + rng.normal(size=(n, d))
    return X.astype(np.float32), which


def test_projection_and_clusters(tmp_path):
    rng = np.random.default_rng(0)
    X, true_c = _clustered(rng, 600, 16, 4)
    vz = Visualizer(X)
    xy = vz.fit_projection()
    assert xy.shape == (600, 2)
    # PCA keeps cluster structure: same-cluster pairs closer on average
    assign = vz.assign_clusters(k=4, iters=30)
    assert assign.shape == (600,)
    # k-means should largely agree with the planted partition (up to relabel)
    agree = 0
    for c in range(4):
        vals, counts = np.unique(assign[true_c == c], return_counts=True)
        agree += counts.max()
    assert agree / len(X) > 0.9

    # query overlay + HTML artifact
    q = X[true_c == 0].mean(axis=0)
    vz.add_query("target", q, topk=20)
    out = vz.write_html(str(tmp_path / "map.html"))
    html = open(out).read()
    assert "embedding explorer" in html
    data = json.loads(html.split("const D = ")[1].split(";\n")[0])
    assert len(data["x"]) == 600
    assert data["queries"][0]["name"] == "target"
    assert len(data["queries"][0]["top"]) == 20


def test_project_new_vectors():
    rng = np.random.default_rng(1)
    X, _ = _clustered(rng, 200, 8, 3)
    vz = Visualizer(X)
    vz.fit_projection()
    p = vz.project(X[:5])
    np.testing.assert_allclose(p, vz.xy[:5], atol=1e-4)
