"""LeaveOneOutSubset + batch scripts (extract_gt_vectors, make_knn_graphs)."""
import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from synth import build_synthetic_root, CATEGORY


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("extras_root")
    build_synthetic_root(str(root))
    # real image files so crops work
    import PIL.Image

    from seesaw_tpu.dataset import GlobalDataManager

    ds = GlobalDataManager(str(root)).get_dataset("synth")
    rng = np.random.default_rng(0)
    for i in ds.dbidxs:
        p = ds.file_path(int(i))
        os.makedirs(os.path.dirname(p), exist_ok=True)
        arr = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(p, quality=85)
    return str(root)


def test_leave_one_out(root):
    from seesaw_tpu.dataset import GlobalDataManager

    ds = GlobalDataManager(root).get_dataset("synth")
    box_table, qgt = ds.load_ground_truth()
    excluded = int(box_table.dbidx[0])  # an image with gt boxes

    loo = ds.leave_one_out(excluded)
    assert loo.size() == ds.size() - 1
    assert excluded not in loo.dbidxs

    sub_table, sub_qgt = loo.load_ground_truth()
    assert excluded not in sub_table.dbidx
    assert excluded not in sub_qgt.index

    idx = loo.load_index("multiscale", options={})
    res = idx.query(
        vector=np.random.default_rng(0).normal(size=idx.vectors.shape[1]),
        topk=ds.size() - 1, shortlist_size=ds.size(),
    )
    assert excluded not in res["dbidxs"].tolist()


def test_extract_gt_vectors_script(root, tmp_path):
    import extract_gt_vectors

    out = tmp_path / "gtv"
    extract_gt_vectors.main([
        "--root", root, "--dataset", "synth", "--model", "hash-64",
        "--output_path", str(out), "--padding", "10", "--batch_size", "16",
    ])
    df = pd.read_parquet(out / "gt_vectors.parquet")
    assert len(df) > 0
    assert set(df.category) == {CATEGORY}
    V = np.stack(df.vectors.values)
    assert V.shape[1] == 64
    np.testing.assert_allclose(np.linalg.norm(V, axis=1), 1.0, rtol=1e-5)


def test_make_knn_graphs_batch_script(root):
    import make_knn_graphs_batch

    from seesaw_tpu.dataset import GlobalDataManager
    from seesaw_tpu.knn_graph import KNNGraph

    make_knn_graphs_batch.main([
        "--root", root, "--dataset", "synth", "--index", "multiscale",
        "--n_neighbors", "5", "--full", "--all_categories",
    ])
    ds = GlobalDataManager(root).get_dataset("synth")
    g = KNNGraph.from_file(Path(ds.path) / "indices" / "multiscale" / "knn_graph")
    assert g.k == 5

    sub = ds.load_subset(f"cat_{CATEGORY}")
    gs = KNNGraph.from_file(Path(sub.path) / "indices" / "multiscale" / "knn_graph")
    assert gs.nvecs < g.nvecs


def test_factored_graph_script(root):
    import make_knn_graphs_batch

    from seesaw_tpu.dataset import GlobalDataManager
    from seesaw_tpu.knn_graph import KNNGraph

    make_knn_graphs_batch.main([
        "--root", root, "--dataset", "synth", "--index", "multiscale",
        "--n_neighbors", "6", "--full", "--factored_k_intra", "2",
    ])
    ds = GlobalDataManager(root).get_dataset("synth")
    base = Path(ds.path) / "indices" / "multiscale" / "knn_graph"
    fg = KNNGraph.from_file(str(base) + "_factored")
    g = KNNGraph.from_file(base)
    # diversified graph keeps at most 2 intra + 1-per-other-frame edges
    assert fg.nvecs == g.nvecs
    idx = ds.load_index("multiscale", options={})
    dbidx = idx.meta.dbidx
    for i in range(0, fg.nvecs, 37):
        nbrs = fg.dst[i][fg.dst[i] != i]
        intra = (dbidx[nbrs] == dbidx[i]).sum()
        assert intra <= 2
        inter = dbidx[nbrs][dbidx[nbrs] != dbidx[i]]
        vals, counts = np.unique(inter, return_counts=True)
        assert (counts <= 1).all()
