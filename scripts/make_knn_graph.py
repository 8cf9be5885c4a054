#!/usr/bin/env python
"""CLI: build the exact kNN graph for an index
(reference scripts/make_knn_graph.py, pynndescent replaced by the blocked
exact device scan)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from seesaw_tpu.dataset import SeesawDataset
from seesaw_tpu.knn_graph import KNNGraph


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--index_name", default="multiscale")
    parser.add_argument("--graph_name", default="")
    parser.add_argument("--n_neighbors", type=int, default=32)
    parser.add_argument("--block_size", type=int, default=8192)
    args = parser.parse_args()

    ds = SeesawDataset(args.dataset_path)
    idx = ds.load_index(args.index_name, options={})
    g = KNNGraph.build(idx.vectors, n_neighbors=args.n_neighbors,
                       block_size=args.block_size)
    g.save(idx.get_knng_path(args.graph_name))
    print(f"built kNN graph k={g.k} over {g.nvecs} vectors")
