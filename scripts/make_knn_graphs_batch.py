#!/usr/bin/env python
"""Batch-build kNN graphs for datasets and per-category subsets.

TPU-native equivalent of the reference's ray actor-pool batch script
(`/root/reference/scripts/make_knn_graphs_lvis.py`): for each requested
(dataset, index, category) combination, build the EXACT kNN graph (blocked
MXU scan, optionally mesh-sharded) over the full index or the category's
subset, and save it under the index's knng path. Per-category subsets (the
LVIS flow: one graph per qgt column) are created on demand from the
category's positive frames.

Usage:
    python scripts/make_knn_graphs_batch.py --root R --dataset lvis \
        --index multiscale --n_neighbors 10 [--categories catA catB | --all_categories]
        [--full] [--sharded]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_one(ds, index_name: str, *, knng_name: str, n_neighbors: int, mesh,
              k_intra: int = 0):
    from seesaw_tpu.knn_graph import KNNGraph, factor_neighbors

    idx = ds.load_index(index_name, options={})
    # subset indices carry no on-disk path; the graph lives under the
    # dataset/subset directory so per-category graphs don't collide
    out = Path(ds.path) / "indices" / index_name / "knn_graph" / knng_name
    g = KNNGraph.build(idx.vectors, n_neighbors=n_neighbors, mesh=mesh)
    g.save(out)
    print(f"{ds.dataset_name}/{index_name}: {g.nvecs} vectors k={g.k} -> {out}")
    if k_intra:
        # diversified variant (reference process_lvis_graphs / factor_neighbors):
        # 1 nearest vector per distinct other frame + k_intra within-frame
        fg = factor_neighbors(g, idx.meta.dbidx, k_intra=k_intra)
        fout = Path(str(out).rstrip("/") + "_factored")
        fg.save(fout)
        print(f"  factored (k_intra={k_intra}) -> {fout}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--index", default="multiscale")
    ap.add_argument("--n_neighbors", type=int, default=10)
    ap.add_argument("--knng_name", default="")
    ap.add_argument("--categories", nargs="*", default=None,
                    help="build per-category subset graphs for these qgt columns")
    ap.add_argument("--all_categories", action="store_true",
                    help="one subset graph per qgt column (the LVIS flow)")
    ap.add_argument("--full", action="store_true",
                    help="also build the whole-dataset graph")
    ap.add_argument("--sharded", action="store_true",
                    help="build on a device mesh (all local devices)")
    ap.add_argument("--factored_k_intra", type=int, default=0,
                    help="also write the diversified '<name>_factored' graph "
                         "(1 nearest per other frame + this many within-frame)")
    args = ap.parse_args(argv)

    from seesaw_tpu.dataset import GlobalDataManager

    mesh = None
    if args.sharded:
        from seesaw_tpu.parallel import make_mesh

        import jax

        mesh = make_mesh(len(jax.devices()))

    gdm = GlobalDataManager(args.root)
    ds = gdm.get_dataset(args.dataset)

    if args.full or not (args.categories or args.all_categories):
        build_one(ds, args.index, knng_name=args.knng_name,
                  n_neighbors=args.n_neighbors, mesh=mesh,
                  k_intra=args.factored_k_intra)

    categories = args.categories or []
    if args.all_categories:
        categories = list(ds.load_qgt().columns.values)

    for cat in categories:
        qgt = ds.load_qgt()
        members = np.asarray(qgt.index[qgt[cat].fillna(0) > 0])
        if members.size < 2:
            print(f"skipping {cat!r}: {members.size} positive frames")
            continue
        sub_name = f"cat_{cat}"
        try:
            sub = ds.load_subset(sub_name)
        except Exception:
            sub = ds.create_named_subset(sub_name, members)
        build_one(sub, args.index, knng_name=args.knng_name,
                  n_neighbors=min(args.n_neighbors, members.size - 1),
                  mesh=mesh, k_intra=args.factored_k_intra)


if __name__ == "__main__":
    main()
