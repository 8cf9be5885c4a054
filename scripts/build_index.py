#!/usr/bin/env python
"""CLI: build a multiscale (and optionally coarse) index for a dataset
(reference `create_multiscale_index`)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from seesaw_tpu.dataset import SeesawDataset
from seesaw_tpu.ingest.pipeline import create_coarse_index, create_multiscale_index


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--index_name", default="multiscale")
    parser.add_argument("--model", default="clip-vit-b32",
                        help="model spec, e.g. clip-vit-b32[:ckpt_path] or hash-64")
    parser.add_argument("--tile_size", type=int, default=224)
    parser.add_argument("--min_tile_size", type=int, default=224)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--knn_k", type=int, default=0,
                        help="also build the exact kNN graph with this k")
    parser.add_argument("--coarse_name", default=None,
                        help="also derive a coarse index under this name")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--force", action="store_true")
    args = parser.parse_args()

    ds = SeesawDataset(args.dataset_path)
    idx = create_multiscale_index(
        ds, args.index_name, args.model,
        tile_size=args.tile_size, min_tile_size=args.min_tile_size,
        batch_size=args.batch_size, force=args.force,
        build_knn_graph=args.knn_k or None, limit=args.limit,
    )
    print(f"built index {args.index_name}: {idx.vectors.shape} vectors")
    if args.coarse_name:
        coarse = create_coarse_index(ds, args.coarse_name, from_index=args.index_name,
                                     force=args.force)
        print(f"built coarse index {args.coarse_name}: {coarse.vectors.shape}")
