#!/usr/bin/env python
"""CLI: create a dataset directory from an image folder
(reference scripts/create_dataset.py)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from seesaw_tpu.dataset import SeesawDataset


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="create a seesaw dataset")
    parser.add_argument("--image_dir", required=True, help="folder with images")
    parser.add_argument("--output_path", required=True, help="dataset dir to create")
    parser.add_argument("--force", action="store_true")
    args = parser.parse_args()
    ds = SeesawDataset.create(args.output_path, image_src=args.image_dir, force=args.force)
    print(f"created {ds} at {ds.path}")
