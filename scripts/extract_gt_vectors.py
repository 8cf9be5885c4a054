#!/usr/bin/env python
"""Extract CLIP vectors for every ground-truth box of a dataset.

TPU-native equivalent of the reference's ray pipeline
(`/root/reference/scripts/extract_gt_vectors.py`): for each ground-truth
box, crop the padded patch from its image, preprocess, and encode on device
in large fixed-size batches (decode threads feed the chip, like the ingest
pipeline). Output: <out>/gt_vectors.parquet with dbidx, category, box
coords, and the unit-norm vector — the data behind CLIP-guided vector
alignment / DB-matched training.

Usage:
    python scripts/extract_gt_vectors.py --root R --dataset D --model clip-vit-b32:<ckpt> \
        --output_path OUT [--padding 60] [--limit N] [--batch_size 256]
"""
import argparse
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def crop_patches(ds, box_table, *, padding: int, target: int,
                 min_side: int = 160, n_threads: int = 8):
    """Decode each labeled image once, crop each gt box as the reference
    does (pad by `padding`, then the best in-bounds SQUARE of at least
    min_side — `preproc_utils.gt_patch_preprocessor`, reference
    preproc_utils.py:28-47), preprocess to (target, target, 3) float32.
    Returns (patches, row_indices)."""
    import PIL.Image

    from seesaw_tpu.box_utils import BoundingBoxBatch, BoxBatch
    from seesaw_tpu.models.preprocess import preprocess_image

    by_img = {}
    for i in range(len(box_table)):
        by_img.setdefault(int(box_table.dbidx[i]), []).append(i)

    def one_image(item):
        dbidx, rows = item
        try:
            im = PIL.Image.open(ds.file_path(dbidx)).convert("RGB")
        except Exception as e:  # unreadable image: skip its boxes
            print(f"warning: skipping dbidx={dbidx}: {e!r}")
            return [], []
        W, H = im.size
        xyxy = np.clip(
            box_table.boxes[rows],
            [0, 0, 0, 0], [W, H, W, H],
        ).astype(np.float64)
        bb = BoundingBoxBatch.from_boxbatch(
            BoxBatch.from_xyxy(xyxy), np.full(len(rows), W), np.full(len(rows), H)
        )
        squares = bb.pad(padding).best_square_box(
            min_side=min(min_side, W, H)
        ).to_xyxy()
        patches, kept = [], []
        for i, box in zip(rows, squares):
            crop = im.crop(tuple(box))
            if crop.size[0] < 2 or crop.size[1] < 2:
                continue
            patches.append(preprocess_image(crop, target))
            kept.append(i)
        return patches, kept

    all_patches, all_rows = [], []
    with ThreadPoolExecutor(n_threads) as pool:
        for patches, kept in pool.map(one_image, sorted(by_img.items())):
            all_patches.extend(patches)
            all_rows.extend(kept)
    return np.stack(all_patches) if all_patches else np.zeros((0, target, target, 3), np.float32), np.array(all_rows, np.int64)


def encode_batched(embedding, patches: np.ndarray, batch_size: int) -> np.ndarray:
    import jax.numpy as jnp

    n = patches.shape[0]
    out = np.empty((n, embedding.dim), dtype=np.float32)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        batch = np.zeros((batch_size,) + patches.shape[1:], np.float32)
        batch[: hi - lo] = patches[lo:hi]
        vecs = np.asarray(embedding.encode_image_batch(jnp.asarray(batch)))
        out[lo:hi] = vecs[: hi - lo]
    norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-6)
    return out / norms


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--model", default="clip-vit-b32")
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--padding", type=int, default=60)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=256)
    args = ap.parse_args(argv)

    import pandas as pd

    from seesaw_tpu.dataset import GlobalDataManager
    from seesaw_tpu.models.registry import load_embedding
    from seesaw_tpu.utils.transactional import transactional_folder

    gdm = GlobalDataManager(args.root)
    ds = gdm.get_dataset(args.dataset)
    box_table, _ = ds.load_ground_truth()
    if args.limit:
        keep = box_table.dbidx < args.limit
        from seesaw_tpu.labeldb import BoxTable

        box_table = BoxTable(
            dbidx=box_table.dbidx[keep], boxes=box_table.boxes[keep],
            description=[d for d, k in zip(box_table.description, keep) if k],
            marked_accepted=box_table.marked_accepted[keep],
        )

    embedding = load_embedding(args.model)
    target = getattr(getattr(embedding, "cfg", None), "image_size", 224)
    patches, rows = crop_patches(ds, box_table, padding=args.padding, target=target)
    vectors = encode_batched(embedding, patches, args.batch_size)

    df = pd.DataFrame(
        {
            "dbidx": box_table.dbidx[rows],
            "category": [box_table.description[i] for i in rows],
            "x1": box_table.boxes[rows, 0],
            "y1": box_table.boxes[rows, 1],
            "x2": box_table.boxes[rows, 2],
            "y2": box_table.boxes[rows, 3],
            "vectors": list(vectors),
        }
    )
    with transactional_folder(args.output_path, force=True) as tmp:
        df.to_parquet(Path(tmp) / "gt_vectors.parquet")
    print(f"wrote {len(df)} gt vectors to {args.output_path}/gt_vectors.parquet")


if __name__ == "__main__":
    main()
