"""Synthetic dataset builder shared by the end-to-end tests.

Creates a GlobalDataManager root with one dataset whose multiscale index is
planted: images of the target category contain a tile whose vector is close
to the text query's HashEmbedding vector, so CLIP-free sessions behave like
real ones (scores separate, feedback helps).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from seesaw_tpu.dataset import GlobalDataManager
from seesaw_tpu.indices.meta import VectorMeta
from seesaw_tpu.indices.multiscale import MultiscaleIndex
from seesaw_tpu.labeldb import BoxTable
from seesaw_tpu.models.embeddings import HashEmbedding

DIM = 32
QSTR = "a dog"
CATEGORY = "dog"


def build_synthetic_root(
    root: str,
    *,
    n_images: int = 80,
    pos_frac: float = 0.25,
    noise: float = 0.55,
    seed: int = 0,
    dataset_name: str = "synth",
):
    rng = np.random.default_rng(seed)
    emb = HashEmbedding(d=DIM)
    qvec = emb.from_string(string=QSTR)

    gdm = GlobalDataManager(root)
    paths = [f"img_{i:04d}.jpg" for i in range(n_images)]
    ds = gdm.create_dataset(dataset_name, paths=paths)

    n_pos = int(n_images * pos_frac)
    pos_ids = rng.choice(n_images, size=n_pos, replace=False)
    is_pos = np.zeros(n_images, dtype=bool)
    is_pos[pos_ids] = True

    dbidx, zoom, boxes, vecs = [], [], [], []
    gt_dbidx, gt_boxes = [], []
    img = 224.0
    for i in range(n_images):
        # zoom 1: four quadrant tiles; zoom 2: one whole-image tile
        quads = [
            (0, 0, img / 2, img / 2),
            (img / 2, 0, img, img / 2),
            (0, img / 2, img / 2, img),
            (img / 2, img / 2, img, img),
        ]
        tiles = [(1, q) for q in quads] + [(2, (0.0, 0.0, img, img))]
        target_tile = int(rng.integers(0, 4)) if is_pos[i] else -1
        for t, (zl, (x1, y1, x2, y2)) in enumerate(tiles):
            v = rng.normal(size=DIM).astype(np.float32)
            v /= np.linalg.norm(v)
            if is_pos[i] and (t == target_tile or zl == 2):
                v = qvec + noise * v
                v /= np.linalg.norm(v)
            dbidx.append(i)
            zoom.append(zl)
            boxes.append((x1, y1, x2, y2))
            vecs.append(v)
        if is_pos[i]:
            gt_dbidx.append(i)
            gt_boxes.append(quads[target_tile])

    meta, order = VectorMeta.from_arrays(
        np.array(dbidx), np.array(zoom), np.array(boxes, dtype=np.float32)
    )
    V = np.stack(vecs)[order]
    index = MultiscaleIndex(embedding=emb, vectors=V, meta=meta)
    index.save(ds.index_path("multiscale"), model_name=f"hash-{DIM}")

    from seesaw_tpu.knn_graph import KNNGraph

    KNNGraph.build(V, n_neighbors=8).save(
        f"{ds.index_path('multiscale')}/knn_graph/"
    )

    gt = BoxTable(
        dbidx=np.array(gt_dbidx, dtype=np.int32),
        boxes=np.array(gt_boxes, dtype=np.float32),
        description=[CATEGORY] * len(gt_dbidx),
        marked_accepted=np.ones(len(gt_dbidx), dtype=bool),
    )
    qgt = pd.DataFrame({CATEGORY: is_pos.astype(np.float32)})
    ds.save_ground_truth(gt, qgt)
    return gdm, ds, dict(is_pos=is_pos, n_pos=n_pos, qvec=qvec)
