"""Offline method-comparison metric study (the repo's miniature of the
reference's `figures/breakdown.parquet` evidence, SURVEY §6).

The reference's quality story — feedback methods improve ranking over the
zero-shot CLIP baseline (`figures.py:79-229` comparison tables over
28k bench sessions) — cannot be reproduced offline (no real CLIP weights,
no BDD/COCO/LVIS). This module builds the same-shaped evidence on a
synthetic corpus engineered with the failure mode feedback fixes:

* each category's TRUE centroid is rotated away from its text-query vector
  (the query/database semantic gap that motivates vector refinement), and
* distractor images sit NEAR the query vector but are negatives (hard
  false positives the zero-shot ranking cannot demote).

Graded tiers (easy/medium/hard) vary the rotation and distractor mass, so
per-tier tables mirror the paper's breakdown by baseline difficulty. The
full bench harness (`bench.harness.BenchRunner`) drives every method with
the simulated user; metrics come from `analysis.add_metrics` — the exact
product path a real deployment's sweep would use.

Run: `python scripts/run_method_study.py --out docs/method_study.json`.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from ..basic_types import BenchParams, IndexSpec, SessionParams
from ..configs import get_default_config
from ..dataset import GlobalDataManager
from ..indices.meta import VectorMeta
from ..indices.multiscale import MultiscaleIndex
from ..knn_graph import KNNGraph
from ..labeldb import BoxTable
from ..models.embeddings import HashEmbedding

IMG = 224.0
_QUADS = [
    (0.0, 0.0, IMG / 2, IMG / 2),
    (IMG / 2, 0.0, IMG, IMG / 2),
    (0.0, IMG / 2, IMG / 2, IMG),
    (IMG / 2, IMG / 2, IMG, IMG),
]

# Each positive tile = alpha_i*q + beta*u + noise*g (normalized): alpha_i is
# its ZERO-SHOT visibility (graded; the tier's tail sits at/below the random
# background cosine ceiling ~sqrt(2 ln Ntiles / dim) ~ 0.33 at dim=128, 3k
# tiles, so plain ranking cannot find it), beta*u is the LEARNABLE class
# direction shared by every positive (orthogonal to q — invisible zero-shot,
# exactly what feedback can learn from labels). Distractors = d_alpha*q +
# noise*g: high zero-shot rank, no u component — false positives only
# feedback can demote. Harder tiers push more positives below the floor and
# add distractor mass, mirroring the paper's difficulty breakdown.
TIERS: Dict[str, dict] = {
    "easy": dict(alpha=(0.40, 0.80), n_distractors=6),
    "medium": dict(alpha=(0.02, 0.75), n_distractors=12),
    "hard": dict(alpha=(0.00, 0.70), n_distractors=18),
}
_BETA = 0.55  # learnable-component weight (all tiers)
_NOISE = 0.35
_U_SPREAD = 0.35  # within-class angular spread of the learnable direction
_DISTRACTOR_ALPHA = 0.80
_WHOLE_TILE_DILUTION = 0.5  # small object seen weakly at whole-image zoom


def _unit(v: np.ndarray) -> np.ndarray:
    return v / max(np.linalg.norm(v), 1e-12)


def build_study_corpus(
    root: str,
    *,
    n_images: int = 600,
    n_pos_per_cat: int = 24,
    instances_per_tier: int = 3,
    dim: int = 128,
    knn_k: int = 8,
    seed: int = 0,
    dataset_name: str = "study",
):
    """One dataset, `3 * instances_per_tier` categories with graded
    difficulty. Returns (gdm, ds, categories) where categories maps
    name -> tier. Every image: 4 quadrant tiles (zoom 1) + 1 whole tile
    (zoom 2), like the multiscale ingest of a small image."""
    rng = np.random.default_rng(seed)
    emb = HashEmbedding(d=dim)
    gdm = GlobalDataManager(root)
    paths = [f"img_{i:05d}.jpg" for i in range(n_images)]
    ds = gdm.create_dataset(dataset_name, paths=paths)

    categories: Dict[str, str] = {}
    role = {}  # dbidx -> (cat, base_vec_unnormalized, is_positive)
    taken = np.zeros(n_images, dtype=bool)
    for tier, tp in TIERS.items():
        for j in range(instances_per_tier):
            cat = f"{tier}{j}"
            categories[cat] = tier
            q = emb.from_string(string=f"a {cat}")
            u = _unit(rng.normal(size=dim).astype(np.float32))
            u = _unit(u - (u @ q) * q)  # learnable direction, invisible to q
            free = np.where(~taken)[0]
            pick = rng.choice(free, size=n_pos_per_cat + tp["n_distractors"],
                              replace=False)
            taken[pick] = True
            lo, hi = tp["alpha"]
            # evenly graded visibility: the head ranks zero-shot, the tail
            # sits below the background ceiling until feedback learns u
            alphas = np.linspace(hi, lo, n_pos_per_cat)
            for a, i in zip(alphas, pick[:n_pos_per_cat]):
                # per-positive class direction u_i: the class is a cone, not
                # a point — one label gives a noisy centroid estimate, so
                # learner sample-efficiency matters
                u_i = _unit(u + _U_SPREAD
                            * _unit(rng.normal(size=dim).astype(np.float32)))
                role[int(i)] = (cat, float(a) * q + _BETA * u_i, True)
            for i in pick[n_pos_per_cat:]:
                role[int(i)] = (cat, _DISTRACTOR_ALPHA * q, False)

    dbidx, zoom, boxes, vecs = [], [], [], []
    gt_dbidx, gt_boxes, gt_desc = [], [], []
    is_pos = {cat: np.zeros(n_images, dtype=np.float32) for cat in categories}
    for i in range(n_images):
        planted = role.get(i)
        target_tile = int(rng.integers(0, 4)) if planted else -1
        tiles = [(1, qd) for qd in _QUADS] + [(2, (0.0, 0.0, IMG, IMG))]
        for t, (zl, (x1, y1, x2, y2)) in enumerate(tiles):
            g = rng.normal(size=dim).astype(np.float32) / np.sqrt(dim)
            v = _unit(g)
            if planted:
                cat, base, _pos = planted
                if t == target_tile:
                    v = _unit(base + _NOISE * v)
                elif zl == 2:  # whole-image view sees the object weakly
                    v = _unit(_WHOLE_TILE_DILUTION * base + _NOISE * v)
            dbidx.append(i)
            zoom.append(zl)
            boxes.append((x1, y1, x2, y2))
            vecs.append(v)
        if planted and planted[2]:
            cat = planted[0]
            is_pos[cat][i] = 1.0
            gt_dbidx.append(i)
            gt_boxes.append(_QUADS[target_tile])
            gt_desc.append(cat)

    meta, order = VectorMeta.from_arrays(
        np.array(dbidx), np.array(zoom), np.array(boxes, dtype=np.float32)
    )
    V = np.stack(vecs)[order].astype(np.float32)
    index = MultiscaleIndex(embedding=emb, vectors=V, meta=meta)
    index.save(ds.index_path("multiscale"), model_name=f"hash-{dim}")
    KNNGraph.build(V, n_neighbors=knn_k).save(
        f"{ds.index_path('multiscale')}/knn_graph/"
    )

    gt = BoxTable(
        dbidx=np.array(gt_dbidx, dtype=np.int32),
        boxes=np.array(gt_boxes, dtype=np.float32),
        description=gt_desc,
        marked_accepted=np.ones(len(gt_dbidx), dtype=bool),
    )
    qgt = pd.DataFrame(is_pos)
    ds.save_ground_truth(gt, qgt)
    return gdm, ds, categories


STUDY_METHODS = (
    "plain",
    "rocchio_update",
    "log_reg2",
    "multi_reg",
    "knn_prop2",
    "pseudo_lr",
    "active_search",
    "lknn",
)

# Study-specific option overrides on top of configs.get_default_config: the
# registry defaults keep the reference's `gamma: fixed` (configs.py:3-49),
# which ignores the CLIP scores for the initial LKNN ranking — on any corpus
# that makes active search start from a uniform prior (random exploration).
# The reference's own better-performing configuration is gamma mode 'clip'
# with sigmoid calibration (`loops/active_search.py:44-66`); the study runs
# that, like the paper's sweeps did.
STUDY_OVERRIDES: Dict[str, dict] = {
    "active_search": {
        "gamma": {"mode": "clip", "calibration": "sigmoid", "a": 2.0,
                  "b": 0.0}
    },
    "lknn": {"use_clip_as_gamma": True},
}

# lknn's clip-as-gamma mode requires a calibrator mapping raw cosine scores
# into (0,1); the reference wires the GROUND-TRUTH Platt calibrator through
# the bench-only pass_ground_truth hook (`basic_types.py:64`,
# `seesaw_session.py:47-49`, `loops/active_search.py:164-190`) — without it
# the raw scores are used verbatim and the model asserts. The study follows
# the reference's protocol for exactly this method.
STUDY_PASS_GT = frozenset({"lknn"})


def run_study(
    root: str,
    results_dir: str,
    *,
    methods: tuple = STUDY_METHODS,
    categories: Optional[List[str]] = None,
    n_batches: int = 40,
    batch_size: int = 3,
    # must demand nearly ALL positives: with a shallow target the zero-shot-
    # visible head alone satisfies it and every method ties before feedback
    # can matter (the invisible tail is where methods separate)
    max_results: int = 22,
    shortlist_size: int = 40,
    dataset_name: str = "study",
) -> pd.DataFrame:
    """Drive method x category sessions through the REAL bench runner and
    return the per-session metrics frame."""
    from ..analysis import add_metrics
    from .harness import BenchRunner, get_all_session_summaries

    gdm = GlobalDataManager(root)
    ds = gdm.get_dataset(dataset_name)
    cats = categories if categories is not None else ds.load_eval_categories()
    os.makedirs(results_dir, exist_ok=True)
    runner = BenchRunner(root, results_dir, redirect_output=False)

    # single-item-per-round planners (greedy/ENS return one image per next())
    # get the same SEEN budget as the batched methods, not the same round
    # count — metrics are per-seen, so equal exposure is the fair comparison
    single_item = {"active_search", "lknn"}

    for method in methods:
        n_rounds = n_batches * (batch_size if method in single_item else 1)
        for cat in cats:
            p = SessionParams(
                index_spec=IndexSpec(d_name=dataset_name, i_name="multiscale"),
                interactive=method,
                batch_size=batch_size,
                shortlist_size=shortlist_size,
                agg_method="avg_score",
                aug_larger="all",
                interactive_options={
                    **(get_default_config(method) or {}),
                    **STUDY_OVERRIDES.get(method, {}),
                },
                pass_ground_truth=method in STUDY_PASS_GT,
            )
            b = BenchParams(
                name=method,
                ground_truth_category=cat,
                qstr=f"a {cat}",
                query_template="a {}",
                n_batches=n_rounds,
                max_results=max_results,
            )
            runner.run_loop(b, p)

    summaries = get_all_session_summaries(results_dir, force_recompute=True)
    return add_metrics(summaries)


def study_tables(metrics_df: pd.DataFrame, categories: Dict[str, str]) -> dict:
    """The committed artifact: per-method means, per-tier breakdown and
    win/tie/loss vs the zero-shot baseline (reference `figures.py:79-229`)."""
    from ..analysis import better_same_worse, method_means

    df = metrics_df.copy()
    df["tier"] = df["category"].map(lambda c: categories.get(c, "?"))
    cols = ["ndcg_score", "average_precision", "reciprocal_rank",
            "rank_third", "rank_tenth", "nfound"]
    overall = method_means(df, metrics=cols).round(4)
    by_tier = (
        df.groupby(["tier", "variant"])[["ndcg_score", "average_precision"]]
        .mean().round(4)
    )
    bsw = {}
    for m in sorted(df.variant.unique()):
        if m == "plain":
            continue
        bsw[m] = better_same_worse(
            df, "ndcg_score", baseline="plain", other=m, tol=1e-4
        )
    # rank_tenth is the sessions' "time-to-find-10" in images-seen units
    # (wall time is machine-bound; seen-count is the protocol-level cost)
    finds = df.groupby("variant")["rank_tenth"].apply(
        lambda s: float(np.median(s.replace(np.inf, np.nan).dropna()))
        if s.replace(np.inf, np.nan).notna().any() else None
    )
    return {
        "overall": json.loads(overall.to_json(orient="index")),
        "by_tier": json.loads(
            by_tier.reset_index().to_json(orient="records")
        ),
        "better_same_worse_ndcg_vs_plain": bsw,
        "median_rank_of_10th_found": json.loads(finds.to_json()),
        "n_sessions": int(len(df)),
    }
