"""Benchmark/session analysis: metrics frames, method comparisons, timing.

Covers the reference's analysis layer (`figures.py:79-229`,
`user_data_analysis.py:27-247`) minus plotting: per-session ranking metrics
from bench summaries, side-by-side method pivots with better/same/worse
counts, and action-log timing extraction for user sessions.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

from .basic_types import SessionState
from .metrics import compute_metrics


def add_metrics(summary_df: pd.DataFrame) -> pd.DataFrame:
    """Attach AP/nDCG/ranks to a bench summary frame (one row per session,
    as produced by bench.harness.get_all_session_summaries)."""
    rows = []
    for _, r in summary_df.iterrows():
        if not r.get("has_result", False) or r.get("ntotal", 0) == 0:
            rows.append({})
            continue
        m = compute_metrics(
            hit_indices=np.asarray(r["hit_indices"]),
            batch_size=r.get("batch_size", 1),
            nseen=int(r["nseen"]),
            ntotal=int(r["ntotal"]),
            max_results=r.get("max_results"),
        )
        rows.append(m)
    return pd.concat([summary_df.reset_index(drop=True), pd.DataFrame(rows)], axis=1)


def side_by_side(
    metrics_df: pd.DataFrame,
    metric: str,
    variant_col: str = "variant",
    key_cols: List[str] = ("dataset", "category"),
) -> pd.DataFrame:
    """Pivot: one row per (dataset, category), one column per variant."""
    return metrics_df.pivot_table(
        index=list(key_cols), columns=variant_col, values=metric, aggfunc="mean"
    )


def better_same_worse(
    metrics_df: pd.DataFrame,
    metric: str,
    baseline: str,
    other: str,
    tol: float = 1e-6,
    variant_col: str = "variant",
    key_cols: List[str] = ("dataset", "category"),
) -> dict:
    """Per-query win/tie/loss counts of `other` vs `baseline` (reference
    `figures.py:79-229` comparison tables)."""
    piv = side_by_side(metrics_df, metric, variant_col, key_cols)
    both = piv[[baseline, other]].dropna()
    diff = both[other] - both[baseline]
    return {
        "better": int((diff > tol).sum()),
        "same": int((diff.abs() <= tol).sum()),
        "worse": int((diff < -tol).sum()),
        "mean_delta": float(diff.mean()) if len(diff) else float("nan"),
        "n": int(len(diff)),
    }


def method_means(metrics_df: pd.DataFrame, metrics: List[str] = ("reciprocal_rank", "ndcg_score", "average_precision"),
                 variant_col: str = "variant") -> pd.DataFrame:
    """Mean metric per method over all sessions (the reference's sweep table)."""
    return metrics_df.groupby(variant_col)[list(metrics)].mean()


# -- action-log timing ------------------------------------------------------
def action_log_frame(state: SessionState) -> pd.DataFrame:
    """Flatten a session's action log into a frame with per-event deltas."""
    rows = [
        dict(logger=e.logger, message=e.message, time=e.time, seen=e.seen,
             accepted=e.accepted)
        for e in state.action_log
    ]
    df = pd.DataFrame(rows)
    if len(df):
        df = df.sort_values("time").reset_index(drop=True)
        df["delta"] = df["time"].diff().fillna(0.0)
    return df


def phase_durations(state: SessionState) -> pd.DataFrame:
    """Durations of matched start/end phases (next.start->next.end,
    refine.start->refine.end)."""
    df = action_log_frame(state)
    out = []
    for phase in ("next", "refine"):
        starts = df[df.message == f"{phase}.start"].time.values
        ends = df[df.message == f"{phase}.end"].time.values
        n = min(len(starts), len(ends))
        for s, e in zip(starts[:n], ends[:n]):
            out.append(dict(phase=phase, start=s, duration=e - s))
    return pd.DataFrame(out)


def accept_timeline(state: SessionState) -> pd.DataFrame:
    """Cumulative accepted count over server events — time-to-find-k data
    (reference user-study analysis)."""
    df = action_log_frame(state)
    if not len(df):
        return df
    t0 = df.time.iloc[0]
    return pd.DataFrame(
        dict(elapsed=df.time - t0, accepted=df.accepted, seen=df.seen)
    )


def time_to_find_k(state: SessionState, k: int) -> Optional[float]:
    tl = accept_timeline(state)
    if not len(tl):
        return None
    hit = tl[tl.accepted >= k]
    return float(hit.elapsed.iloc[0]) if len(hit) else None
