"""CLI: offline method-comparison metric study on the synthetic graded
corpus (seesaw_tpu.bench.study) — the repo's miniature of the reference's
`figures/breakdown.parquet` quality evidence.

Runs hermetically on CPU (forces JAX_PLATFORMS=cpu before import so it never
counts as this environment's one TPU process). Writes:
  <out>.json     — method means / per-tier breakdown / win-tie-loss tables
  <out>.parquet  — the raw per-session metrics frame
"""
import argparse
import json
import os
import sys
import tempfile
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/method_study",
                    help="output prefix (writes <out>.json and <out>.parquet)")
    ap.add_argument("--n-images", type=int, default=600)
    ap.add_argument("--n-pos", type=int, default=24)
    ap.add_argument("--instances-per-tier", type=int, default=3)
    ap.add_argument("--n-batches", type=int, default=40)
    ap.add_argument("--methods", default=None,
                    help="comma-separated subset of methods")
    ap.add_argument("--seeds", default="0,1",
                    help="comma-separated corpus seeds; one dataset each")
    ap.add_argument("--workdir", default=None,
                    help="keep corpus+sessions here (default: temp dir)")
    args = ap.parse_args()

    from seesaw_tpu.bench.study import (
        STUDY_METHODS, build_study_corpus, run_study, study_tables,
    )

    methods = (
        tuple(args.methods.split(",")) if args.methods else STUDY_METHODS
    )
    workdir = args.workdir or tempfile.mkdtemp(prefix="method_study_")
    root = os.path.join(workdir, "root")
    results = os.path.join(workdir, "results")

    t0 = time.time()
    seeds = [int(s) for s in args.seeds.split(",")]
    categories = {}
    frames = []
    for seed in seeds:
        dname = f"study{seed}"
        print(f"[study] building corpus {dname} under {root}", flush=True)
        _, _, cats = build_study_corpus(
            root, n_images=args.n_images, n_pos_per_cat=args.n_pos,
            instances_per_tier=args.instances_per_tier, seed=seed,
            dataset_name=dname,
        )
        categories.update(cats)
        print(f"[study] {dname} ready ({time.time() - t0:.1f}s); "
              f"running {len(methods)} methods x {len(cats)} categories",
              flush=True)
        frames.append(run_study(
            root, os.path.join(results, dname), methods=methods,
            n_batches=args.n_batches, dataset_name=dname,
        ))
    import pandas as pd

    df = pd.concat(frames, ignore_index=True)
    tables = study_tables(df, categories)
    tables["config"] = dict(
        n_images=args.n_images, n_pos_per_cat=args.n_pos,
        instances_per_tier=args.instances_per_tier,
        n_batches=args.n_batches, methods=list(methods), seeds=seeds,
        wall_s=round(time.time() - t0, 1),
    )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(f"{args.out}.json", "w") as f:
        json.dump(tables, f, indent=2)
    try:
        df.drop(columns=["session_params", "bench_params"], errors="ignore") \
            .to_parquet(f"{args.out}.parquet")
    except Exception as e:
        print(f"[study] parquet write skipped: {e!r}")

    print(f"[study] wrote {args.out}.json ({time.time() - t0:.1f}s total)")
    print(json.dumps(tables["overall"], indent=2))


if __name__ == "__main__":
    main()
