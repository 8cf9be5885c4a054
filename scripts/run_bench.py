#!/usr/bin/env python
"""CLI: run benchmark sessions from yaml config files
(reference scripts/run_bench.py; the Ray actor fleet is replaced by a
process pool — each worker owns its own device context serially)."""
import argparse
import math
import os
import random
import string
import sys
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _run_one(args_tuple):
    root_dir, results_dir, cfg = args_tuple
    from seesaw_tpu.bench.harness import BenchRunner

    br = BenchRunner(root_dir, results_dir, redirect_output=True)
    b, p = cfg
    try:
        return br.run_loop(b, p)
    except Exception as e:
        print(f"bench run failed: {e!r}", file=sys.stderr)
        return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--dryrun", action="store_true")
    parser.add_argument("--dryrun_max_iter", type=int, default=3)
    parser.add_argument("configs", nargs="+")
    args = parser.parse_args()

    from seesaw_tpu.bench.configs import generate_benchmark_configs, get_param_hash
    from seesaw_tpu.bench.harness import get_all_session_summaries
    from seesaw_tpu.configs import expand_configs
    from seesaw_tpu.dataset import GlobalDataManager

    gdm = GlobalDataManager(args.root_dir)
    all_cfgs = []
    for path in args.configs:
        yl = yaml.safe_load(open(path))
        base_configs = expand_configs(yl["variants"])
        bench_template = dict(yl["shared_bench_params"])
        max_classes = math.inf
        if args.dryrun:
            bench_template["n_batches"] = args.dryrun_max_iter
            bench_template["max_results"] = args.dryrun_max_iter
            max_classes = 1
        cfgs = generate_benchmark_configs(
            gdm,
            datasets=yl["datasets"],
            base_configs=base_configs,
            s_template=yl["shared_session_params"],
            b_template=bench_template,
            max_classes_per_dataset=max_classes,
        )
        print(f"generated {len(cfgs)} configs from {path}")
        all_cfgs.extend(cfgs)

    # no duplicate (name, dataset, category, params)
    seen = set()
    for b, p in all_cfgs:
        key = (b.name, p.index_spec.d_name, b.ground_truth_category,
               get_param_hash(p.model_dump_json()))
        assert key not in seen, f"duplicate config {key}"
        seen.add(key)

    exp = "".join(random.choice(string.ascii_letters) for _ in range(10))
    results_dir = f"{args.output_dir}/bench_{exp}/"
    os.makedirs(results_dir, exist_ok=True)
    print(f"writing results to {results_dir}")

    work = [(args.root_dir, results_dir, cfg) for cfg in all_cfgs]
    random.shuffle(work)
    t0 = time.time()
    if args.num_workers <= 1 or args.dryrun:
        for w in work:
            _run_one(w)
    else:
        with ProcessPoolExecutor(args.num_workers) as pool:
            list(pool.map(_run_one, work))
    print(f"done in {time.time() - t0:.1f}s; summarizing...")
    df = get_all_session_summaries(results_dir, force_recompute=True)
    print(df.head(20))
    print(f"results in {results_dir}")


if __name__ == "__main__":
    main()
