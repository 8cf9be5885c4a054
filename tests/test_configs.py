"""Config system: choose-expansion, template merge, yaml variants, and the
run_bench CLI end-to-end (dryrun) over the synthetic dataset."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from seesaw_tpu import configs
from synth import build_synthetic_root, CATEGORY


def test_space_size_and_sampling():
    base = {
        "a": {"choose": [1, 2, 3]},
        "b": "fixed",
        "nested": {"c": {"choose": [True, False]}},
    }
    assert configs.space_size(base) == 6
    out = configs.generate_method_configs(base, max_trials=100)
    assert len(out) == 6
    keys = {(c["a"], c["nested"]["c"]) for c in out}
    assert len(keys) == 6
    assert all(c["sample_id"].startswith("sample_") for c in out)
    # single config: sample_id None
    single = configs.generate_method_configs({"x": 1}, max_trials=5)
    assert len(single) == 1 and single[0]["sample_id"] is None


def test_get_session_params_merge():
    p = configs.get_session_params(
        {"batch_size": 3, "shortlist_size": 40},
        {"interactive": "plain", "agg_method": "avg_vector", "unknown_key": 1},
        {"d_name": "ds", "i_name": "idx", "c_name": None},
    )
    assert p.batch_size == 3
    assert p.agg_method == "avg_vector"
    assert p.index_spec.d_name == "ds"


def test_make_session_params_defaults():
    p = configs.make_session_params("multi_reg", "d", "i")
    assert p.interactive == "multi_reg"
    assert p.interactive_options["label_loss_type"] == "ce_loss"


def test_yaml_variant_loading(tmp_path):
    cfg = {
        "datasets": ["synth"],
        "shared_session_params": {"batch_size": 2, "shortlist_size": 15},
        "shared_bench_params": {
            "n_batches": 4, "max_results": 3, "query_template": "a {}",
        },
        "variants": [
            {"name": "plain_v", "interactive": "plain", "index_name": "multiscale"},
            {"name": "rocchio_v", "interactive": "rocchio_update",
             "index_name": "multiscale",
             "rocchio_alpha": 1.0, "rocchio_beta": {"choose": [0.5, 0.9]},
             "rocchio_gamma": 0.1, "max_samples": 2},
        ],
    }
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))

    p = configs.get_session_params_from_yaml(
        "plain_v", "synth", "multiscale", config_path=str(path)
    )
    assert p.interactive == "plain" and p.batch_size == 2

    variants = configs.expand_configs(cfg["variants"])
    names = [v["name"] for v in variants]
    assert names.count("rocchio_v") == 2  # both choose values sampled


@pytest.mark.slow
def test_run_bench_cli_dryrun(tmp_path):
    root = tmp_path / "root"
    build_synthetic_root(str(root))
    cfg = {
        "datasets": ["synth"],
        "shared_session_params": {"batch_size": 2, "shortlist_size": 15},
        "shared_bench_params": {
            "n_batches": 5, "max_results": 5, "query_template": "a {}",
        },
        "variants": [
            {"name": "plain_v", "interactive": "plain", "index_name": "multiscale"},
        ],
    }
    cfg_path = tmp_path / "bench.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "run_bench.py"),
         "--root_dir", str(root), "--output_dir", str(out_dir),
         "--dryrun", str(cfg_path)],
        capture_output=True, text=True, cwd=str(repo),
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
             "JAX_PLATFORMS": "cpu", "HF_HUB_OFFLINE": "1",
             "PYTHONPATH": str(repo)},
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summaries = list(out_dir.glob("bench_*/**/summary.json"))
    assert len(summaries) == 1
    import json

    data = json.loads(summaries[0].read_text())
    assert data["result"] is not None
    assert data["bench_params"]["ground_truth_category"] == CATEGORY


def test_run_bench_cli_process_pool(tmp_path):
    """Full (non-dryrun) run through the ProcessPoolExecutor path with two
    variants and two workers: summary parquet aggregates all sessions."""
    root = tmp_path / "root"
    build_synthetic_root(str(root))
    cfg = {
        "datasets": ["synth"],
        "shared_session_params": {"batch_size": 2, "shortlist_size": 15},
        "shared_bench_params": {
            "n_batches": 4, "max_results": 4, "query_template": "a {}",
        },
        "variants": [
            {"name": "plain_v", "interactive": "plain", "index_name": "multiscale"},
            {"name": "random_v", "interactive": "random", "index_name": "multiscale"},
        ],
    }
    cfg_path = tmp_path / "bench2.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "out2"
    out_dir.mkdir()

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "run_bench.py"),
         "--root_dir", str(root), "--output_dir", str(out_dir),
         "--num_workers", "2", str(cfg_path)],
        capture_output=True, text=True, timeout=900, cwd=str(repo),
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(repo)},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summaries = list(out_dir.rglob("summary.json"))
    assert len(summaries) == 2
    import pandas as pd

    from seesaw_tpu.bench.harness import get_all_session_summaries

    df = get_all_session_summaries(str(out_dir), force_recompute=True)
    assert set(df.variant) == {"plain_v", "random_v"}
    assert (df.nseen > 0).all()
