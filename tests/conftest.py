"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests are hermetic and device-count-parametric; real-TPU benchmarking happens
in bench.py only. Note: this environment's axon site hooks force
JAX_PLATFORMS=axon (remote TPU) at interpreter start, so the env var alone is
not enough — jax.config must be updated before any computation runs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# -- fast tier ---------------------------------------------------------------
# `pytest -m fast` runs the ~220-test core tier (<5 min on this 1-vCPU box)
# for in-round iteration; the full suite stays the commit gate. The list is
# data-driven from a full --durations=0 run: every test whose setup+call
# cost <= 1s, plus the cheapest test of each file not otherwise covered
# (regenerate: see scripts/update_fast_tier.py).
import pathlib

import pytest

_FAST_LIST = pathlib.Path(__file__).parent / "fast_tier.txt"


def pytest_collection_modifyitems(config, items):
    if not _FAST_LIST.exists():
        return
    fast = {
        ln.strip() for ln in _FAST_LIST.read_text().splitlines() if ln.strip()
    }
    for item in items:
        if item.nodeid in fast:
            item.add_marker(pytest.mark.fast)
