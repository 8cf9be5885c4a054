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
