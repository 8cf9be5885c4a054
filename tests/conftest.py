"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set flags before jax initializes. Real-TPU benchmarking happens in
bench.py, not in tests — tests are hermetic and device-count-parametric.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
