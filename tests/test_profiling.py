"""jax profiler hooks: trace directory written, annotations safe, env gate."""
import os

import jax.numpy as jnp
import numpy as np

from seesaw_tpu.utils.profiling import annotate, device_trace, maybe_trace_from_env


def test_device_trace_writes_artifacts(tmp_path):
    d = tmp_path / "trace"
    with device_trace(d):
        with annotate("unit-span"):
            x = jnp.ones((128, 128))
            float((x @ x).sum())
        # nested use is a no-op, not an error
        with device_trace(d):
            pass
    files = list(d.rglob("*"))
    assert (d / "trace_meta.txt").exists()
    assert any("plugins" in str(f) or f.suffix in (".json", ".gz", ".pb", ".trace")
               for f in files if f.is_file()), files


def test_annotate_without_trace():
    with annotate("no-trace-span"):
        assert float(jnp.ones(3).sum()) == 3.0


def test_env_gate(tmp_path, monkeypatch):
    monkeypatch.delenv("SEESAW_PROFILE_DIR", raising=False)
    with maybe_trace_from_env() as out:
        assert out is None
    monkeypatch.setenv("SEESAW_PROFILE_DIR", str(tmp_path / "envtrace"))
    with maybe_trace_from_env() as out:
        assert out is not None
        float(jnp.ones(4).sum())
    assert (tmp_path / "envtrace" / "trace_meta.txt").exists()
