"""Device profiling hooks (SURVEY §5.1: keep the action-log schema, add jax
profiler hooks).

`device_trace(dir)` wraps `jax.profiler.trace` as a context manager that
tolerates nested/duplicate use and records wall time; `annotate(name)` wraps
`jax.profiler.TraceAnnotation` so per-round phases (refine / rank / encode)
show up as named spans in the trace viewer. Enabled in serving via
`SeesawServer(profile_dir=...)` / `scripts/session_server.py --profile_dir`
and in benchmarks via SEESAW_PROFILE_DIR.
"""
from __future__ import annotations

import contextlib
import os
import time
from pathlib import Path

_active = False


@contextlib.contextmanager
def device_trace(trace_dir: str | os.PathLike):
    """Write a jax profiler trace (TensorBoard/perfetto format) to trace_dir.
    Re-entrant: inner uses are no-ops while a trace is active."""
    global _active
    if _active:
        yield None
        return
    import jax

    Path(trace_dir).mkdir(parents=True, exist_ok=True)
    _active = True
    t0 = time.perf_counter()
    try:
        with jax.profiler.trace(str(trace_dir)):
            yield trace_dir
    finally:
        _active = False
        dt = time.perf_counter() - t0
        (Path(trace_dir) / "trace_meta.txt").write_text(
            f"wall_seconds={dt:.3f}\n"
        )


def annotate(name: str):
    """Named span inside a device trace (also safe outside one)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace_from_env(var: str = "SEESAW_PROFILE_DIR"):
    """Trace if the env var names a directory; plain no-op otherwise."""
    d = os.environ.get(var)
    if not d:
        yield None
        return
    with device_trace(d) as out:
        yield out
