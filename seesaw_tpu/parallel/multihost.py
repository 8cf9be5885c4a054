"""Multi-host initialization + ingestion fan-out (SURVEY §5.8).

The reference distributes across hosts with Ray (gRPC actors + object
store, `/root/reference/seesaw/services.py:47-78`, ray.data shuffles
`multiscale_tools.py:214-221`). The TPU-native equivalent is
`jax.distributed`: once initialized, `jax.devices()` spans every host in
the slice, `parallel.make_mesh()` builds a GLOBAL mesh, and the existing
`shard_map` programs (sharded retrieval, kNN, propagation, data-parallel
fine-tune) run unchanged — XLA routes collectives over ICI within a host
and DCN across hosts.

A single v5e-8 host covers the north-star scale targets (SCALING.md), so
multi-host is opt-in: call `init_multihost()` before any jax use. On real
TPU pod slices all arguments auto-detect from the TPU environment; for
CPU-process testing (tests/test_multihost.py) they are passed explicitly.

Host-level work division (ingestion) does NOT need collectives at all:
each host ingests a disjoint file range (`ingest_file_range`) and the
per-host parquet shards concatenate into one index — the same
embarrassing parallelism the reference got from ray.data, without a
cluster runtime.
"""
from __future__ import annotations

from typing import Optional, Tuple


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> Tuple[int, int]:
    """Initialize jax.distributed and return (process_count, process_index).

    Must run before the first jax backend use in the process. On TPU pods
    call with no arguments (everything auto-detects); explicit arguments
    are for CPU multi-process tests and nonstandard setups.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.process_count(), jax.process_index()


def ingest_file_range(
    n_files: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """This host's disjoint [lo, hi) slice of the corpus for ingestion
    fan-out (contiguous ranges keep the global row order: concatenating the
    per-host vector parquets reproduces the single-host index exactly)."""
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    per = -(-n_files // process_count)
    lo = min(process_index * per, n_files)
    return lo, min(lo + per, n_files)
