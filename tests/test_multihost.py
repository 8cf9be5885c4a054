"""Multi-host (multi-PROCESS) validation of parallel.multihost.

Spawns two separate Python processes that jax.distributed-initialize
against a local coordinator, build one GLOBAL 4-device mesh (2 virtual CPU
devices per process — the same topology shape as two TPU hosts on DCN),
and run a shard_map psum whose result every process checks. This is the
mechanism SURVEY §5.8 maps Ray's multi-host role onto; single-host meshes
cover the north-star scale (SCALING.md), so this only proves the init path
and host-range fan-out are sound.
"""
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

from seesaw_tpu.parallel.multihost import ingest_file_range


def test_ingest_file_range_partitioning():
    ranges = [ingest_file_range(1000003, i, 8) for i in range(8)]
    assert ranges[0][0] == 0 and ranges[-1][1] == 1000003
    for (a, b), (c, d) in zip(ranges, ranges[1:]):
        assert b == c and a < b  # contiguous, disjoint, non-empty
    # degenerate: more hosts than files
    rs = [ingest_file_range(3, i, 8) for i in range(8)]
    covered = sorted(x for lo, hi in rs for x in range(lo, hi))
    assert covered == [0, 1, 2]


_CHILD = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from seesaw_tpu.parallel.multihost import init_multihost, ingest_file_range

    nproc, pid = init_multihost(
        coordinator_address={coord!r},
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    assert nproc == 2
    assert len(jax.devices()) == 4, jax.devices()  # GLOBAL device view

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(jax.devices()), ("data",))
    # each process contributes its local slice of a global (4, 8) array
    global_shape = (4, 8)
    local = np.full((2, 8), float(pid + 1), dtype=np.float32)
    sharding = NamedSharding(mesh, P("data"))
    arr = jax.make_array_from_process_local_data(sharding, local, global_shape)

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())
    def total(x):
        return jax.lax.psum(x.sum(), "data")

    out = float(np.asarray(jax.device_get(total(arr))))
    # processes 0 and 1 contribute 2*8*1 and 2*8*2
    assert out == 16.0 + 32.0, out

    lo, hi = ingest_file_range(10)
    assert (lo, hi) == ((0, 5) if pid == 0 else (5, 10))
    print(f"child {{pid}} ok")
    """
)


@pytest.mark.timeout(180)
def test_two_process_global_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    repo = str(Path(__file__).resolve().parent.parent)
    script = _CHILD.format(repo=repo, coord=coord)
    f = tmp_path / "child.py"
    f.write_text(script)

    procs = [
        subprocess.Popen(
            [sys.executable, str(f), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=150)
        outs.append(out)
        assert p.returncode == 0, f"child {i} failed:\n{out}"
    assert "child 0 ok" in outs[0] and "child 1 ok" in outs[1]
