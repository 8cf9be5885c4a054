"""Driver contract: dryrun_multichip must compile+run on a virtual 8-device
CPU mesh. entry() uses the full ViT-B/32 (slow to compile on CPU) — checked
for structure only here; the driver compile-checks it on the real chip."""
import sys

import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_driver_conditions():
    """Regression for round-1 failure: the driver calls dryrun_multichip(8) in
    a process WITHOUT the conftest virtual-mesh env; dryrun must self-configure
    the virtual CPU mesh (or subprocess-fallback) rather than assert on device
    count."""
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "_GRAFT_DRYRUN_CHILD")
    }
    repo = str(Path(__file__).resolve().parent.parent)
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_entry_signature():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    assert callable(fn) and isinstance(args, tuple) and len(args) == 2
    params, pixels = args
    assert pixels.shape == (4, 224, 224, 3)
    # params must be the fn's ARGUMENT, not a closure constant: a captured
    # 350MB tree overflows the axon remote-compile request (HTTP 413)
    assert isinstance(params, dict) and "vision" in params
    for cell in fn.__closure__ or ():
        v = cell.cell_contents
        assert not (isinstance(v, dict) and "vision" in v), (
            "params captured in closure — bakes 350MB into the compile request"
        )
        shape = getattr(v, "shape", None)
        if isinstance(shape, tuple):
            assert int(np.prod(shape)) < 1_000_000, f"large closure array {shape}"
