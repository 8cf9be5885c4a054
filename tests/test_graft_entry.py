"""Driver contract: dryrun_multichip must compile+run on a virtual 8-device
CPU mesh. entry() uses the full ViT-B/32 (slow to compile on CPU) — checked
for structure only here; the driver compile-checks it on the real chip."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_signature():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    assert callable(fn) and isinstance(args, tuple)
    assert args[0].shape == (4, 224, 224, 3)
