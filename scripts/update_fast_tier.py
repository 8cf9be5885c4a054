"""Regenerate tests/fast_tier.txt from a full-suite durations log.

Usage:
  python -m pytest tests/ -q --durations=0 > /tmp/suite.log
  python scripts/update_fast_tier.py /tmp/suite.log

Selection rule: every test whose aggregated setup+call+teardown time is
<= 1s, plus the cheapest test of each file not otherwise covered, so the
fast tier touches every subsystem while staying < 5 min wall.
"""
import re
import subprocess
import sys
from collections import defaultdict
from pathlib import Path


def main(log_path: str):
    per = defaultdict(float)
    for ln in Path(log_path).read_text().splitlines():
        m = re.match(r"\s*([\d.]+)s (call|setup|teardown)\s+(\S+)", ln)
        if m:
            per[m.group(3)] += float(m.group(1))
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True,
    ).stdout.splitlines()
    allids = [l.strip() for l in out if "::" in l]
    fast = [n for n in allids if per.get(n, 0.0) <= 1.0]
    covered = {n.split("::")[0] for n in fast}
    for f in sorted({n.split("::")[0] for n in allids} - covered):
        fast.append(min((n for n in allids if n.startswith(f)),
                        key=lambda n: per.get(n, 0.0)))
    dest = Path(__file__).resolve().parent.parent / "tests" / "fast_tier.txt"
    dest.write_text("\n".join(sorted(fast)) + "\n")
    print(f"{len(fast)} tests -> {dest} "
          f"(raw {sum(per.get(n, 0.0) for n in fast):.0f}s)")


if __name__ == "__main__":
    main(sys.argv[1])
