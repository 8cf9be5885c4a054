"""Differential: the generated TypeScript wire-protocol types cover the
reference frontend's contract.

The reference generates `frontend/src/basic_types.ts` from its pydantic
models with pydantic2ts and the Vue app (`SeesawApp.vue`, `m-annotator.vue`)
is compiled against those interfaces. `scripts/generate_ts_types.py` is our
pydantic2ts equivalent; this test parses BOTH .ts files into
{interface: {field: (type, optional)}} and asserts ours is a compatible
SUPERSET: every interface and field the Vue app was built against exists in
our output with a compatible type and optionality. (The reference's checked
-in .ts is STALE relative to its own current pydantic models — e.g.
`SessionParams` there predates `start_policy`/`aug_larger` — so equality is
the wrong check; superset-compatibility is what frontend interop needs.)
"""
from __future__ import annotations

import re
from pathlib import Path

REF_TS = Path("/root/reference/frontend/src/basic_types.ts")


def parse_ts(text: str) -> dict:
    """Parse `export interface X { field?: type; ... }` blocks (the only
    construct pydantic2ts emits) into {iface: {field: (type, optional)}}.
    Multi-line index-signature types collapse to 'dict'."""
    out = {}
    for m in re.finditer(
        r"export interface (\w+) \{(.*?)\n\}", text, re.DOTALL
    ):
        name, body = m.group(1), m.group(2)
        body = re.sub(r"\{[^{}]*\[k: string\][^{}]*\}", "dict", body)
        fields = {}
        for fm in re.finditer(r"^\s*(\w+)(\??):\s*([^;]+);", body, re.MULTILINE):
            fields[fm.group(1)] = (
                " ".join(fm.group(3).split()), fm.group(2) == "?"
            )
        out[name] = fields
    return out


def compatible(ours: str, ref: str) -> bool:
    if ours == ref:
        return True
    # our Literal fields render as string-literal unions where the stale
    # reference file has plain `string`
    if ref == "string" and re.fullmatch(r'"[^"]*"( \| "[^"]*")*', ours):
        return True
    # session_id-style stale fields aside, unions may gain members
    ref_parts = {p.strip() for p in ref.split("|")}
    our_parts = {p.strip() for p in ours.split("|")}
    return ref_parts <= our_parts


def test_generated_ts_covers_reference_contract():
    from scripts.generate_ts_types import generate

    ours = parse_ts(generate())
    ref = parse_ts(REF_TS.read_text())
    assert ref, "reference basic_types.ts parsed to nothing"

    missing = []
    for iface, fields in ref.items():
        if iface not in ours:
            missing.append(f"interface {iface}")
            continue
        for fname, (ftype, fopt) in fields.items():
            if fname == "session_id" and iface == "SessionParams":
                # present only in the stale reference .ts, not in the
                # reference's CURRENT pydantic SessionParams
                # (/root/reference/seesaw/basic_types.py:61-75); the Vue app
                # never sends it (tests/test_protocol_replay.py records)
                continue
            if fname not in ours[iface]:
                missing.append(f"{iface}.{fname}")
                continue
            otype, oopt = ours[iface][fname]
            assert compatible(otype, ftype), (
                f"{iface}.{fname}: ours '{otype}' vs reference '{ftype}'"
            )
            # a field the Vue app may omit must stay optional for us;
            # required-in-ref but optional-in-ours is fine (we accept more)
            if fopt:
                assert oopt, f"{iface}.{fname} must stay optional"
    assert not missing, f"reference contract not covered: {missing}"


def test_generated_ts_matches_current_models():
    """Spot-check the generator against the models directly: required vs
    defaulted fields, Optional unwrapping, nested refs, index signatures."""
    from scripts.generate_ts_types import generate

    ours = parse_ts(generate())
    box = ours["Box"]
    assert box["x1"] == ("number", False)
    assert box["description"] == ("string", True)
    assert box["marked_accepted"] == ("boolean", True)  # has default
    imdata = ours["Imdata"]
    assert imdata["boxes"] == ("Box[]", True)  # Optional[List[Box]]
    assert imdata["dbidx"] == ("number", False)
    sp = ours["SessionParams"]
    assert sp["index_spec"] == ("IndexSpec", False)
    assert sp["method_config"] == ("dict", True)
    assert '"from_start"' in sp["start_policy"][0]
    ss = ours["SessionState"]
    assert ss["gdata"] == ("Imdata[][]", False)
    assert ss["action_log"] == ("LogEntry[]", True)
