"""Generate TypeScript interfaces for the wire protocol from the pydantic
models — the reference runs `pydantic2ts` over `seesaw/basic_types.py` to
produce `frontend/src/basic_types.ts` (cited in SURVEY.md L5->L6: the
pydantic state machine is "mirrored to TypeScript via pydantic2ts",
`/root/reference/frontend/src/basic_types.ts:1-6`). pydantic2ts is not in
this image (and targets pydantic v1), so this is a small v2-native
equivalent: each model's JSON schema becomes one `export interface`, with
pydantic2ts's conventions — fields that carry a default (absent from the
schema's `required` list) render optional (`field?:`), `Optional[T]`
unwraps to `T` + optional, dicts render as `{[k: string]: unknown}`, and
`Literal` fields render as string-literal unions (stricter than the
reference's generated file, which predates several Literal fields).

Usage:
    python scripts/generate_ts_types.py [--out frontend/basic_types.ts]

The differential test (tests/test_ts_types.py) asserts the generated
contract is a compatible superset of the reference's checked-in
`basic_types.ts` — every interface/field the Vue app was built against
exists here with a compatible type and optionality.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEADER = """\
/* tslint:disable */
/* eslint-disable */
/**
/* This file was automatically generated from pydantic models by running
/* scripts/generate_ts_types.py. Do not modify it by hand - update the
/* models in seesaw_tpu/basic_types.py and re-run the script.
*/
"""


def _ts_type(schema: dict, defs: dict) -> str:
    """JSON-schema node -> TypeScript type expression."""
    if "$ref" in schema:
        return schema["$ref"].rsplit("/", 1)[-1]
    if "const" in schema:
        v = schema["const"]
        return f'"{v}"' if isinstance(v, str) else str(v).lower()
    if "enum" in schema:  # Literal[...] -> union of literals
        return " | ".join(
            f'"{v}"' if isinstance(v, str) else str(v).lower()
            for v in schema["enum"]
        )
    if "anyOf" in schema:  # Optional[T] and unions
        parts = [s for s in schema["anyOf"] if s.get("type") != "null"]
        return " | ".join(dict.fromkeys(_ts_type(s, defs) for s in parts))
    t = schema.get("type")
    if t == "array":
        item = _ts_type(schema.get("items", {}), defs)
        return f"({item})[]" if (" " in item and "|" in item) else f"{item}[]"
    if t == "object" or t is None:
        # pydantic `dict` fields: pydantic2ts renders them as an index
        # signature with unknown values
        return "{\n    [k: string]: unknown;\n  }"
    return {
        "string": "string",
        "integer": "number",
        "number": "number",
        "boolean": "boolean",
        "null": "null",
    }.get(t, "unknown")


def _is_nullable(schema: dict) -> bool:
    return any(
        s.get("type") == "null" for s in schema.get("anyOf", [])
    )


def interface_for(model) -> str:
    schema = model.model_json_schema(ref_template="#/$defs/{model}")
    defs = schema.get("$defs", {})
    required = set(schema.get("required", []))
    lines = [f"export interface {schema.get('title', model.__name__)} {{"]
    for name, fschema in schema.get("properties", {}).items():
        optional = name not in required or _is_nullable(fschema)
        ts = _ts_type(fschema, defs)
        lines.append(f"  {name}{'?' if optional else ''}: {ts};")
    lines.append("}")
    return "\n".join(lines)


def generate() -> str:
    from seesaw_tpu import basic_types as bt

    models = [
        bt.ActivationData,
        bt.Box,
        bt.Annotation,
        bt.BenchParams,
        bt.BenchResult,
        bt.BenchSummary,
        bt.SessionState,
        bt.SessionParams,
        bt.IndexSpec,
        bt.Imdata,
        bt.Interval,
        bt.LogEntry,
    ]
    return HEADER + "\n".join(interface_for(m) for m in models) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default=None, help="output .ts path (default: stdout)")
    args = ap.parse_args()
    text = generate()
    if args.out:
        Path(args.out).write_text(text)
        print(f"wrote {args.out} ({text.count('interface')} interfaces)")
    else:
        sys.stdout.write(text)


if __name__ == "__main__":
    main()
