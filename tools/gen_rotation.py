"""Regenerate COVERAGE.md's rotation ledger from the driver registry.

The driver window and archive are DEFINED in ``__spark_entry__.py``
(`queries()` / `archived_queries()` and their oracle maps); this tool
renders them as a markdown table between the BEGIN/END markers in
COVERAGE.md so the ledger can never drift from the registry —
``tests/test_extensions2.py::test_coverage_rotation_table_current``
fails whenever the committed section differs from a fresh render.

Run after any rotation:  python tools/gen_rotation.py
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BEGIN = "<!-- BEGIN GENERATED ROTATION LEDGER (tools/gen_rotation.py) -->"
END = "<!-- END GENERATED ROTATION LEDGER -->"


def render() -> str:
    import importlib

    em = importlib.import_module("__spark_entry__")
    window = list(em.queries())
    oracles = em.oracle_sql()
    archived = sorted(em.archived_queries())
    arch_oracles = em.archived_oracle_sql()
    lines = [
        BEGIN,
        "",
        f"**Driver window ({len(window)} entries, emitted "
        "least-proven-first; driver hash gate):**",
        "",
        "| # | entry | verification |",
        "|---|---|---|",
    ]
    for i, name in enumerate(window, 1):
        v = (
            "DuckDB oracle (hash)"
            if oracles.get(name)
            else "rows-only + in-row quality gate"
        )
        lines.append(f"| {i} | `{name}` | {v} |")
    lines += [
        "",
        f"**Archived ({len(archived)} entries — out of the driver "
        "window, still DuckDB-parity-tested on every pytest run via "
        "`tests/test_oracle_parity.py`; archived entries REQUIRE an "
        "oracle):**",
        "",
    ]
    missing = [n for n in archived if not arch_oracles.get(n)]
    if missing:
        raise SystemExit(f"archived entries missing oracles: {missing}")
    lines.append(", ".join(f"`{n}`" for n in archived))
    lines += ["", END]
    return "\n".join(lines)


def main() -> None:
    path = os.path.join(ROOT, "COVERAGE.md")
    with open(path) as f:
        doc = f.read()
    block = render()
    if BEGIN in doc:
        pre = doc[: doc.index(BEGIN)]
        post = doc[doc.index(END) + len(END):]
        doc = pre + block + post
    else:
        doc = doc.rstrip() + "\n\n## Rotation ledger (generated)\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(doc)
    print("rotation ledger regenerated")


if __name__ == "__main__":
    main()
