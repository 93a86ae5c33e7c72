"""Reference-parity result rendering (operator O19).

The reference prints every result as a ``terminaltables.AsciiTable``
grid (``sqlengine.py:446-452``): ``+``/``-``/``|`` borders, one space
of padding, left-justified cells, a separator under the header row,
no separators between data rows, and a bare blank line for a
header-only (empty) result. ``ascii_table`` reproduces that layout
byte-for-byte without the terminaltables dependency.

Headers are the reference's qualified ``table.col`` (and
``func(table.col)`` for unaliased aggregates, ``sqlengine.py:356-361``)
— SURVEY Q10: ``sample_output.txt`` is not a reliable golden, so the
contract is "owning table, case per input". Qualification is
CATALYST-NATIVE, not a private parser: the analyzer already bound
every output attribute to its owning relation, so we read each output
attribute's qualifier from the analyzed logical plan. For Spark's
default unaliased-aggregate names (``max(A)``) the output attribute
has no qualifier; the inner column's qualifier is recovered from the
attributes of the plan's child nodes, and only used when it is
unambiguous — strictly more honest than the reference, which guesses.

Rendering happens on an already-``take``-capped row list (the CLI caps
at 100k), never on a DataFrame — formatting is a driver-side
presentation step, not part of any distributed plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Row

_AGG_NAME = re.compile(r"^(\w+)\((\w+)\)$")


def _plan_qualifiers(df: DataFrame):
    """(top, deep) from the analyzed plan: ``top`` is
    [(name, qualifier-or-None)] for the output attributes; ``deep``
    maps lowercase attribute name → set of qualifiers seen anywhere in
    the plan tree (for recovering an aggregate's inner column)."""
    top: list[tuple[str, str | None]] = []
    deep: dict[str, set[str]] = {}

    def attr_pairs(node):
        out = node.output()
        for i in range(out.size()):
            a = out.apply(i)
            q = a.qualifier()
            # qualifier is a multi-part Seq (catalog.db.view); the
            # last part is the relation name the reference prints
            yield a.name(), (q.apply(q.size() - 1) if q.size() else None)

    def walk(node):
        for name, qual in attr_pairs(node):
            if qual:
                deep.setdefault(name.lower(), set()).add(qual)
        ch = node.children()
        for j in range(ch.size()):
            walk(ch.apply(j))

    plan = df._jdf.queryExecution().analyzed()
    top = list(attr_pairs(plan))
    walk(plan)
    return top, deep


def merge_headers(
    top: list[tuple[str, str | None]], deep: dict[str, set[str]]
) -> list[str]:
    """Pure header assembly (unit-testable without Spark)."""
    headers = []
    for name, qual in top:
        if qual:
            headers.append(f"{qual}.{name}")
            continue
        m = _AGG_NAME.match(name)
        if m:
            quals = deep.get(m.group(2).lower())
            if quals and len(quals) == 1:
                headers.append(
                    f"{m.group(1)}({next(iter(quals))}.{m.group(2)})"
                )
                continue
        headers.append(name)
    return headers


def qualified_headers(df: DataFrame) -> list[str]:
    """Reference-style headers for ``df``; falls back to plain column
    names if the JVM plan introspection surface ever shifts."""
    try:
        top, deep = _plan_qualifiers(df)
        return merge_headers(top, deep)
    except Exception:
        return list(df.columns)


def _cell(v: object) -> str:
    if v is None:
        return "NULL"
    return str(v)


def ascii_table(headers: list[str], rows: list[Row] | list[tuple]) -> str:
    """The reference's AsciiTable grid; empty result → empty string
    (the reference prints a bare blank line, ``sqlengine.py:449-450``).
    """
    if not rows:
        return ""
    data = [[_cell(c) for c in headers]] + [
        [_cell(c) for c in r] for r in rows
    ]
    widths = [max(len(r[i]) for r in data) for i in range(len(headers))]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    lines = [sep]
    for i, r in enumerate(data):
        lines.append(
            "| " + " | ".join(c.ljust(w) for c, w in zip(r, widths)) + " |"
        )
        if i == 0:
            lines.append(sep)
    lines.append(sep)
    return "\n".join(lines)
