"""Render the driver-certification history from CORRECTNESS_r*.json.

VERDICT r8 item 3: COVERAGE.md's "✓" claims must never disagree with
what the driver actually certified. This tool reads every
``CORRECTNESS_r*.json`` on disk and renders, per entry that has EVER
appeared in a driver window, the rounds it was hash-green /
rows-only / FAILED — inserted between BEGIN/END markers in
COVERAGE.md. ``tests/test_extensions2.py::
test_coverage_driver_history_current`` fails whenever the committed
section differs from a fresh render, so a hand-written "✓" can no
longer overstate driver status.

Run after each round's CORRECTNESS file lands:
    python tools/gen_driver_history.py
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BEGIN = (
    "<!-- BEGIN GENERATED DRIVER HISTORY (tools/gen_driver_history.py)"
    " -->"
)
END = "<!-- END GENERATED DRIVER HISTORY -->"


def _status(rec: dict) -> str:
    if rec.get("err") == "no_oracle":
        return "rows-only"
    if (
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match")
    ):
        return "green"
    return "FAIL"


def on_disk_rounds() -> list[int]:
    """Round numbers of every CORRECTNESS_r*.json currently on disk."""
    out = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def render(max_round: int | None = None) -> str:
    """Render the ledger from CORRECTNESS files.

    ``max_round`` restricts the render to rounds <= that number —
    used by the freshness test so a CORRECTNESS file that lands
    AFTER the builder's final commit (the driver writes it post-
    close) can never redden a tree whose ledger was current at
    commit time (VERDICT r10 task 1).
    """
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rno = int(m.group(1))
        if max_round is not None and rno > max_round:
            continue
        with open(path) as f:
            rounds[rno] = json.load(f)

    entries: dict[str, dict[int, str]] = {}
    for rno, data in rounds.items():
        for name, rec in data.items():
            entries.setdefault(name, {})[rno] = _status(rec)

    lines = [
        BEGIN,
        "",
        "**Driver certification history** — every entry that has ever"
        " held a driver-window slot, with its per-round driver verdict"
        " (source of truth: the CORRECTNESS_r*.json files; rounds with"
        " no file on disk — e.g. r7 — cannot be claimed). An entry"
        " whose LAST driver verdict is not `green` must not carry an"
        " unqualified ✓ anywhere above.",
        "",
        "| entry | green rounds | rows-only rounds | FAILED rounds |"
        " last driver verdict |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(entries):
        hist = entries[name]
        greens = [r for r, s in sorted(hist.items()) if s == "green"]
        rows = [r for r, s in sorted(hist.items()) if s == "rows-only"]
        fails = [r for r, s in sorted(hist.items()) if s == "FAIL"]
        last = hist[max(hist)]
        fmt = lambda xs: ", ".join(f"r{r}" for r in xs) or "—"  # noqa: E731
        lines.append(
            f"| `{name}` | {fmt(greens)} | {fmt(rows)} | {fmt(fails)} |"
            f" {last} |"
        )
    lines += ["", END]
    return "\n".join(lines)


def main() -> None:
    cov = os.path.join(ROOT, "COVERAGE.md")
    with open(cov) as f:
        text = f.read()
    block = render()
    if BEGIN in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END) :]
        text = pre + block + post
    else:
        text = text.rstrip() + (
            "\n\n## Driver certification history (generated)\n\n"
        ) + block + "\n"
    with open(cov, "w") as f:
        f.write(text)
    print("COVERAGE.md driver-history section regenerated")


if __name__ == "__main__":
    main()
