"""CLI surface regression tests (reference O20/O21): one-shot query,
dialect form, and error exit codes via a real subprocess."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = "/root/reference/TestCases"


def run_cli(*args: str):
    return subprocess.run(
        [sys.executable, "-m", "minisql_engine_spark", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=180,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )


@pytest.mark.slow
def test_one_shot_dialect_query():
    r = run_cli("--data-dir", FIXTURES, "select distinct(C) from table3")
    assert r.returncode == 0
    # ASCII table with the 10 distinct values of C
    assert r.stdout.count("\n|") >= 10 and "9020" in r.stdout


@pytest.mark.slow
def test_one_shot_unknown_column_exits_nonzero():
    r = run_cli("--data-dir", FIXTURES, "Select Z from table1")
    assert r.returncode == 1
    assert "error:" in r.stderr and "`Z`" in r.stderr
