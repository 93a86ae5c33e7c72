"""Driver-mirror test: every ``queries()`` entry hash-matches its
``oracle_sql()`` twin on DuckDB over the same parquet tables —
exactly the driver's t2 correctness gate, run locally first."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

pytestmark = pytest.mark.driver_gate

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entrymod = importlib.import_module("__spark_entry__")

from tests.conftest import assert_matches_oracle  # noqa: E402

QUERY_NAMES = sorted(entrymod.queries().keys())
# rotated-out entries keep full parity coverage here even though the
# driver window no longer sees them (registry ordering note in the
# entry module)
ALL_NAMES = sorted(
    set(QUERY_NAMES) | set(entrymod.archived_queries().keys())
)


def _lookup(name):
    qs = entrymod.queries()
    if name in qs:
        return qs[name], entrymod.oracle_sql().get(name)
    return (
        entrymod.archived_queries()[name],
        entrymod.archived_oracle_sql().get(name),
    )


def test_every_query_has_callable():
    qs = entrymod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_subset_of_queries():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_archived_entries_all_have_oracles():
    # rotation must never park an entry where NOTHING checks it: every
    # archived entry keeps a DuckDB oracle
    archived = entrymod.archived_queries()
    assert archived and set(entrymod.archived_oracle_sql()) == set(archived)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    fn, oracle = _lookup(name)
    sdf = fn(spark, sf_dir)
    if oracle is None:
        # weaker rows-only check (driver does the same)
        assert sdf.count() >= 0
        return
    ddf = duck.execute(oracle).fetchdf()
    assert_matches_oracle(sdf, ddf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.fieldNames()


def test_bench_headline_names_resolve():
    """bench.py skips unknown names with `continue` — a rename or
    rotation typo would silently drop a query from the series."""
    import bench

    avail = set(entrymod.queries()) | set(entrymod.archived_queries())
    missing = [n for n in bench.HEADLINE if n not in avail]
    assert not missing, missing


def test_rotation_lists_reference_real_entries():
    """_ARCHIVED and _VERIFY_FIRST silently no-op for unknown names
    (set intersection / `if n in _QUERIES` guards) — pin every name
    to a real registration."""
    regs = set(entrymod._QUERIES)
    assert set(entrymod._ARCHIVED) <= regs, (
        set(entrymod._ARCHIVED) - regs
    )
    assert set(entrymod._VERIFY_FIRST) <= regs, (
        set(entrymod._VERIFY_FIRST) - regs
    )
    # archived names must not ALSO hold a driver slot
    assert not (set(entrymod._ARCHIVED) & set(entrymod.queries()))
