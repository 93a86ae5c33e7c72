"""Full TPC-H suite verification: every query in
``minisql_engine_spark.queries.tpch`` must hash-match its DuckDB
oracle twin on the same parquet tables — the driver's correctness
check applied to the 15 shapes outside the 50-entry driver window.
(The other 7 TPC-H shapes are driver-checked via the registry.)"""

from __future__ import annotations

import pytest

from minisql_engine_spark.queries import tpch
from tests.conftest import assert_matches_oracle

NAMES = sorted(tpch.QUERIES)


def test_every_query_has_oracle():
    assert set(tpch.ORACLES) == set(tpch.QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_tpch_matches_oracle(name, spark, duck, sf_dir):
    sdf = tpch.QUERIES[name](spark, sf_dir)
    ddf = duck.execute(tpch.ORACLES[name]).fetchdf()
    assert_matches_oracle(sdf, ddf, name)
    # every suite query must return rows at sf0.01 — an empty match
    # would be a vacuous pass
    assert len(ddf) > 0, f"{name}: oracle returned no rows"
