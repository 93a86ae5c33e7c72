"""Bucketed-table co-located joins: the join on the bucket key must
plan with NO Exchange (shuffle) on either side — the repeated-join
scale lever, asserted at the plan level and checked for correctness."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minisql_engine_spark.sources import load_table  # noqa: E402
from minisql_engine_spark.sources.bucketing import (  # noqa: E402
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    write_bucketed(orders, "orders_b", "custkey", n_buckets=8, sort_by="custkey")
    write_bucketed(
        customer, "customer_b", "custkey", n_buckets=8, sort_by="custkey"
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the shuffle-free claim is tested against the
    # sort-merge path (broadcast would trivially avoid the exchange)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, on=["custkey"])
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = bucketed_join(spark, lt, rt, on=["custkey"]).count()
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    want = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()
    assert got == want and got > 0


def test_analyze_table_statistics(spark, bucketed_tables):
    """ANALYZE TABLE populates catalog statistics (the CBO input)."""
    lt, _ = bucketed_tables
    spark.sql(f"ANALYZE TABLE {lt} COMPUTE STATISTICS")
    detail = spark.sql(f"DESCRIBE TABLE EXTENDED {lt}").collect()
    stats = {r["col_name"]: r["data_type"] for r in detail}
    assert "Statistics" in stats and "rows" in stats["Statistics"]


def test_drop_bucketed_never_touches_external_path(spark, sf_dir, tmp_path):
    """drop_bucketed resolves the real managed location from the
    catalog and refuses to guess paths for qualified uncataloged
    names — an unrelated directory named like the table survives."""
    from minisql_engine_spark.sources.bucketing import drop_bucketed

    decoy = tmp_path / "somedb.db"
    decoy.mkdir()
    (decoy / "marker.txt").write_text("do not delete")
    # qualified name, not in catalog: must be a no-op on disk
    drop_bucketed(spark, "somedb.ghost_table")
    assert (decoy / "marker.txt").exists()

    # managed default-db table: dropped from catalog AND disk
    load_table(spark, sf_dir, "region").write.mode("overwrite").saveAsTable(
        "drop_guard_t"
    )
    assert spark.catalog.tableExists("drop_guard_t")
    drop_bucketed(spark, "drop_guard_t")
    assert not spark.catalog.tableExists("drop_guard_t")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    assert not os.path.exists(os.path.join(wh, "drop_guard_t"))
