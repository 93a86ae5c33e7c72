"""Canonical analytic query suites expressed Spark-first.

``tpch`` holds the full 22-query TPC-H suite adapted to the driver's
reduced star schema; every query ships with a DuckDB oracle twin and
is verified in ``tests/test_tpch.py`` exactly the way the driver
verifies registry entries (row count + schema + order-insensitive
value equality).
"""

from minisql_engine_spark.queries import tpch

__all__ = ["tpch"]
