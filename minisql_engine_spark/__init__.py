"""minisql_engine_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``susobhang70/miniSQL_engine`` (a 754-line in-memory integer
SQL subset, see SURVEY.md), re-expressed Spark-first:

* the logical plan is declared with the DataFrame / Spark SQL API and
  Catalyst + Tungsten pick the physical strategy;
* all reference operators (scan, project, filter, AND/OR, aggregates,
  DISTINCT, inner equi-join, cross join, join-key dedup — SURVEY §2.1
  O1–O22) map to built-in DataFrame operations — no custom parser, no
  custom Catalyst rules (SURVEY §4.3);
* reference quirks (SURVEY §2.3 Q1–Q11) are fixed to ANSI semantics,
  matching the DuckDB oracle;
* beyond parity, first-class large-scale training-data-pipeline
  operators: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding-cosine), similarity search, text analysis, multimodal
  column plumbing, and streaming over the events table.

Designed for a 1000-executor cluster at ~100 TB: no driver-side
collect in any operator path, broadcast hints for dimension tables,
AQE on, partition-count scaling, exact decimal aggregation for
order-independent results.
"""

from minisql_engine_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
