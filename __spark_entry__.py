"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every entry cites the reference operator it covers (SURVEY.md §2.1).
Aggregates over DOUBLE measures are computed through exact DECIMAL
sums in BOTH engines so results are order-independent (deterministic
across a 1000-executor shuffle) and bit-comparable — see
``minisql_engine_spark.operators.relational.exact_sum/exact_avg``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minisql_engine_spark.operators import relational as R
from minisql_engine_spark.sources import register_views

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    customer ⋈ orders ⋈ lineitem with a filter, grouped revenue —
    exercises scan (O1), binding (O4), projection (O6), filter (O7),
    equi-join incl. duplicate keys (O10/Q5), aggregation (O14-O17) in
    one plan. Joins on the star-schema keys: Catalyst broadcasts the
    small sides; the lineitem scan is pruned to 4 columns.
    """
    t = register_views(spark, SF0001)
    lineitem, orders, customer = t["lineitem"], t["orders"], t["customer"]
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(25,4)"
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("o_orderstatus") != "X")
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.col("l_orderkey")).alias("n_items"),
            R.exact_avg("l_quantity", "avg_qty"),
        )
        .orderBy("c_mktsegment", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# queries() / oracle_sql() — one entry per SURVEY §2 operator
# ---------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from minisql_engine_spark.sources import load_table

    return load_table(spark, sf_dir, name)


# --- O1/O4/O6: full scan with * expansion (test.txt:1) ---------------------


@_register("scan_star", "SELECT * FROM nation")
def q_scan_star(spark, sf_dir):
    """Full scan, SELECT * (O1 sqlengine.py:99-154; O4 :177-181)."""
    return R.project(_t(spark, sf_dir, "nation"))


# --- O6: single/multi projection (test.txt:6) ------------------------------


@_register("project_cols", "SELECT n_nationkey, n_name FROM nation")
def q_project(spark, sf_dir):
    """Projection (O6 sqlengine.py:679-695); scan pruned to 2 cols."""
    return R.project(_t(spark, sf_dir, "nation"), ["n_nationkey", "n_name"])


# --- O14: MAX (test.txt:2) -------------------------------------------------


@_register("agg_max", "SELECT max(o_orderkey) AS max_orderkey FROM orders")
def q_agg_max(spark, sf_dir):
    """Whole-column MAX (O14 sqlengine.py:548-577)."""
    return R.aggregate(
        _t(spark, sf_dir, "orders"), [("max", "o_orderkey", "max_orderkey")]
    )


# --- O15: MIN (test.txt:3) -------------------------------------------------


@_register("agg_min", "SELECT min(o_custkey) AS min_custkey FROM orders")
def q_agg_min(spark, sf_dir):
    """Whole-column MIN (O15 sqlengine.py:579-607; empty→NULL fixes Q6)."""
    return R.aggregate(
        _t(spark, sf_dir, "orders"), [("min", "o_custkey", "min_custkey")]
    )


# --- O16: SUM (test.txt:5) -------------------------------------------------


@_register(
    "agg_sum",
    "SELECT CAST(sum(c_nationkey) AS BIGINT) AS sum_nationkey FROM customer",
)
def q_agg_sum(spark, sf_dir):
    """Whole-column SUM (O16 sqlengine.py:609-629); BIGINT both sides."""
    return _t(spark, sf_dir, "customer").agg(
        F.sum("c_nationkey").cast("bigint").alias("sum_nationkey")
    )


# --- O17: AVG (test.txt:4) -------------------------------------------------


@_register(
    "agg_avg",
    "SELECT CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE)"
    " / count(l_quantity) AS avg_qty FROM lineitem",
)
def q_agg_avg(spark, sf_dir):
    """Whole-column AVG (O17 sqlengine.py:631-660), exact-decimal path."""
    return _t(spark, sf_dir, "lineitem").agg(R.exact_avg("l_quantity", "avg_qty"))


# --- O18: DISTINCT (test.txt:8) --------------------------------------------


@_register("distinct_col", "SELECT DISTINCT l_quantity AS quantity FROM lineitem")
def q_distinct(spark, sf_dir):
    """Single-column DISTINCT (O18 sqlengine.py:662-678, ANSI per Q7/Q8)."""
    return R.distinct_values(
        _t(spark, sf_dir, "lineitem").select(F.col("l_quantity").alias("quantity"))
    )


# --- O7: equality filter on literal (test.txt:9) ---------------------------


@_register(
    "filter_eq",
    "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_custkey = 7",
)
def q_filter_eq(spark, sf_dir):
    """col = literal filter (O7 sqlengine.py:467-474)."""
    orders = _t(spark, sf_dir, "orders")
    return R.project(
        R.filter_rows(orders, R.comparison("o_custkey", "=", 7)),
        ["o_orderkey", "o_custkey", "o_orderstatus"],
    )


# --- O9: OR of two predicates (test.txt:10/11) -----------------------------


@_register(
    "filter_or",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    " WHERE o_custkey = 7 OR o_totalprice < 2000",
)
def q_filter_or(spark, sf_dir):
    """OR combination (O9 sqlengine.py:505-538), ANSI cross-type."""
    orders = _t(spark, sf_dir, "orders")
    return R.project(
        R.filter_rows(
            orders,
            R.comparison("o_custkey", "=", 7),
            R.comparison("o_totalprice", "<", 2000),
            conjunction="or",
        ),
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )


# --- O9: AND of two predicates (README.md:23) ------------------------------


@_register(
    "filter_and",
    "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem"
    " WHERE l_quantity >= 30 AND l_discount <= 0.02",
)
def q_filter_and(spark, sf_dir):
    """AND combination (O9) with >=/<= comparators (fixes Q1)."""
    li = _t(spark, sf_dir, "lineitem")
    return R.project(
        R.filter_rows(
            li,
            R.comparison("l_quantity", ">=", 30),
            R.comparison("l_discount", "<=", 0.02),
        ),
        ["l_orderkey", "l_partkey", "l_quantity"],
    )


# --- O8: same-table column-to-column filter --------------------------------


@_register(
    "filter_col_eq_col",
    "SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem"
    " WHERE l_partkey = l_suppkey",
)
def q_filter_col_col(spark, sf_dir):
    """t.colA = t.colB same-table filter (O8 sqlengine.py:456-465)."""
    li = _t(spark, sf_dir, "lineitem")
    return R.project(
        R.filter_rows(li, R.comparison("l_partkey", "=", F.col("l_suppkey"))),
        ["l_orderkey", "l_partkey", "l_suppkey"],
    )


# --- O10+O13: inner equi-join with join-key dedup (test.txt:12) ------------


@_register(
    "join_inner_dedup",
    "SELECT n_nationkey, n_name, n_regionkey, r_name"
    " FROM nation JOIN region ON n_regionkey = r_regionkey",
)
def q_join_dedup(spark, sf_dir):
    """Inner equi-join, join column emitted once (O10 sqlengine.py:476-489;
    O13 :374-436). Region is broadcast — no shuffle on the big side."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return R.equi_join(
        nation,
        region,
        on=F.col("n_regionkey") == F.col("r_regionkey"),
        broadcast_right=True,
    ).select("n_nationkey", "n_name", "n_regionkey", "r_name")


# --- O10: duplicate-key (1:N) join — the shape the reference broke (Q5) ----


@_register(
    "join_dup_keys",
    "SELECT c_custkey, c_name, o_orderkey, o_totalprice"
    " FROM customer JOIN orders ON c_custkey = o_custkey",
)
def q_join_dup_keys(spark, sf_dir):
    """1:N join with correct many-to-many multiplication (fixes Q5,
    sqlengine.py:314-372) and no 1000-row cap (``:315``)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return R.equi_join(
        orders, customer, on=F.col("o_custkey") == F.col("c_custkey"),
        broadcast_right=True,
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


# --- O11: Cartesian product (test.txt:7) -----------------------------------


@_register(
    "cross_join",
    "SELECT n_nationkey, r_regionkey FROM nation CROSS JOIN region",
)
def q_cross_join(spark, sf_dir):
    """Cartesian product (O11 sqlengine.py:292-307)."""
    return R.project(
        R.cross_join(_t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")),
        ["n_nationkey", "r_regionkey"],
    )


# --- O14-O17 with WHERE: filtered aggregates (fixes Q6) --------------------


@_register(
    "agg_filtered",
    "SELECT max(l_extendedprice) AS max_price, min(l_extendedprice) AS min_price,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE)"
    "   / count(l_extendedprice) AS avg_price,"
    " count(l_extendedprice) AS n"
    " FROM lineitem WHERE l_quantity > 45",
)
def q_agg_filtered(spark, sf_dir):
    """All four reference aggregates + COUNT under a filter — the
    reference crashed on filtered AVG and mis-sentineled filtered MIN
    (Q6, sqlengine.py:647, :590)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return li.agg(
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_extendedprice").alias("min_price"),
        R.exact_sum("l_extendedprice", "sum_price"),
        R.exact_avg("l_extendedprice", "avg_price"),
        F.count("l_extendedprice").alias("n"),
    )


# --- O5/Q1: every comparator the grammar admits ----------------------------


@_register(
    "filter_comparators",
    "SELECT count(*) AS n_lt, "
    " (SELECT count(*) FROM orders WHERE o_totalprice > 100000) AS n_gt,"
    " (SELECT count(*) FROM orders WHERE o_custkey != 7) AS n_ne,"
    " (SELECT count(*) FROM orders WHERE o_custkey <= 10) AS n_le,"
    " (SELECT count(*) FROM orders WHERE o_custkey >= 140) AS n_ge"
    " FROM orders WHERE o_totalprice < 5000",
)
def q_filter_comparators(spark, sf_dir):
    """All grammar comparators < > != <= >= executed faithfully (Q1 —
    the reference parsed 12 spellings but ran them all as '=',
    sqlengine.py:35, 257-258)."""
    orders = _t(spark, sf_dir, "orders").cache()
    counts = [
        orders.filter(R.comparison("o_totalprice", "lt", 5000)).agg(
            F.count("*").alias("n_lt")
        ),
        orders.filter(R.comparison("o_totalprice", "gt", 100000)).agg(
            F.count("*").alias("n_gt")
        ),
        orders.filter(R.comparison("o_custkey", "ne", 7)).agg(
            F.count("*").alias("n_ne")
        ),
        orders.filter(R.comparison("o_custkey", "le", 10)).agg(
            F.count("*").alias("n_le")
        ),
        orders.filter(R.comparison("o_custkey", "ge", 140)).agg(
            F.count("*").alias("n_ge")
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each ``queries()`` entry."""
    return dict(_ORACLES)
