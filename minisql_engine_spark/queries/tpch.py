"""The complete TPC-H suite (Q1-Q22), Spark-first, on the driver schema.

Seven shapes already live in the driver registry
(``__spark_entry__.py``: Q3, Q5, Q7, Q8, Q10, Q14, Q18); this module
adds the other fifteen so a user gets the whole benchmark surface.
Each query has a DuckDB oracle twin in :data:`ORACLES`, compared with
the driver's own row-count + schema + value check in
``tests/test_tpch.py``.

Schema adaptations (the driver's tables are TPC-H-ish, not TPC-H):
no ``partsupp`` table, so Q2/Q9/Q11/Q16/Q20 derive the part-supplier
relation from ``lineitem`` (distinct ``(l_partkey, l_suppkey)``
pairs, unit cost = min ``l_extendedprice / l_quantity``); no
``l_commitdate``/``l_receiptdate``/``l_shipmode``, so the "late"
predicates of Q4/Q12/Q21 use ``l_shipdate > o_orderdate + INTERVAL``
lag instead; no ``c_phone``, so Q22's country code is
``c_nationkey``. Every deviation keeps the query's *plan topology* —
the thing that matters at 100 TB — identical to spec: the correlated
scalar aggregates (Q2/Q17), EXISTS/NOT EXISTS (Q4/Q21/Q22), the
global-total scalar subquery (Q11/Q15), the disjunctive pushdown
predicate (Q19), and the double aggregation (Q13) all survive.

Determinism contract (BASELINE.md): every SUM over a floating-point
measure routes through DECIMAL so results are order-independent
across a 1000-executor shuffle and bit-comparable with the oracle;
AVG is exact-decimal-sum / count. Broadcast hints only on the
fixed-cardinality dims (nation=25, region=5) — everything that grows
with SF is left to AQE (the 100 TB rule, VERDICT r1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from minisql_engine_spark.sources import load_table

    return load_table(spark, sf_dir, name)


def _dec(col: str) -> Column:
    return F.col(col).cast("decimal(25,2)")


def _ts(lit: str) -> Column:
    return F.lit(lit).cast("timestamp")


def _rev() -> Column:
    """l_extendedprice * (1 - l_discount) as the house exact-decimal
    product (same form every registry TPC-H query uses)."""
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


# SQL twin of _rev(), shared by most oracles below.
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(25,2))"
    " * (1 - CAST(l_discount AS DECIMAL(25,2)))"
)


# ---------------------------------------------------------------------------
# Q1 — pricing summary report (faithful: all columns exist)
# ---------------------------------------------------------------------------


def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical scan-heavy aggregation — one pass over
    lineitem, 8 aggregates over 6 (returnflag, linestatus) groups.

    The plan to want at 100 TB: partial HashAggregate on every scan
    partition (map-side combine collapses 600 k rows to ≤ 6 per
    partition) around ONE 6-row exchange. The three-factor charge
    product is exact INTEGER arithmetic — price in cents × discount ×
    tax in hundredths — because a decimal triple product overflows
    38-digit precision under Spark's and DuckDB's different rescale
    rules, and a double product rounded to 4 decimals tie-breaks
    differently across engines (measured: 3 of 60 k rows). The
    integer product is exact and order-independent; /1e6 at the edge
    restores the money scale."""
    from minisql_engine_spark.fanout import fan_out

    li = _t(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(F.col(c) * 100).cast("bigint")  # noqa: E731
    charge_u = (
        cents("l_extendedprice")
        * (F.lit(100) - cents("l_discount"))
        * (F.lit(100) + cents("l_tax"))
    ).cast("decimal(38,0)")
    # decimal sums + the 38-digit charge product are the dominant map
    # cost; fan the pruned projection out so the partial aggregate
    # runs on every core instead of the single-row-group scan's one
    # task (guide §2.5; no-op at scale — the filter still pushes to
    # the scan below the added exchange, sums exact and commutative)
    return (
        fan_out(
            li.filter(F.col("l_shipdate") <= _ts("2001-09-01")).select(
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax",
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias(
                "sum_base_price"
            ),
            F.sum(_rev()).cast("double").alias("sum_disc_price"),
            (F.sum(charge_u).cast("double") / F.lit(1_000_000.0)).alias(
                "sum_charge"
            ),
            (
                F.sum(_dec("l_quantity")).cast("double") / F.count("*")
            ).alias("avg_qty"),
            (
                F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")
            ).alias("avg_price"),
            (
                F.sum(_dec("l_discount")).cast("double") / F.count("*")
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = (
    "SELECT l_returnflag, l_linestatus,"
    " CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE)"
    "  AS sum_base_price,"
    f" CAST(sum({_REV_SQL}) AS DOUBLE) AS sum_disc_price,"
    " CAST(sum(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    "   * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
    "   * (100 + CAST(round(l_tax * 100, 0) AS BIGINT))"
    "   AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_charge,"
    " CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) / count(*)"
    "  AS avg_qty,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) / count(*)"
    "  AS avg_price,"
    " CAST(sum(CAST(l_discount AS DECIMAL(25,2))) AS DOUBLE) / count(*)"
    "  AS avg_disc,"
    " count(*) AS count_order"
    " FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'"
    " GROUP BY l_returnflag, l_linestatus"
    " ORDER BY l_returnflag, l_linestatus"
)


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (adapted: supply relation from lineitem)
# ---------------------------------------------------------------------------


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp surrogate: distinct (partkey, suppkey) pairs seen
    in lineitem with unit cost = min(extendedprice / quantity). Double
    division and MIN select identical values in both engines — no
    summation, so no decimal routing needed."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        )
    )


_SUPPLY_SQL = (
    "SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,"
    " min(l_extendedprice / l_quantity) AS ps_supplycost"
    " FROM lineitem GROUP BY l_partkey, l_suppkey"
)


def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for EUROPE-supplied parts of size 15, the supplier(s)
    achieving the per-part MINIMUM supply cost — the correlated-min
    subquery shape. Spark cannot dedupe common SUBPLANS (only
    identical exchanges), so the groupBy-then-join-back formulation
    would compute the whole 4-table ``euro`` subtree TWICE (measured:
    9 parquet scans); the per-part min as a WINDOW over euro computes
    the subtree once — one shuffle on ps_partkey, half the scans —
    and the correlated rescan a tuple-at-a-time engine would do
    becomes a filter. nation/region broadcast; supplier is AQE's
    call."""
    from pyspark.sql.window import Window

    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    euro = (
        _supply(spark, sf_dir)
        .join(s, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    w = Window.partitionBy("ps_partkey")
    return (
        euro.withColumn("_min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .join(
            p.filter(F.col("p_size") == 15),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


_Q2_SQL = (
    f"WITH supply AS ({_SUPPLY_SQL}),"
    " euro AS (SELECT * FROM supply"
    "  JOIN supplier ON ps_suppkey = s_suppkey"
    "  JOIN nation ON s_nationkey = n_nationkey"
    "  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),"
    " best AS (SELECT ps_partkey AS _pk, min(ps_supplycost) AS _min_cost"
    "  FROM euro GROUP BY ps_partkey)"
    " SELECT s_acctbal, s_name, n_name, p_partkey, p_type,"
    "  ps_supplycost AS supplycost"
    " FROM euro JOIN best ON ps_partkey = _pk AND ps_supplycost = _min_cost"
    " JOIN part ON ps_partkey = p_partkey WHERE p_size = 15"
    " ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"
)


# ---------------------------------------------------------------------------
# Q4 — order priority checking (adapted: lateness = shipdate lag)
# ---------------------------------------------------------------------------


def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders in 1996Q3 having at least one line shipped
    more than 60 days after the order date, counted by priority — the
    EXISTS-with-extra-predicate shape. Spark turns the EXISTS into a
    LEFT SEMI join whose condition carries both the key equality and
    the lateness comparison; the date-range filter prunes the orders
    scan before the join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    window = o.filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        window.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = (
    "SELECT o_orderpriority, count(*) AS order_count FROM orders"
    " WHERE o_orderdate >= TIMESTAMP '1996-07-01'"
    "  AND o_orderdate < TIMESTAMP '1996-10-01'"
    "  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey"
    "   AND l_shipdate > o_orderdate + INTERVAL 60 DAY)"
    " GROUP BY o_orderpriority ORDER BY o_orderpriority"
)


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (faithful)
# ---------------------------------------------------------------------------


def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate, zero joins — the
    pushdown benchmark. All three predicates reach the parquet scan
    (PushedFilters), only 3 columns are read, and the single exact-
    decimal sum is a map-side partial + 1-row exchange."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


_Q6_SQL = (
    "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))"
    "  * CAST(l_discount AS DECIMAL(25,2))) AS DOUBLE) AS revenue"
    " FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
    " AND l_shipdate < TIMESTAMP '1997-01-01'"
    " AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
)


# ---------------------------------------------------------------------------
# Q9 — product-type profit (adapted: no supplycost term)
# ---------------------------------------------------------------------------


def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: revenue on '%red%' parts by supplier nation and order
    year — the 5-table join with a LIKE part filter and a year()
    extraction. The part filter prunes before its join; nation
    broadcasts; the lineitem⋈orders⋈supplier fact joins shuffle on
    their keys (AQE-planned)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(
            p.filter(F.col("p_name").like("%red%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q9_SQL = (
    "SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit"
    " FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,"
    f"  {_REV_SQL} AS amount"
    "  FROM lineitem JOIN part ON l_partkey = p_partkey"
    "  JOIN supplier ON l_suppkey = s_suppkey"
    "  JOIN orders ON l_orderkey = o_orderkey"
    "  JOIN nation ON s_nationkey = n_nationkey"
    "  WHERE p_name LIKE '%red%')"
    " GROUP BY nation, o_year ORDER BY nation, o_year DESC"
)


# ---------------------------------------------------------------------------
# Q11 — important stock identification (adapted: value from lineitem)
# ---------------------------------------------------------------------------


def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose NATION_1-supplied value exceeds a
    fraction of the nation's total — the global-total scalar-subquery
    shape. The per-part aggregate is computed ONCE and the global
    total rides an empty-frame window over it — the
    aggregate-then-crossJoin form would rebuild the whole semi-join
    subtree for the 1-row total (Spark dedupes exchanges, not
    subplans). The global window moves only the ALREADY-REDUCED
    per-part rows (≤ n_parts) to one partition, which is the cheap
    side of that trade at any SF. Both sides cast to double before
    the threshold compare so both engines compare identical values."""
    from pyspark.sql.window import Window

    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    nat_supp = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_1")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        li.join(nat_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_dec("l_extendedprice")).alias("_value"))
    )
    total = F.sum("_value").over(Window.partitionBy()).cast("double")
    return (
        per_part.withColumn("_total", total)
        .filter(
            F.col("_value").cast("double") > F.lit(0.001) * F.col("_total")
        )
        .select(
            "p_partkey", F.col("_value").cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


_Q11_SQL = (
    "WITH nat_supp AS (SELECT s_suppkey FROM supplier"
    "  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_1'),"
    " per_part AS (SELECT l_partkey AS p_partkey,"
    "   sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS _value"
    "  FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM nat_supp)"
    "  GROUP BY l_partkey)"
    " SELECT p_partkey, CAST(_value AS DOUBLE) AS part_value FROM per_part"
    " WHERE CAST(_value AS DOUBLE) >"
    "  0.001 * (SELECT CAST(sum(_value) AS DOUBLE) FROM per_part)"
    " ORDER BY part_value DESC, p_partkey"
)


# ---------------------------------------------------------------------------
# Q12 — shipping priority classes (adapted: returnflag as the class)
# ---------------------------------------------------------------------------


def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: late 1996 lineitems (shipped > 30 days after the
    order) classified by returnflag, counting high- vs low-priority
    orders — the conditional-aggregation join shape. The CASE sums are
    map-side partials; the lateness predicate lives in the join
    condition's filter, evaluated before the aggregate."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q12_SQL = (
    "SELECT l_returnflag,"
    " CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
    "  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,"
    " CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
    "  THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count"
    " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
    " AND l_shipdate < TIMESTAMP '1997-01-01'"
    " AND l_shipdate > o_orderdate + INTERVAL 30 DAY"
    " GROUP BY l_returnflag ORDER BY l_returnflag"
)


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (faithful shape)
# ---------------------------------------------------------------------------


def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts — the double
    aggregation over a filtered LEFT OUTER join. The priority filter
    sits in the JOIN CONDITION, not WHERE (customers with only
    filtered-out orders must still appear with count 0 — a WHERE would
    wrongly drop them). Two shuffles: custkey, then count."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q13_SQL = (
    "SELECT c_count, count(*) AS custdist FROM ("
    "  SELECT c_custkey, count(o_orderkey) AS c_count FROM customer"
    "  LEFT OUTER JOIN orders ON c_custkey = o_custkey"
    "   AND o_orderpriority <> '5-LOW'"
    "  GROUP BY c_custkey) c_orders"
    " GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
)


# ---------------------------------------------------------------------------
# Q15 — top supplier (faithful)
# ---------------------------------------------------------------------------


def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    view + scalar-max shape. The revenue aggregate is built ONCE; the
    scalar max rides an empty-frame window over its ≤ n_suppliers
    rows (the aggregate-then-crossJoin form would scan lineitem
    twice — Spark dedupes exchanges, not subplans). Revenue is an
    exact decimal sum cast to double, so the max-equality compare is
    between identical values in both engines."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
        .withColumn(
            "_max_rev", F.max("total_revenue").over(Window.partitionBy())
        )
    )
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q15_SQL = (
    "WITH revenue AS (SELECT l_suppkey AS supplier_no,"
    f"  CAST(sum({_REV_SQL}) AS DOUBLE) AS total_revenue"
    "  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
    "  AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey)"
    " SELECT s_suppkey, s_name, total_revenue"
    " FROM supplier JOIN revenue ON s_suppkey = supplier_no"
    " WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)"
    " ORDER BY s_suppkey"
)


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (adapted: pairs from lineitem)
# ---------------------------------------------------------------------------


def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier counts per (brand, type, size) for
    selected sizes, excluding a complained-about supplier set — the
    NOT IN + COUNT DISTINCT shape. The NOT IN subquery (non-null key)
    becomes a LEFT ANTI join; the distinct count shuffles once on the
    group keys with partial distinct aggregation map-side."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    sizes = [1, 5, 10, 15, 20, 25, 30, 35, 40, 45]
    return (
        li.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            p.filter(
                (F.col("p_brand") != "Brand#1")
                & F.col("p_size").isin(sizes)
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


_Q16_SQL = (
    "SELECT p_brand, p_type, p_size,"
    " count(DISTINCT l_suppkey) AS supplier_cnt"
    " FROM lineitem JOIN part ON l_partkey = p_partkey"
    " WHERE p_brand <> 'Brand#1'"
    " AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)"
    " AND l_suppkey NOT IN"
    "  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)"
    " GROUP BY p_brand, p_type, p_size"
    " ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
)


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (faithful shape, p_type for container)
# ---------------------------------------------------------------------------


def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from lineitems under 20% of their part's
    average quantity — the correlated scalar-average shape. The
    per-part average is a WINDOW over the (already part-filtered)
    lineitems rather than a separate aggregate joined back: the
    filter on part cuts the input first, then ONE shuffle on
    l_partkey serves both the average and the comparison — the
    groupBy+join form would scan lineitem twice and shuffle the
    unfiltered aggregate. (Exact decimal sum / count per partition,
    deterministic.)

    Semantics note: the join keeps EVERY lineitem of each qualifying
    part (the filter restricts parts, not their lineitems), so the
    window average equals the spec's correlated per-part average
    exactly; the oracle computes it from the unjoined table and
    matches by construction."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(_dec("l_quantity")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return (
        li.join(
            p.filter(
                (F.col("p_brand") == "Brand#3")
                & (F.col("p_type") == "SMALL")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("_avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("_avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


_Q17_SQL = (
    "WITH per_part AS (SELECT l_partkey AS _pk,"
    "  CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) / count(*)"
    "   AS _avg_qty FROM lineitem GROUP BY l_partkey)"
    " SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE)"
    "  / 7.0 AS avg_yearly"
    " FROM lineitem JOIN part ON l_partkey = p_partkey"
    " JOIN per_part ON l_partkey = _pk"
    " WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'"
    " AND l_quantity < 0.2 * _avg_qty"
)


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (adapted: no shipmode/shipinstruct conjuncts)
# ---------------------------------------------------------------------------


def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under a three-branch OR of (brand, size,
    quantity) conjunctions — the disjunctive-predicate benchmark.
    Catalyst extracts the common l_partkey join and pushes the
    per-branch part predicates below it; the OR survives as a single
    post-join filter instead of three unioned scans."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(b1 | b2 | b3)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


_Q19_SQL = (
    f"SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue"
    " FROM lineitem JOIN part ON l_partkey = p_partkey"
    " WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5"
    "   AND l_quantity BETWEEN 1 AND 11)"
    " OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10"
    "   AND l_quantity BETWEEN 10 AND 20)"
    " OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15"
    "   AND l_quantity BETWEEN 20 AND 30)"
)


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (adapted: shipped qty for availqty)
# ---------------------------------------------------------------------------


def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers who moved more than 50 units of some
    'red%' part in 1996 — the IN-subquery-over-grouped-HAVING shape
    (like Q18's, but keyed on the supplier). The inner aggregate
    shuffles on (suppkey, partkey); the IN becomes a LEFT SEMI join
    against its distinct suppkeys; nation broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    movers = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .join(
            p.filter(F.col("p_name").like("red%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


_Q20_SQL = (
    "SELECT s_name, s_acctbal FROM supplier"
    " WHERE s_suppkey IN ("
    "  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey"
    "  WHERE p_name LIKE 'red%'"
    "  AND l_shipdate >= TIMESTAMP '1996-01-01'"
    "  AND l_shipdate < TIMESTAMP '1997-01-01'"
    "  GROUP BY l_suppkey, l_partkey"
    "  HAVING sum(CAST(l_quantity AS DECIMAL(25,2))) > 50)"
    " ORDER BY s_name"
)


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted lateness)
# ---------------------------------------------------------------------------


def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the ONLY late supplier on a
    multi-supplier finished order. The spec's EXISTS + NOT EXISTS
    double correlation is algebraized into per-order statistics —
    (n suppliers, n late suppliers) — computed as a WINDOW over the
    per-(order, supplier) aggregate: identical semantics, and the two
    correlated rescans collapse into one window shuffle on an
    already-reduced table (the groupBy+join form would build the
    lineitem⋈orders subtree twice — Spark dedupes exchanges, not
    subplans). Lateness = shipped > 90 days after the order date."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    base = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    return (
        base.withColumn("_n_supp", F.count("*").over(w))
        .withColumn("_n_late", F.sum("late").over(w))
        .filter(
            (F.col("late") == 1)
            & (F.col("_n_supp") >= 2)
            & (F.col("_n_late") == 1)
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


_Q21_SQL = (
    "WITH base AS (SELECT l_orderkey, l_suppkey,"
    "  max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY"
    "   THEN 1 ELSE 0 END) AS late"
    "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    "  WHERE o_orderstatus = 'F' GROUP BY l_orderkey, l_suppkey),"
    " ord_stats AS (SELECT l_orderkey AS _ok, count(*) AS _n_supp,"
    "  sum(late) AS _n_late FROM base GROUP BY l_orderkey)"
    " SELECT s_name, count(*) AS numwait"
    " FROM base JOIN ord_stats ON l_orderkey = _ok"
    " JOIN supplier ON l_suppkey = s_suppkey"
    " WHERE late = 1 AND _n_supp >= 2 AND _n_late = 1"
    " GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
)


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted: nationkey for phone prefix)
# ---------------------------------------------------------------------------


def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: well-funded customers in selected nations with no
    recent orders — NOT EXISTS (anti join) + a global-average scalar
    subquery. The average is an exact decimal sum / count broadcast
    back as a 1-row cross join; the NOT EXISTS becomes a LEFT ANTI
    join against recent orders' custkeys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    nations = [1, 2, 3, 4, 5, 6, 7]
    pool = c.filter(F.col("c_nationkey").isin(nations))
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias(
            "_avg_bal"
        )
    )
    recent = o.filter(F.col("o_orderdate") >= _ts("2000-01-01")).select(
        "o_custkey"
    )
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_Q22_SQL = (
    "WITH pool AS (SELECT * FROM customer"
    "  WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)),"
    " avg_bal AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,2)))"
    "   AS DOUBLE) / count(*) AS _avg_bal FROM pool WHERE c_acctbal > 0.0)"
    " SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,"
    "  count(*) AS numcust,"
    "  CAST(sum(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS totacctbal"
    " FROM pool, avg_bal WHERE c_acctbal > _avg_bal"
    " AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey"
    "  AND o_orderdate >= TIMESTAMP '2000-01-01')"
    " GROUP BY c_nationkey ORDER BY cntrycode"
)


#: The fifteen shapes this module adds (Q3/Q5/Q7/Q8/Q10/Q14/Q18 live in
#: the driver registry, __spark_entry__.py).
QUERIES = {
    "tpch_q1": q1,
    "tpch_q2": q2,
    "tpch_q4": q4,
    "tpch_q6": q6,
    "tpch_q9": q9,
    "tpch_q11": q11,
    "tpch_q12": q12,
    "tpch_q13": q13,
    "tpch_q15": q15,
    "tpch_q16": q16,
    "tpch_q17": q17,
    "tpch_q19": q19,
    "tpch_q20": q20,
    "tpch_q21": q21,
    "tpch_q22": q22,
}

ORACLES = {
    "tpch_q1": _Q1_SQL,
    "tpch_q2": _Q2_SQL,
    "tpch_q4": _Q4_SQL,
    "tpch_q6": _Q6_SQL,
    "tpch_q9": _Q9_SQL,
    "tpch_q11": _Q11_SQL,
    "tpch_q12": _Q12_SQL,
    "tpch_q13": _Q13_SQL,
    "tpch_q15": _Q15_SQL,
    "tpch_q16": _Q16_SQL,
    "tpch_q17": _Q17_SQL,
    "tpch_q19": _Q19_SQL,
    "tpch_q20": _Q20_SQL,
    "tpch_q21": _Q21_SQL,
    "tpch_q22": _Q22_SQL,
}
