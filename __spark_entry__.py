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
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, SF0001)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem with a filter, grouped revenue —
    exercises scan (O1), binding (O4), projection (O6), filter (O7),
    equi-join incl. duplicate keys (O10/Q5), aggregation (O14-O17) in
    one plan. Joins on the star-schema keys: Catalyst broadcasts the
    small sides; the lineitem scan is pruned to 4 columns.
    """
    t = register_views(spark, sf_dir)
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
    "SELECT count(*) FILTER (o_totalprice < 5000) AS n_lt,"
    " count(*) FILTER (o_totalprice > 100000) AS n_gt,"
    " count(*) FILTER (o_custkey != 7) AS n_ne,"
    " count(*) FILTER (o_custkey <= 10) AS n_le,"
    " count(*) FILTER (o_custkey >= 140) AS n_ge"
    " FROM orders",
)
def q_filter_comparators(spark, sf_dir):
    """All grammar comparators < > != <= >= executed faithfully (Q1 —
    the reference parsed 12 spellings but ran them all as '=',
    sqlengine.py:35, 257-258).

    Single-pass conditional aggregation: one scan of orders, five
    comparator predicates evaluated inside one HashAggregate — at
    100 TB this is 1 scan instead of 5 (and zero joins).
    """
    orders = _t(spark, sf_dir, "orders")

    def n(pred, alias):
        return F.count(F.when(pred, 1)).alias(alias)

    return orders.agg(
        n(R.comparison("o_totalprice", "lt", 5000), "n_lt"),
        n(R.comparison("o_totalprice", "gt", 100000), "n_gt"),
        n(R.comparison("o_custkey", "ne", 7), "n_ne"),
        n(R.comparison("o_custkey", "le", 10), "n_le"),
        n(R.comparison("o_custkey", "ge", 140), "n_ge"),
    )


# ===========================================================================
# SURVEY §2.2 completions — capabilities the reference lacks entirely; each
# maps to the Spark primitive named in SURVEY §2.2's table. These complete
# the engine into a usable analytics surface at scale.
# ===========================================================================


# --- GROUP BY aggregation (TPC-H Q1 shape) ---------------------------------


@_register(
    "group_by_agg",
    "SELECT l_returnflag, l_linestatus,"
    " CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_base_price,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2)) * (1 - CAST(l_discount AS DECIMAL(25,2)))) AS DOUBLE) AS sum_disc_price,"
    " CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,"
    " count(*) AS count_order"
    " FROM lineitem GROUP BY l_returnflag, l_linestatus",
)
def q_group_by(spark, sf_dir):
    """GROUP BY + multi-aggregate (absent in reference — SURVEY §2.2
    row 1). HashAggregate with map-side partial agg: one shuffle on
    the (low-cardinality) group keys regardless of input size."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(25,2)")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        R.exact_avg("l_quantity", "avg_qty"),
        F.count("*").alias("count_order"),
    )


# --- ORDER BY + LIMIT (global top-k) ---------------------------------------


@_register(
    "order_by_limit",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    " ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
)
def q_order_limit(spark, sf_dir):
    """ORDER BY + LIMIT (SURVEY §2.2 row 2). Spark plans
    TakeOrderedAndProject: per-partition top-k then a k-row merge at
    the driver — no global sort even at 100 TB. Tiebreak on the key
    makes the top-10 deterministic across engines."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --- Window functions: rank / lag over partitions --------------------------


@_register(
    "window_rank",
    "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
    "  SELECT o_custkey, o_orderkey, o_totalprice,"
    "   row_number() OVER (PARTITION BY o_custkey"
    "     ORDER BY o_totalprice DESC, o_orderkey) AS rn"
    "  FROM orders) WHERE rn <= 3",
)
def q_window_rank(spark, sf_dir):
    """Ranking window + top-k per group (SURVEY §2.2 row 3, §2.4
    top-k). One shuffle on o_custkey; AQE splits skewed customers."""
    return R.top_k_per_group(
        _t(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_totalprice"
        ),
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")


@_register(
    "window_lag_frame",
    "SELECT o_custkey, o_orderkey,"
    " lag(o_orderkey) OVER w AS prev_orderkey,"
    " CAST(sum(CAST(o_totalprice AS DECIMAL(25,2)))"
    "   OVER (PARTITION BY o_custkey ORDER BY o_orderkey"
    "         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
    "   AS running_spend"
    " FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)",
)
def q_window_lag(spark, sf_dir):
    """Analytic window (lag) + running frame aggregate (SURVEY §2.2
    row 3): running sums use the exact-decimal path so the frame
    prefix sums are bit-stable."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.sum(F.col("o_totalprice").cast("decimal(25,2)"))
        .over(frame)
        .cast("double")
        .alias("running_spend"),
    )


# --- Set operations --------------------------------------------------------


@_register(
    "set_ops",
    "WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000),"
    " lo AS (SELECT o_custkey FROM orders WHERE o_totalprice < 5000)"
    " SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM hi UNION SELECT * FROM lo)"
    " UNION ALL SELECT 'intersect', count(*) FROM (SELECT * FROM hi INTERSECT SELECT * FROM lo)"
    " UNION ALL SELECT 'except', count(*) FROM (SELECT * FROM hi EXCEPT SELECT * FROM lo)",
)
def q_set_ops(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT (SURVEY §2.2 row 4)."""
    orders = _t(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    lo = orders.filter(F.col("o_totalprice") < 5000).select("o_custkey")
    rows = [
        hi.union(lo).distinct().agg(
            F.lit("union").alias("op"), F.count("*").alias("n")
        ),
        hi.intersect(lo).agg(
            F.lit("intersect").alias("op"), F.count("*").alias("n")
        ),
        hi.distinct().exceptAll(lo.distinct()).agg(
            F.lit("except").alias("op"), F.count("*").alias("n")
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# --- Outer / semi / anti joins ---------------------------------------------


@_register(
    "join_left_outer",
    "SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,"
    " CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(25,2))), 0) AS DOUBLE) AS spend"
    " FROM customer LEFT JOIN orders ON c_custkey = o_custkey"
    " GROUP BY c_custkey, c_name",
)
def q_join_left(spark, sf_dir):
    """LEFT OUTER join + group (SURVEY §2.2 row 5): customers with no
    orders kept at n_orders=0 — NULL-skipping count over the outer
    side."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        R.equi_join(
            customer, orders, on=F.col("c_custkey") == F.col("o_custkey"),
            how="left",
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(25,2)")), F.lit(0)
            )
            .cast("double")
            .alias("spend"),
        )
    )


@_register(
    "join_semi_anti",
    "SELECT 'with_orders' AS bucket, count(*) AS n FROM customer"
    " WHERE c_custkey IN (SELECT o_custkey FROM orders)"
    " UNION ALL"
    " SELECT 'without_orders', count(*) FROM customer"
    " WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
)
def q_join_semi_anti(spark, sf_dir):
    """LEFT SEMI / LEFT ANTI joins (SURVEY §2.2 row 5) — the
    distributed realization of IN / NOT IN subqueries."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    semi = customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_semi"
    ).agg(F.lit("with_orders").alias("bucket"), F.count("*").alias("n"))
    anti = customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
    ).agg(F.lit("without_orders").alias("bucket"), F.count("*").alias("n"))
    return semi.unionAll(anti)


# --- COUNT / COUNT(DISTINCT) ----------------------------------------------


@_register(
    "count_distinct",
    "SELECT count(*) AS n_rows, count(DISTINCT l_partkey) AS n_parts,"
    " count(DISTINCT l_suppkey) AS n_supps FROM lineitem",
)
def q_count_distinct(spark, sf_dir):
    """COUNT + COUNT DISTINCT (SURVEY §2.2 row 6). Spark expands
    multi-distinct into a single expand+two-phase aggregate — no
    driver involvement."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
    )


@_register("approx_distinct", None)  # approximate → rows-only check
def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct / percentile_approx sketches (SURVEY §2.2
    row 6, §2.4 sketches). HLL++ partial sketches merge associatively
    across 1000 executors — the scale path for distinct counting.
    No oracle: sketch results are engine-specific by design."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias(
            "price_quantiles"
        ),
    )


# --- Scalar functions: string / date / math --------------------------------


@_register(
    "scalar_string_funcs",
    "SELECT c_custkey, upper(c_mktsegment) AS seg_upper,"
    " length(c_name) AS name_len, substr(c_name, 1, 8) AS name_prefix,"
    " c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS seg_tag"
    " FROM customer WHERE c_mktsegment = 'BUILDING'",
)
def q_scalar_string(spark, sf_dir):
    """String scalar functions (SURVEY §2.2 row 7) — all JVM-side
    whole-stage-codegen expressions, zero Python."""
    c = _t(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(
            "#", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_tag"),
    )


@_register(
    "scalar_date_funcs",
    "SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,"
    " CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS o_month,"
    " count(*) AS n_orders,"
    " CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS revenue"
    " FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'"
    " GROUP BY 1, 2",
)
def q_scalar_date(spark, sf_dir):
    """Date/time functions + timestamp predicate (SURVEY §2.2 row 7):
    year/month buckets — the scan is pruned by the pushed timestamp
    filter."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.month("o_orderdate").cast("bigint").alias("o_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            R.exact_sum("o_totalprice", "revenue"),
        )
    )


@_register(
    "scalar_math_funcs",
    "SELECT l_orderkey, l_linenumber,"
    " abs(l_extendedprice - l_tax) AS diff,"
    " CAST(floor(l_quantity) AS BIGINT) AS qty_floor,"
    " CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,"
    " l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged"
    " FROM lineitem WHERE l_quantity < 3",
)
def q_scalar_math(spark, sf_dir):
    """Math scalars + row-level arithmetic expressions with aliases —
    the expression support the reference's grammar admitted but never
    implemented (`sqlengine.py:43` \"need to add support for alg
    expressions\"). Identical IEEE op sequences in both engines keep
    doubles bit-comparable."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") < 3).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_tax")).alias("diff"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        (
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount"))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("charged"),
    )


# --- CASE WHEN + HAVING ----------------------------------------------------


@_register(
    "case_when_having",
    "SELECT CASE WHEN o_totalprice >= 150000 THEN 'high'"
    "  WHEN o_totalprice >= 50000 THEN 'mid' ELSE 'low' END AS band,"
    " count(*) AS n"
    " FROM orders GROUP BY 1 HAVING count(*) > 10",
)
def q_case_having(spark, sf_dir):
    """CASE WHEN expression + HAVING post-aggregate filter (SURVEY
    §2.2 row 8 expressions)."""
    o = _t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") >= 150000, "high")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("low")
        .alias("band")
    )
    return (
        o.groupBy(band).agg(F.count("*").alias("n")).filter(F.col("n") > 10)
    )


# --- Subqueries: IN (subselect) — parsed but unexecutable in reference -----


@_register(
    "subquery_in",
    "SELECT o_orderkey, o_custkey FROM orders"
    " WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)",
)
def q_subquery_in(spark, sf_dir):
    """IN (subselect) — the reference grammar parses it
    (`sqlengine.py:48-49`) but execution errors (SURVEY §2.2 row 9);
    here it plans as a broadcast left-semi join."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return o.join(
        F.broadcast(rich), o["o_custkey"] == rich["c_custkey"], "left_semi"
    ).select("o_orderkey", "o_custkey")


@_register(
    "subquery_correlated",
    "SELECT c_custkey, c_acctbal FROM customer c"
    " WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer"
    "                    WHERE c_nationkey = c.c_nationkey)",
)
def q_subquery_correlated(spark, sf_dir):
    """Correlated scalar subquery via the SQL front door (SURVEY §2.2
    row 9) — Catalyst decorrelates it into an aggregate + join; no
    per-row re-execution."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        "SELECT c_custkey, c_acctbal FROM customer c"
        " WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer"
        "                    WHERE c_nationkey = c.c_nationkey)"
    )


# --- NULL three-valued logic ----------------------------------------------


@_register(
    "null_semantics",
    "WITH t AS (SELECT nullif(o_orderstatus, 'O') AS st, o_totalprice FROM orders)"
    " SELECT count(*) AS n_rows, count(st) AS n_nonnull,"
    " count(*) - count(st) AS n_null,"
    " CAST(sum(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null2"
    " FROM t",
)
def q_null_semantics(spark, sf_dir):
    """Native NULL semantics (fixes Q9 — the reference stored a
    string sentinel that crashed aggregates, sqlengine.py:145-147,
    569-575): NULL-skipping count, IS NULL predicate."""
    o = _t(spark, sf_dir, "orders")
    t = o.select(
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("st"),
        "o_totalprice",
    )
    return t.agg(
        F.count("*").alias("n_rows"),
        F.count("st").alias("n_nonnull"),
        (F.count("*") - F.count("st")).alias("n_null"),
        F.sum(F.when(F.col("st").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null2"),
    )


# --- Multi-table join chain (reference capped at 2 tables) -----------------


@_register(
    "join_three_tables",
    "SELECT r_name, n_name, count(c_custkey) AS n_customers,"
    " CAST(sum(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS total_acctbal"
    " FROM region JOIN nation ON r_regionkey = n_regionkey"
    " JOIN customer ON n_nationkey = c_nationkey"
    " GROUP BY r_name, n_name",
)
def q_join_three(spark, sf_dir):
    """3-table join chain — the reference hard-capped FROM at 2 tables
    (`sqlengine.py:242-244`; BASELINE.md). Both dims broadcast: the
    customer scan never shuffles."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            R.exact_sum("c_acctbal", "total_acctbal"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each ``queries()`` entry."""
    return dict(_ORACLES)
