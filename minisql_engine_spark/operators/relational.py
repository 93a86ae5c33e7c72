"""Core relational operators — DataFrame-builder front door.

Each function here is the Spark-native realization of one reference
operator family (SURVEY §2.1, citations inline). They compose plain
``DataFrame`` transformations, so Catalyst supplies binding,
optimization (pushdown, pruning, join selection) and Tungsten the
execution — the reference's hand-rolled stages 2-6
(``sqlengine.py:156-718``) collapse into declarative plans.

Design rules (100 TB):
* no ``collect()`` anywhere — every function returns a lazy DataFrame;
* joins take an optional broadcast hint for dimension tables;
* aggregates over floating-point measures go through exact DECIMAL
  sums (order-independent across 1000 executors ⇒ deterministic and
  oracle-comparable), cast back at the edge;
* all 12 grammar comparators are honored (the reference parsed 12 but
  executed only ``=`` — Q1 fixed, ``sqlengine.py:35, 257-258``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Filters (O5/O7/O8 — sqlengine.py:238-290, 454-490)
# ---------------------------------------------------------------------------

#: All comparator spellings the reference grammar admits
#: (``sqlengine.py:35``: ``= != < > >= <= eq ne lt le gt ge``).
_COMPARATORS = {
    "=": Column.__eq__,
    "==": Column.__eq__,
    "eq": Column.__eq__,
    "!=": Column.__ne__,
    "<>": Column.__ne__,
    "ne": Column.__ne__,
    "<": Column.__lt__,
    "lt": Column.__lt__,
    "<=": Column.__le__,
    "le": Column.__le__,
    ">": Column.__gt__,
    "gt": Column.__gt__,
    ">=": Column.__ge__,
    "ge": Column.__ge__,
}


def comparison(lhs: Column | str, op: str, rhs: Column | str | int | float) -> Column:
    """Build ``lhs <op> rhs`` honoring every grammar comparator (fixes Q1).

    ``lhs`` may be a column name or Column; ``rhs`` is a literal unless
    passed as a Column (``F.col(...)``) — a *string* rhs is always a
    string literal, never a column reference. Either side may be the
    literal by passing the Column explicitly (fixes Q3,
    ``sqlengine.py:498-500``).
    """
    if op not in _COMPARATORS:
        raise ValueError(f"unknown comparator {op!r}; expected one of {sorted(_COMPARATORS)}")
    lcol = F.col(lhs) if isinstance(lhs, str) else lhs
    rcol = rhs if isinstance(rhs, Column) else F.lit(rhs)
    return _COMPARATORS[op](lcol, rcol)


def filter_rows(df: DataFrame, *predicates: Column, conjunction: str = "and") -> DataFrame:
    """Filter by any number of predicates combined with AND/OR (O5/O9).

    The reference capped WHERE at 2 conditions + 1 connective
    (``sqlengine.py:242-244``) and only combined within one table
    (``:508`` — Q4); Spark's boolean algebra is unrestricted and
    cross-table correct.
    """
    conj = conjunction.strip().lower()
    if conj not in {"and", "or"}:
        raise ValueError(f"conjunction must be 'and' or 'or', got {conjunction!r}")
    if not predicates:
        return df
    combined = predicates[0]
    for p in predicates[1:]:
        combined = (combined & p) if conj == "and" else (combined | p)
    return df.filter(combined)


# ---------------------------------------------------------------------------
# Projection / scan (O1/O4/O6 — sqlengine.py:99-154, 156-236, 679-695)
# ---------------------------------------------------------------------------


def project(df: DataFrame, columns: Sequence[str | Column] | None = None) -> DataFrame:
    """Projection; ``None``/empty → ``SELECT *`` (O4's ``*`` expansion,
    ``sqlengine.py:177-181``). Catalyst prunes the parquet scan to the
    referenced columns (SURVEY §4.1)."""
    if not columns:
        return df.select("*")
    return df.select(*columns)


# ---------------------------------------------------------------------------
# Joins (O10/O11/O13 — sqlengine.py:476-489, 292-307, 374-436)
# ---------------------------------------------------------------------------


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi/theta join replacing the reference's O(|R|·|S|) nested loop
    (``sqlengine.py:483-487``) and its broken many-to-many assembly
    (Q5, ``:314-372``) — Catalyst picks broadcast-hash or sort-merge,
    AQE re-plans at runtime, and duplicate keys multiply correctly.

    ``on`` as a column-name (or list of names) gives USING-join
    semantics: the join key appears once in the output — the
    reference's join-column dedup O13 (``sqlengine.py:374-436``,
    problem_statement p.2 item 6c) for free.

    ``broadcast_right``: hint for dimension tables; at 100 TB the
    fact-side shuffle disappears entirely for every dim ⋈ fact.
    """
    r = F.broadcast(right) if broadcast_right else right
    if isinstance(on, str):
        on = [on]
    return left.join(r, on=on, how=how)


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cartesian product (O11, ``sqlengine.py:292-307``)."""
    return left.crossJoin(right)


# ---------------------------------------------------------------------------
# Aggregates (O14-O18 — sqlengine.py:548-695) + natural completions
# ---------------------------------------------------------------------------


def exact_sum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM for floating-point measures.

    Summing doubles across a 1000-executor shuffle is
    non-deterministic (FP addition is not associative); routing through
    DECIMAL(25, scale) makes the sum exact and bit-stable, and lets the
    DuckDB oracle reproduce it. Cast back to DOUBLE at the edge so the
    public schema stays simple.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(25,{scale})")).cast("double").alias(alias)
    )


def exact_avg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Deterministic AVG: exact decimal sum / count, one double divide.

    Fixes the reference's filtered-AVG crash (Q6, ``sqlengine.py:647``)
    and its empty-input sentinel bug (``:590``): empty → NULL per ANSI.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.sum(c.cast(f"decimal(25,{scale})")).cast("double") / F.count(c))
        .alias(alias)
    )


def aggregate(
    df: DataFrame,
    aggs: Sequence[tuple[str, str, str]],
    group_by: Sequence[str | Column] | None = None,
) -> DataFrame:
    """MAX/MIN/SUM/AVG/COUNT/COUNT_DISTINCT over whole table or groups.

    ``aggs`` is (func, column, alias) triples. The reference computes
    whole-column aggregates only (no GROUP BY exists — SURVEY §2.2);
    ``group_by`` generalizes that for free via HashAggregate with
    map-side partial aggregation (one shuffle on the group keys).
    """
    funcs = {
        "max": lambda c, a: F.max(c).alias(a),   # O14 sqlengine.py:548-577
        "min": lambda c, a: F.min(c).alias(a),   # O15 :579-607 (empty->NULL, Q6)
        "sum": lambda c, a: F.sum(c).alias(a),   # O16 :609-629
        "avg": lambda c, a: F.avg(c).alias(a),   # O17 :631-660 (alias 'average')
        "average": lambda c, a: F.avg(c).alias(a),
        "sum_exact": exact_sum,
        "avg_exact": exact_avg,
        # absent in reference (SURVEY §2.2) — natural completions:
        "count": lambda c, a: F.count(c).alias(a),
        "count_distinct": lambda c, a: F.count_distinct(c).alias(a),
    }
    exprs: list[Column] = []
    for func, col, alias in aggs:
        key = func.lower()
        if key not in funcs:
            raise ValueError(f"unknown aggregate {func!r}")
        exprs.append(funcs[key](col, alias))
    if group_by:
        return df.groupBy(*group_by).agg(*exprs)
    return df.agg(*exprs)


def distinct_values(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """ANSI DISTINCT over the (possibly filtered) rows (O18).

    Replaces the reference's first-occurrence-ordered, per-column
    pseudo-aggregate (``sqlengine.py:662-678``, Q7/Q8) with standard
    ``SELECT DISTINCT col…`` — unordered, relational. The multi-column
    ``distinct(c1), distinct(c2)`` zip form is non-relational and is
    deliberately not reproduced (SURVEY §7.4): issue one query per
    column instead.
    """
    d = df.select(*columns) if columns else df
    return d.distinct()


# ---------------------------------------------------------------------------
# Order / limit / top-k (absent in reference — SURVEY §2.2 completions)
# ---------------------------------------------------------------------------


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_alias: str = "rn",
) -> DataFrame:
    """Top-k rows per group via window row_number (SURVEY §2.4).

    Scale note: a single shuffle on ``partition_by``; skewed groups are
    split by AQE. For global top-k prefer ``df.orderBy(...).limit(k)``
    (Spark runs TakeOrderedAndProject — no full sort).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )
