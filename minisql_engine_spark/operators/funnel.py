"""Event-sequence funnel analysis.

The classic product-analytics operator the reference engine (a
SELECT-only SQL subset, ``sqlengine.py:1-753``) cannot express: for an
ordered list of step event-types, find each user's earliest completion
of the sequence *in order* within a time window anchored at their
first step-1 event, and report how far every entering user got.

Semantics (the standard "windowed ordered funnel"):

  t₁ = user's earliest step-1 event;
  tᵢ = earliest step-i event with  tᵢ₋₁ < tᵢ ≤ t₁ + within
       (strict progress — two steps cannot share a timestamp);
  a user appears iff they performed step 1; ``furthest_step`` counts
  completed steps.

Taking the EARLIEST qualifying event at each stage is the greedy
choice, and for existence it is optimal: any valid assignment can be
left-shifted stage by stage, so greedy completes the funnel whenever
any assignment does — the per-stage minima are also the canonical
(deterministic, oracle-replayable) witness.

Plan shape: one conditional min-aggregate per step, each keyed on the
user — n_steps small shuffles over per-user rows (map-side partials;
the step filter reaches the scan, so each stage reads only its event
type). No window over the corpus, no self-join explosion: a user with
m step-i events contributes m rows to stage i's aggregate, never m².
Time arithmetic is integer microseconds (``unix_micros`` /
``epoch_us``) — exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_funnel(
    events: DataFrame,
    steps: list[str],
    within_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user_id, step_1_ts … step_n_ts, furthest_step) for every user
    with at least one step-1 event; later steps are NULL once the
    chain breaks."""
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    deadline = F.unix_micros(F.col("step_1_ts")) + int(within_s) * 1_000_000
    for i, step in enumerate(steps[1:], start=2):
        prev = F.unix_micros(F.col(f"step_{i - 1}_ts"))
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("_nts")
        )
        qual = F.when(
            (F.unix_micros(F.col("_nts")) > prev)
            & (F.unix_micros(F.col("_nts")) <= deadline),
            F.col("_nts"),
        )
        carried = [f"step_{j}_ts" for j in range(1, i)]
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(user_col, *carried)
            .agg(F.min(qual).alias(f"step_{i}_ts"))
        )
    furthest = None
    for i in range(1, len(steps) + 1):
        c = F.when(F.col(f"step_{i}_ts").isNotNull(), 1).otherwise(0)
        furthest = c if furthest is None else furthest + c
    return cur.select(
        user_col,
        *[f"step_{i}_ts" for i in range(1, len(steps) + 1)],
        furthest.cast("int").alias("furthest_step"),
    )


def event_funnel_sql(
    steps: list[str],
    within_s: int,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB oracle twin of :func:`event_funnel` — the same
    stage-by-stage conditional minima in integer microseconds."""
    if not steps:
        raise ValueError("steps must be non-empty")

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    ctes = [
        f"s1 AS (SELECT {user_col}, min({ts_col}) AS step_1_ts"
        f" FROM {table} WHERE {type_col} = {q(steps[0])}"
        f" GROUP BY {user_col})"
    ]
    for i, step in enumerate(steps[1:], start=2):
        carried = ", ".join(f"step_{j}_ts" for j in range(1, i))
        ctes.append(
            f"s{i} AS (SELECT p.{user_col}, {carried},"
            f" min(CASE WHEN epoch_us(e.{ts_col})"
            f"   > epoch_us(p.step_{i - 1}_ts)"
            f"  AND epoch_us(e.{ts_col}) <= epoch_us(p.step_1_ts)"
            f"   + {int(within_s) * 1_000_000}"
            f"  THEN e.{ts_col} END) AS step_{i}_ts"
            f" FROM s{i - 1} p LEFT JOIN"
            f"  (SELECT {user_col}, {ts_col} FROM {table}"
            f"   WHERE {type_col} = {q(step)}) e"
            f"  ON e.{user_col} = p.{user_col}"
            f" GROUP BY p.{user_col}, {carried})"
        )
    cols = ", ".join(f"step_{i}_ts" for i in range(1, len(steps) + 1))
    furthest = " + ".join(
        f"CASE WHEN step_{i}_ts IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(1, len(steps) + 1)
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT {user_col}, {cols},"
        + f" CAST({furthest} AS INT) AS furthest_step"
        + f" FROM s{len(steps)}"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day, day_offset, n_users) — classic cohort retention:
    users are cohorted by the calendar day of their first event, and
    each (cohort, offset) cell counts the cohort members active
    ``offset`` days later (offset 0 row ≡ cohort size).

    Plan: first-day per user (one user-keyed aggregate), distinct
    (user, day) activity (one aggregate), a user-keyed join, then the
    (cohort, offset) count — all shuffles on user or on the tiny
    (cohort, offset) grid, map-side partials everywhere. Date
    arithmetic is calendar-day integer math (``datediff``), exact in
    both engines."""
    first = (
        events.select(
            F.col(user_col), F.to_date(F.col(ts_col)).alias("_d")
        )
        .groupBy(user_col)
        .agg(F.min("_d").alias("cohort_day"))
    )
    activity = events.select(
        F.col(user_col), F.to_date(F.col(ts_col)).alias("_d")
    ).distinct()
    return (
        activity.join(first, user_col)
        .select(
            "cohort_day",
            F.datediff(F.col("_d"), F.col("cohort_day")).alias(
                "day_offset"
            ),
            F.col(user_col),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct(user_col).cast("bigint").alias("n_users"))
        # ISO string, not DateType: pandas renders Spark DATE as
        # python date objects but DuckDB DATE as datetime64, so a
        # typed date column can never hash-compare across engines
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.col("day_offset").cast("int"),
            "n_users",
        )
    )


def cohort_retention_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB oracle twin of :func:`cohort_retention`."""
    return (
        f"WITH f AS (SELECT {user_col},"
        f"  min(CAST({ts_col} AS DATE)) AS cohort_day"
        f"  FROM {table} GROUP BY {user_col}),"
        f" a AS (SELECT DISTINCT {user_col},"
        f"  CAST({ts_col} AS DATE) AS d FROM {table})"
        " SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,"
        "  CAST(date_diff('day', f.cohort_day, a.d) AS INT) AS day_offset,"
        f"  CAST(count(DISTINCT a.{user_col}) AS BIGINT) AS n_users"
        f" FROM a JOIN f USING ({user_col})"
        " GROUP BY f.cohort_day, day_offset"
    )
